"""Matmul-only PSD projection via polynomial matrix-sign iteration.

The in-loop PSD cone projections are the hot op of the ADMM solver.  On
TPU, batched ``eigh`` runs ~40x slower than pure matmuls of the same size
(measured: 116 ms vs 3 ms per (256, 100, 100) projection on v5e), so the
production path computes

    proj_PSD(T) = (T + sign(T) T) / 2

with ``sign(T)`` from an odd-polynomial iteration on ``Z = T / ||T||_F``
— batched matmuls on the MXU, no decomposition.

Schedule: 12 greedy-minimax odd *quintic* steps followed by 2 cubic
Newton-Schulz polish steps.  Each quintic ``p(x) = a x + b x^3 + c x^5``
was chosen (offline, Nelder-Mead per step) to maximise
``min_{x in [l, 1]} p(x)`` subject to ``max p <= 1`` where ``[l, 1]`` is
the previous step's output range, starting from ``l = 1e-6``.  The
composed map sends every eigenvalue with ``|lambda| / ||T||_F >= 1e-6``
to ``1`` within 2.4e-15 in exact arithmetic (float32 floors this at
~1e-6); smaller eigenvalues contribute at most ~2 |lambda| relative
error to the projection — the same guarantee as the 36-step cubic
iteration this replaces at 43 vs 73 matmuls (quintic = 3 matmuls/step
via S2 = S*S, S4 = S2*S2, S*(aI + b S2 + c S4); cubic = 2).
Certification is unaffected in either case: the safe dual bound
re-projects multipliers exactly in float64 on host (omc/sdp/relax.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


_HI = jax.lax.Precision.HIGHEST  # f32 accumulation on the MXU (6-pass);
# the TPU default (bf16-grade) would floor ADMM accuracy at ~1e-2.

# (a, b, c) per step; derived for l0 = 1e-6 (see module docstring).
_SIGN_SCHEDULE = np.array([
    (3.521451, -7.154590, 3.634029),
    (3.406982, -6.751032, 4.344051),
    (4.115155, -11.482394, 8.367240),
    (3.562198, -7.405884, 3.849440),
    (3.811135, -9.095166, 5.427381),
    (4.202972, -12.190019, 8.987046),
    (4.176513, -11.973807, 8.797295),
    (4.110213, -12.007850, 8.897637),
    (4.062958, -11.075007, 8.012057),
    (3.454039, -6.995438, 4.470346),
    (2.364441, -2.438842, 1.074450),
    (2.135440, -1.778817, 0.643428),
    (1.5, -0.5, 0.0),  # cubic NS polish
    (1.5, -0.5, 0.0),
])


def matrix_sign_poly(Z, schedule=None, dtype=None):
    """Polynomial matrix-sign of symmetric ``Z`` with spectrum in
    [-1, 1] (matmuls only).

    Statically unrolled with python-scalar coefficients (no coefficient
    gathers, no identity materialisation): at the solver's tiny batch
    sizes the in-program cost is op-count-bound, so each step is exactly
    ``a S + S (b S^2 + c S^4)`` — 3 matmuls + 2 scalar combines (cubic
    steps with c = 0 skip the S^4 product)."""
    sched = _SIGN_SCHEDULE if schedule is None else schedule
    S = Z
    for a, b, c in np.asarray(sched):
        S2 = jnp.matmul(S, S, precision=_HI)
        if c == 0.0:
            S = float(a) * S + float(b) * jnp.matmul(S, S2, precision=_HI)
        else:
            S4 = jnp.matmul(S2, S2, precision=_HI)
            S = float(a) * S + jnp.matmul(
                S, float(b) * S2 + float(c) * S4, precision=_HI
            )
    return S


def project_psd_ns(T, iters: int | None = None):
    """Project symmetric (..., d, d) matrices onto the PSD cone using the
    quintic/cubic matrix-sign schedule (matmuls only).  ``iters`` is
    accepted for backward compatibility only: the schedule has a fixed
    length, so a non-None value is IGNORED (with a DeprecationWarning) —
    passing a larger value does not buy extra accuracy."""
    if iters is not None:
        import warnings

        warnings.warn(
            "project_psd_ns ignores `iters`: the sign schedule has a fixed "
            "length; remove the argument",
            DeprecationWarning,
            stacklevel=2,
        )
    T = 0.5 * (T + jnp.swapaxes(T, -1, -2))
    s = jnp.sqrt(jnp.sum(T * T, axis=(-2, -1), keepdims=True)) + 1e-30
    S = matrix_sign_poly(T / s)
    P = 0.5 * (T + jnp.matmul(S, T, precision=_HI))
    return 0.5 * (P + jnp.swapaxes(P, -1, -2))


def project_psd_ns_merged(mats):
    """Project several batches of symmetric matrices of DIFFERENT sizes in
    ONE padded sign-schedule run.

    ``mats``: list of (B, d_i, d_i) arrays.  Each is zero-embedded into a
    (B, len(mats), D, D) block (D = max d_i; ``proj(blockdiag(T, 0)) =
    blockdiag(proj(T), 0)``, so padding is exact), the schedule runs once
    on the merged (B*len, D, D) batch, and the blocks are sliced back.

    Why: the solver's per-iteration projections (e.g. (n+m)^2, (n+k)^2,
    n^2) are each a ~43-matmul SERIAL chain; at small batch sizes the
    iteration is latency-bound on chain depth, so merging three chains
    into one (at ~2x padded flops) is a direct win.
    """
    B = mats[0].shape[0]
    D = max(t.shape[-1] for t in mats)
    G = len(mats)
    Tm = jnp.zeros((B, G, D, D), dtype=mats[0].dtype)
    for g, t in enumerate(mats):
        d = t.shape[-1]
        Tm = Tm.at[:, g, :d, :d].set(t)
    P = project_psd_ns(Tm.reshape(B * G, D, D)).reshape(B, G, D, D)
    return [P[:, g, : t.shape[-1], : t.shape[-1]] for g, t in enumerate(mats)]


def project_psd_ns_small(T):
    """PSD projection for LARGE batches of TINY symmetric matrices
    (d <= ~8), e.g. the (B, M5, 5, 5) Shor minor slots.

    ``jnp.matmul`` on (32768, 5, 5) batches is catastrophic on TPU — each
    5x5 product pads to a 128-lane MXU tile (measured 39 ms for the
    43-matmul sign schedule at that shape, the entire Shor per-iteration
    budget).  Here the matmul runs with the BATCH along the lanes:
    operands transposed to (d, d, N), each of the d^2 output entries is a
    d-term elementwise FMA over (N,)-vectors on the VPU — the d^3 = 125
    scalar ops per matrix are fully vectorised over the batch (measured
    ~1.5 ms for the same projection).  Same schedule, same accuracy."""
    T = 0.5 * (T + jnp.swapaxes(T, -1, -2))
    shape = T.shape
    d = shape[-1]
    Tb = T.reshape(-1, d, d).transpose(1, 2, 0)  # (d, d, N)
    s = jnp.sqrt(jnp.sum(Tb * Tb, axis=(0, 1), keepdims=True)) + 1e-30
    Z = Tb / s

    def mm(X, Y):
        # explicit broadcast-multiply-reduce, NOT dot_general: XLA lowers
        # batch-of-tiny einsums to MXU matmuls (slow, and bf16-grade
        # accumulation diverges the sign iteration); this stays exact f32
        # elementwise VPU work, vectorised over the lane-major batch axis
        return jnp.sum(X[:, :, None, :] * Y[None, :, :, :], axis=1)

    S = Z
    for a, b, c in np.asarray(_SIGN_SCHEDULE):
        S2 = mm(S, S)
        if c == 0.0:
            S = float(a) * S + float(b) * mm(S, S2)
        else:
            S = float(a) * S + mm(S, float(b) * S2 + float(c) * mm(S2, S2))
    P = 0.5 * (Tb + mm(S, Tb))
    P = 0.5 * (P + jnp.swapaxes(P, 0, 1))
    return P.transpose(2, 0, 1).reshape(shape)
