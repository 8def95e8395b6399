"""Batched node SDP relaxation: PDHG solver + certified safe dual bounds.

This module replaces the reference's per-node Mosek interior-point solve
(`/root/reference/src/OptimalMatrixCompletion.jl:1431-1943`) with a design
inverted for TPU: *the node is data, the solver is a fixed jitted program*.
A batch of B&B nodes — each carrying padded cut tensors — is solved
simultaneously by one compiled primal-dual hybrid gradient (PDHG /
Chambolle-Pock) program whose per-iteration work is batched dense linear
algebra: three batched ``eigh`` PSD projections plus elementwise VPU work.

The node relaxation (disjunctive-cuts path, reference lines 1491-1857):

    min  1/2 sum_Omega (X_ij - A_ij)^2 + 1/(2 gamma) tr(Theta)
    s.t. M1 = [Y X; X' Theta]  PSD            (dual y1)
         M2 = [Y U; U' I_k]    PSD            (dual y2)
         I - Y                 PSD            (dual y3)
         k - tr(Y)             >= 0           (dual y4)
         U in [U_lo, U_hi]                    (kept in prox)
         (1, U_j) in SOC, j=1..k              (dual ysoc)
         per cut l:  v_l = U' x_l
            v_lj - lo_lj >= 0                 (dual ya)
            hi_lj - v_lj >= 0                 (dual yb)
            sum_j ((lo+hi)_lj v_lj - (lo*hi)_lj) - x_l' Y x_l >= 0   (dual yc)

Conditioning: the raw variables live on very different scales (Y ~ 1,
X ~ ||A||_inf, Theta ~ 2*gamma*objective), which cripples scalar-step
PDHG.  The solver therefore performs the change of variables
X = s_X * Xt, Theta = s_T * Tht (static scales chosen by the driver) and
runs PDHG on the scaled variables; the per-node operator norm of the
*scaled* operator is estimated by batched power iteration, so the step
condition tau*sigma*||K||^2 <= 1 remains valid.

Certification: lower bounds do NOT come from the PDHG objective (a
first-order method's primal value is not a bound).  Instead
``safe_dual_bound`` evaluates the partial Lagrangian dual in closed form
for *any* dual iterate: constraints (M1, M2, cuts) are dualised with
multipliers read off the PDHG dual state, re-projected onto their cones in
float64 on host, while Y, Theta, X, U are minimised exactly over a compact
*kept set* that provably contains every master-feasible point of the node
region with objective <= ub_bar:

    Y     in {0 <= Y <= I, tr Y <= k}            -> Ky-Fan: sum_k min(eig, 0)
    Theta in {Theta >= 0, tr <= 2*gamma*ub_bar}  -> trace * min(eig_min, 0)
    X     in {|X_ij| <= sqrt(2*gamma*ub_bar)}    -> per-entry clamped quadratic
    U     in [U_lo, U_hi]                        -> per-entry linear min

By weak duality the result is a valid lower bound on the node's master
optimum whenever that optimum is <= ub_bar; if it exceeds ub_bar the node
is prunable regardless, so branch-and-bound pruning with these bounds is
sound at any solver accuracy.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from omc.ops.cones import project_psd, project_soc

_HI = jax.lax.Precision.HIGHEST


class NodeBatch(NamedTuple):
    """Per-node constraint data, padded to fixed shapes.

    cut_x:    (B, L, n)   unit breakpoint vectors
    cut_lo:   (B, L, k)   region lower bounds on v = U' x   (0 when padded)
    cut_hi:   (B, L, k)   region upper bounds on v          (0 when padded)
    cut_mask: (B, L)      1.0 for real cuts
    U_lo:     (B, n, k)   box lower bounds on U
    U_hi:     (B, n, k)   box upper bounds on U
    """

    cut_x: jnp.ndarray
    cut_lo: jnp.ndarray
    cut_hi: jnp.ndarray
    cut_mask: jnp.ndarray
    U_lo: jnp.ndarray
    U_hi: jnp.ndarray


class PDHGState(NamedTuple):
    """PDHG iterate.  Primal matrices are stored *scaled* (X = s_X * X,
    Theta = s_T * Th internally)."""

    X: jnp.ndarray  # (B, n, m)
    Y: jnp.ndarray  # (B, n, n)
    Th: jnp.ndarray  # (B, m, m)
    U: jnp.ndarray  # (B, n, k)
    Xb: jnp.ndarray  # extrapolated copies (z-bar)
    Yb: jnp.ndarray
    Thb: jnp.ndarray
    Ub: jnp.ndarray
    y1: jnp.ndarray  # (B, n+m, n+m)
    y2: jnp.ndarray  # (B, n+k, n+k)
    y3: jnp.ndarray  # (B, n, n)
    y4: jnp.ndarray  # (B,)
    ysoc: jnp.ndarray  # (B, k, 1+n)
    ya: jnp.ndarray  # (B, L, k)
    yb: jnp.ndarray  # (B, L, k)
    yc: jnp.ndarray  # (B, L)


def init_state(B, n, m, k, L, dtype=jnp.float32, *, sX=1.0, sT=1.0,
               X0=None, Y0=None, Th0=None, U0=None) -> PDHGState:
    """Zero state, optionally warm-started from an (unscaled) primal point
    — e.g. the incumbent (U V, U U', V'V, U), which is feasible for every
    node's core cones."""
    z = lambda *s: jnp.zeros(s, dtype=dtype)
    def prim(val, shape, scale):
        if val is None:
            return z(*shape)
        arr = jnp.asarray(val, dtype=dtype) / scale
        return jnp.broadcast_to(arr, shape)
    X = prim(X0, (B, n, m), sX)
    Y = prim(Y0, (B, n, n), 1.0)
    Th = prim(Th0, (B, m, m), sT)
    U = prim(U0, (B, n, k), 1.0)
    return PDHGState(
        X=X, Y=Y, Th=Th, U=U, Xb=X, Yb=Y, Thb=Th, Ub=U,
        y1=z(B, n + m, n + m), y2=z(B, n + k, n + k), y3=z(B, n, n),
        y4=z(B), ysoc=z(B, k, 1 + n), ya=z(B, L, k), yb=z(B, L, k), yc=z(B, L),
    )


def _forward(batch: NodeBatch, Xs, Y, Ths, U, k: int, sX, sT):
    """Constraint operator on scaled primal: slot values of the true
    constraints (X = sX*Xs, Theta = sT*Ths)."""
    X = sX * Xs
    Th = sT * Ths
    Xt = jnp.swapaxes(X, -1, -2)
    Ut = jnp.swapaxes(U, -1, -2)
    n = Y.shape[-1]
    w1 = jnp.concatenate(
        [jnp.concatenate([Y, X], axis=-1), jnp.concatenate([Xt, Th], axis=-1)], axis=-2
    )
    eye_k = jnp.eye(k, dtype=U.dtype)
    w2 = jnp.concatenate(
        [
            jnp.concatenate([Y, U], axis=-1),
            jnp.concatenate(
                [Ut, jnp.broadcast_to(eye_k, Ut.shape[:-2] + (k, k))], axis=-1
            ),
        ],
        axis=-2,
    )
    w3 = jnp.eye(n, dtype=Y.dtype) - Y
    w4 = k - jnp.trace(Y, axis1=-2, axis2=-1)
    ones = jnp.ones(U.shape[:-2] + (k, 1), dtype=U.dtype)
    wsoc = jnp.concatenate([ones, Ut], axis=-1)  # (B, k, 1+n)
    v = jnp.einsum("bln,bnk->blk", batch.cut_x, U, precision=_HI)
    wa = v - batch.cut_lo
    wb = batch.cut_hi - v
    c = batch.cut_lo + batch.cut_hi
    bconst = jnp.sum(-batch.cut_lo * batch.cut_hi, axis=-1)  # (B, L)
    xYx = jnp.einsum("bln,bnp,blp->bl", batch.cut_x, Y, batch.cut_x, precision=_HI)
    wc = jnp.sum(c * v, axis=-1) + bconst - xYx
    return w1, w2, w3, w4, wsoc, wa, wb, wc


def _adjoint(batch: NodeBatch, y1, y2, y3, y4, ysoc, ya, yb, yc, n, m, k, sX, sT):
    """Adjoint of the scaled operator: dual -> gradients on (Xs, Y, Ths, U)."""
    gX = sX * 2.0 * y1[..., :n, n:]
    gY = (
        y1[..., :n, :n]
        + y2[..., :n, :n]
        - y3
        - y4[..., None, None] * jnp.eye(n, dtype=y3.dtype)
        - jnp.einsum("bl,bln,blp->bnp", yc, batch.cut_x, batch.cut_x, precision=_HI)
    )
    gTh = sT * y1[..., n:, n:]
    c = batch.cut_lo + batch.cut_hi
    coef = ya - yb + yc[..., None] * c  # (B, L, k)
    gU = (
        2.0 * y2[..., :n, n:]
        + jnp.swapaxes(ysoc[..., 1:], -1, -2)  # (B, n, k)
        + jnp.einsum("bln,blk->bnk", batch.cut_x, coef, precision=_HI)
    )
    return gX, gY, gTh, gU


def _estimate_opnorm(batch: NodeBatch, n, m, k, sX, sT, iters=20, seed=0):
    """Per-node power iteration on K'K to estimate ||K|| of the scaled
    operator (batched)."""
    B, L = batch.cut_mask.shape
    key = jax.random.PRNGKey(seed)
    dtype = batch.cut_x.dtype
    kx, ky, kt, ku = jax.random.split(key, 4)
    X = jax.random.normal(kx, (B, n, m), dtype)
    Y = jax.random.normal(ky, (B, n, n), dtype)
    Y = 0.5 * (Y + jnp.swapaxes(Y, -1, -2))
    Th = jax.random.normal(kt, (B, m, m), dtype)
    Th = 0.5 * (Th + jnp.swapaxes(Th, -1, -2))
    U = jax.random.normal(ku, (B, n, k), dtype)

    def nrm(X, Y, Th, U):
        sq = lambda a: jnp.sum(a * a, axis=tuple(range(1, a.ndim)))
        return jnp.sqrt(sq(X) + sq(Y) + sq(Th) + sq(U))

    z0 = (jnp.zeros((B, n, m), dtype), jnp.zeros((B, n, n), dtype),
          jnp.zeros((B, m, m), dtype), jnp.zeros((B, n, k), dtype))
    offs = _forward(batch, *z0, k, sX, sT)

    def body(_, zs):
        X, Y, Th, U = zs
        s = nrm(X, Y, Th, U)[:, None, None] + 1e-30
        X, Y, Th, U = X / s, Y / s, Th / s, U / s
        ws = _forward(batch, X, Y, Th, U, k, sX, sT)
        w1, w2, w3, w4, wsoc, wa, wb, wc = [w - o for w, o in zip(ws, offs)]
        cm = batch.cut_mask
        wa, wb, wc = wa * cm[..., None], wb * cm[..., None], wc * cm
        gX, gY, gTh, gU = _adjoint(
            batch, w1, w2, w3, w4, wsoc, wa, wb, wc, n, m, k, sX, sT
        )
        gY = 0.5 * (gY + jnp.swapaxes(gY, -1, -2))
        gTh = 0.5 * (gTh + jnp.swapaxes(gTh, -1, -2))
        return (gX, gY, gTh, gU)

    X, Y, Th, U = jax.lax.fori_loop(0, iters, body, (X, Y, Th, U))
    return jnp.sqrt(nrm(X, Y, Th, U)) * 1.05 + 1e-3  # ||K'K z|| -> ||K||^2


def make_solver(n: int, m: int, k: int, L: int, gamma: float, *,
                iters: int = 400, dtype=jnp.float32, omega: float = 1.0,
                sX: float = 1.0, sT: float = 1.0):
    """Build the jitted batched PDHG relaxation solver.

    Returns solve(A, mask, batch, ub_bar, state) -> (state, out): ``out``
    carries the *unscaled* primal (X, Y, Th, U), the dual blocks needed for
    host-side certification, and the separation eigenpairs of U U' - Y.
    Shapes are static; one compiled program serves every node with <= L
    cuts.  ``omega`` balances primal vs dual step sizes; ``sX``/``sT`` are
    the block variable scales (see module docstring).
    """

    def solve(A, mask, batch: NodeBatch, ub_bar, state: PDHGState,
              n_iters=None):
        """``n_iters`` (optional, traced): runtime iteration budget — the
        same contract as the ADMM family, so the driver's iteration boost
        and duration capping apply to the PDHG path too."""
        ni = jnp.asarray(iters if n_iters is None else n_iters, jnp.int32)
        A = A.astype(dtype)
        mask = mask.astype(dtype)
        R_Xs = jnp.sqrt(2.0 * gamma * ub_bar).astype(dtype) / sX
        T_s = (2.0 * gamma * ub_bar).astype(dtype) / sT
        opnorm = _estimate_opnorm(batch, n, m, k, sX, sT)  # (B,)
        tau = (omega / opnorm)[:, None, None]
        sig = (1.0 / (omega * opnorm))
        cm = batch.cut_mask
        eye_m = jnp.eye(m, dtype=dtype)
        eye_n = jnp.eye(n, dtype=dtype)

        def body(_, s: PDHGState):
            # ---- dual ascent at extrapolated primal ----
            w1, w2, w3, w4, wsoc, wa, wb, wc = _forward(
                batch, s.Xb, s.Yb, s.Thb, s.Ub, k, sX, sT
            )
            t1 = s.y1 + sig[:, None, None] * w1
            y1 = t1 - project_psd(t1)
            t2 = s.y2 + sig[:, None, None] * w2
            y2 = t2 - project_psd(t2)
            t3 = s.y3 + sig[:, None, None] * w3
            y3 = t3 - project_psd(t3)
            y4 = jnp.minimum(s.y4 + sig * w4, 0.0)
            tsoc = s.ysoc + sig[:, None, None] * wsoc
            pt, pw = project_soc(tsoc[..., 0], tsoc[..., 1:])
            ysoc = tsoc - jnp.concatenate([pt[..., None], pw], axis=-1)
            ya = jnp.minimum(s.ya + sig[:, None, None] * wa, 0.0) * cm[..., None]
            yb = jnp.minimum(s.yb + sig[:, None, None] * wb, 0.0) * cm[..., None]
            yc = jnp.minimum(s.yc + sig[:, None] * wc, 0.0) * cm

            # ---- primal descent ----
            gX, gY, gTh, gU = _adjoint(
                batch, y1, y2, y3, y4, ysoc, ya, yb, yc, n, m, k, sX, sT
            )
            Xn = s.X - tau * gX
            Yn = s.Y - tau * gY
            Thn = s.Th - tau * gTh
            Un = s.U - tau * gU
            Yn = 0.5 * (Yn + jnp.swapaxes(Yn, -1, -2))
            Thn = 0.5 * (Thn + jnp.swapaxes(Thn, -1, -2))
            # prox of the objective + valid box keep-sets (all separable).
            # X block: 1/2 (sX*Xs - A)^2 per observed entry.
            Xn = jnp.where(
                mask > 0, (Xn + tau * sX * A) / (1.0 + tau * sX * sX), Xn
            )
            Xn = jnp.clip(Xn, -R_Xs, R_Xs)
            # Theta block: linear (sT / 2 gamma) tr(Ths)
            Thn = Thn - (tau * (sT * 0.5 / gamma)) * eye_m
            d_th = jnp.diagonal(Thn, axis1=-2, axis2=-1)
            Thn = Thn + (jnp.clip(d_th, 0.0, T_s) - d_th)[..., None, :] * eye_m
            Thn = jnp.clip(Thn, -T_s, T_s)
            d_y = jnp.diagonal(Yn, axis1=-2, axis2=-1)
            Yn = Yn + (jnp.clip(d_y, 0.0, 1.0) - d_y)[..., None, :] * eye_n
            Yn = jnp.clip(Yn, -1.0, 1.0)
            Un = jnp.clip(Un, batch.U_lo, batch.U_hi)

            return PDHGState(
                X=Xn, Y=Yn, Th=Thn, U=Un,
                Xb=2.0 * Xn - s.X, Yb=2.0 * Yn - s.Y,
                Thb=2.0 * Thn - s.Th, Ub=2.0 * Un - s.U,
                y1=y1, y2=y2, y3=y3, y4=y4, ysoc=ysoc, ya=ya, yb=yb, yc=yc,
            )

        state = jax.lax.fori_loop(0, ni, body, state)

        # separation / master-feasibility eigenpairs of U U' - Y
        Msep = jnp.einsum("bik,bjk->bij", state.U, state.U) - state.Y
        Msep = 0.5 * (Msep + jnp.swapaxes(Msep, -1, -2))
        sep_w, sep_V = jnp.linalg.eigh(Msep)
        out = {
            "X": sX * state.X, "Y": state.Y, "Th": sT * state.Th, "U": state.U,
            "y1": state.y1, "y2": state.y2,
            "ya": state.ya, "yb": state.yb, "yc": state.yc,
            "sep_w": sep_w[..., :2], "sep_V": sep_V[..., :, :2],
        }
        return state, out

    return jax.jit(solve)


# ---------------------------------------------------------------------------
# Safe dual bound — backend-agnostic (numpy for certified f64 host evaluation,
# jnp for cheap on-device progress estimates).
# ---------------------------------------------------------------------------


def margin_rel_default(xp, dtype):
    """The floating-point safety-margin constant, in ONE place for every
    safe dual bound (base ADMM/PDHG, Shor k=1, Shor k>1): 1e-10 for
    float64 host certification, 3e-5 for compute-dtype on-device
    screening (sized to the observed eigh/reduction noise floor)."""
    return 1e-10 if dtype == xp.float64 else 3e-5


def safe_dual_bound(xp, A, mask, batch, y1, y2, ya, yb, yc, gamma, k, ub_bar,
                    margin_rel=None):
    """Closed-form partial Lagrangian dual value — a valid node lower bound.

    Multipliers are S1 = proj_PSD(-y1), S2 = proj_PSD(-y2) (the PDHG dual
    step leaves -y1/-y2 PSD up to the device eigendecomposition's error;
    re-projecting here — in float64 when called from the host — makes bound
    validity independent of device precision), alpha = max(-ya, 0),
    beta = max(-yb, 0), lam = max(-yc, 0).  See module docstring for the
    kept-set derivation.  ``xp`` is numpy or jax.numpy.
    """
    return safe_dual_bound2(
        xp, A, mask, batch, y1, y2, ya, yb, yc, gamma, k, ub_bar,
        margin_rel=margin_rel,
    )[0]


def safe_dual_bound2(xp, A, mask, batch, y1, y2, ya, yb, yc, gamma, k, ub_bar,
                     margin_rel=None):
    """``(lb_valid, lb_est)`` from one shared evaluation.

    ``lb_valid`` is the margin-guarded safe bound of ``safe_dual_bound``.
    ``lb_est`` is an *estimator* of what the float64 host evaluation of the
    same duals would return — NOT itself a sound bound — used only for
    on-device early-exit decisions (the driver re-certifies in float64
    before acting on it).  It differs from the valid bound only in the
    omitted floating-point safety margin.

    Off-support q channel (round-4 verdict item 3): the optimal dual's q
    (X-block of S1) is supported on observed entries, but any projection
    computed in float32 re-fills the off-support block with eigen-noise
    that the kept-set penalty amplifies by R_X = sqrt(2 gamma ub) *per
    entry* — measured ~2800 below the float64 bound on 250x250 frontiers.
    The multiplier is therefore RESTRUCTURED so the channel is
    structurally zero: after projecting (with the off-support block
    pre-zeroed), the residual off-support q is zeroed exactly and the
    indefiniteness this introduces is compensated by a diagonal shift
    delta = ||q_off||_F (since ||[[0, D],[D', 0]]||_2 <= ||D||_F, the
    shifted matrix is PSD).  The shift is folded into the existing
    R1 <= I/(2 gamma) rescale, and the Y/Theta kept-set terms absorb the
    exact eigenvalue shift -delta.  In float64 delta ~ 1e-14 and the
    restructure is a no-op.
    """
    n, m = A.shape[-2], A.shape[-1]

    def _psd(Mat):
        Mat = 0.5 * (Mat + xp.swapaxes(Mat, -1, -2))
        w, V = xp.linalg.eigh(Mat)
        return xp.einsum("...ik,...k,...jk->...ij", V, xp.maximum(w, 0.0), V)

    # pre-zero the off-support q block (any input to proj_PSD yields a
    # valid multiplier, so this edit is free and keeps delta small)
    S1in = -y1
    obs = mask > 0
    obsT = xp.swapaxes(obs, -1, -2) if obs.ndim > 2 else obs.T
    S1in = xp.concatenate(
        [
            xp.concatenate(
                [S1in[..., :n, :n], xp.where(obs, S1in[..., :n, n:], 0.0)], axis=-1
            ),
            xp.concatenate(
                [xp.where(obsT, S1in[..., n:, :n], 0.0), S1in[..., n:, n:]],
                axis=-1,
            ),
        ],
        axis=-2,
    )
    S1 = _psd(S1in)
    # zero the residual off-support q exactly; compensating shift delta
    q_full = S1[..., :n, n:]
    q_off = xp.where(obs, 0.0, q_full)
    delta = xp.sqrt(xp.sum(q_off * q_off, axis=(-2, -1)))
    # Rescale so the SHIFTED Theta block satisfies R1 + delta I <=
    # I/(2 gamma) exactly: the Theta kept-set term then vanishes instead
    # of amplifying noise by the trace radius 2*gamma*ub_bar.  Scaling a
    # PSD multiplier by c in (0, 1] preserves dual feasibility.
    lmaxR1 = xp.linalg.eigvalsh(S1[..., n:, n:])[..., -1] + delta
    c_scale = xp.minimum(1.0, (0.5 / gamma) / xp.maximum(lmaxR1, 1e-30))
    S1 = S1 * c_scale[..., None, None]
    delta = delta * c_scale
    S2 = _psd(-y2)
    P1, q, R1 = S1[..., :n, :n], S1[..., :n, n:], S1[..., n:, n:]
    # the effective multiplier is S1 with q restricted to the observed
    # support plus delta I (PSD by the shift argument above)
    q = xp.where(obs, q, 0.0)
    P2, E = S2[..., :n, :n], S2[..., n:, n:]
    D = S2[..., :n, n:]
    cmask = batch.cut_mask
    alpha = xp.maximum(-ya, 0.0) * cmask[..., None]
    beta = xp.maximum(-yb, 0.0) * cmask[..., None]
    lam = xp.maximum(-yc, 0.0) * cmask

    lo, hi = batch.cut_lo, batch.cut_hi
    c = lo + hi
    bconst = xp.sum(-lo * hi, axis=-1)  # (B, L)

    # Y block: inf over {0 <= Y <= I, tr Y <= k} of <G_Y, Y>; the delta I
    # shift on P1 moves every eigenvalue of G_Y down by exactly delta
    G_Y = -(P1 + P2) + xp.einsum("bl,bln,blp->bnp", lam, batch.cut_x, batch.cut_x)
    G_Y = 0.5 * (G_Y + xp.swapaxes(G_Y, -1, -2))
    wY = xp.linalg.eigh(G_Y)[0]
    y_term = xp.sum(
        xp.minimum(wY[..., :k] - delta[..., None], 0.0), axis=-1
    )

    # Theta block: inf over {Theta >= 0, tr Theta <= T} of <G_Th, Theta>;
    # R1 + delta I <= I/(2 gamma) holds by the rescale, so this is ~0
    T_th = 2.0 * gamma * ub_bar
    G_Th = (0.5 / gamma) * xp.eye(m, dtype=A.dtype) - R1
    G_Th = 0.5 * (G_Th + xp.swapaxes(G_Th, -1, -2))
    wT = xp.linalg.eigh(G_Th)[0]
    th_term = T_th * xp.minimum(wT[..., 0] - delta, 0.0)

    # X block: per-entry clamped quadratic over |X_ij| <= R_X on the
    # observed support; q is structurally zero off-support (see docstring)
    R_X = xp.sqrt(2.0 * gamma * ub_bar)
    x_star = xp.clip(A + 2.0 * q, -R_X, R_X)
    obs_val = 0.5 * (x_star - A) ** 2 - 2.0 * q * x_star
    x_term = xp.sum(xp.where(mask > 0, obs_val, 0.0), axis=(-2, -1))

    # U block: linear over the box
    W_U = -2.0 * D - xp.einsum(
        "bln,blk->bnk", batch.cut_x, alpha - beta + lam[..., None] * c
    )
    u_term = xp.sum(xp.minimum(W_U * batch.U_lo, W_U * batch.U_hi), axis=(-2, -1))

    const = (
        xp.sum(alpha * lo, axis=(-2, -1))
        - xp.sum(beta * hi, axis=(-2, -1))
        - xp.sum(lam * bconst, axis=-1)
        - xp.trace(E, axis1=-2, axis2=-1)
    )

    lb = y_term + th_term + x_term + u_term + const

    # floating-point safety margin: scale-aware, subtracted so that rounding
    # in the eigendecompositions / reductions cannot overstate the bound.
    if margin_rel is None:
        margin_rel = margin_rel_default(xp, A.dtype)
    scale = (
        1.0
        + xp.abs(lb)
        + ub_bar
        + xp.sqrt(xp.sum(S1 * S1, axis=(-2, -1)))
        + xp.sqrt(xp.sum(S2 * S2, axis=(-2, -1)))
    )
    # with the off-support channel structurally zero, the unmargined value
    # IS the float64-tracking estimator
    return lb - margin_rel * scale, lb


def state_to_host(state, compress=np.float32) -> list:
    """Fetch a whole batch solver state to host: one transfer per leaf
    (not per node).  Returns a flat list of (B, ...) host arrays."""
    leaves = jax.tree.leaves(state)
    host = jax.device_get(leaves)
    return [np.asarray(x).astype(compress) for x in host]


def host_state_slice(host_leaves: list, i: int) -> list:
    """Node ``i``'s warm-start slice from ``state_to_host`` output."""
    return [x[i] for x in host_leaves]


def apply_warm_slices(base_leaves, slices):
    """Overwrite rows of host template leaves with per-node slice lists
    (in place).  A slice may come from a solve with a different cut/minor
    capacity: leaves whose shape differs only in the leading axis are
    copied row-truncated/zero-padded — rows past a node's real count are
    zero (masked), so this is lossless.  Structurally incompatible slices
    keep the template's values."""
    for li, base in enumerate(base_leaves):
        tgt = base.shape[1:]  # per-node shape
        for i, sl in enumerate(slices):
            if sl is None or li >= len(sl):
                continue
            v = np.asarray(sl[li], dtype=base.dtype)
            if v.shape == tgt:
                base[i] = v
            elif v.ndim == len(tgt) and len(tgt) >= 1 and v.shape[1:] == tgt[1:]:
                r = min(tgt[0], v.shape[0])
                base[i][:r] = v[:r]
                if r < tgt[0]:
                    base[i][r:] = 0.0
            # else: incompatible leaf — keep template value
    return base_leaves


def host_certified_bound(A, mask, batch: NodeBatch, out: dict, gamma, k, ub_bar):
    """Recompute the safe bound on host in float64 from device outputs."""
    f = lambda a: np.asarray(a, dtype=np.float64)
    hb = NodeBatch(
        cut_x=f(batch.cut_x), cut_lo=f(batch.cut_lo), cut_hi=f(batch.cut_hi),
        cut_mask=f(batch.cut_mask), U_lo=f(batch.U_lo), U_hi=f(batch.U_hi),
    )
    return safe_dual_bound(
        np, f(A), f(mask), hb, f(out["y1"]), f(out["y2"]), f(out["ya"]),
        f(out["yb"]), f(out["yc"]), float(gamma), k, float(ub_bar),
        margin_rel=1e-10,
    )
