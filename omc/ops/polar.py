"""Matmul-only PSD projection via Newton-Schulz polar iteration.

The in-loop PSD cone projections are the hot op of the ADMM solver.  On
TPU, batched ``eigh`` runs ~40x slower than pure matmuls of the same size
(measured: 116 ms vs 3 ms per (256, 100, 100) projection on v5e), so the
production path computes

    proj_PSD(T) = (T + sign(T) T) / 2

with ``sign(T)`` from the cubic Newton-Schulz iteration
``S <- 1.5 S - 0.5 S^3`` on ``Z = T / ||T||_F`` — 3 batched matmuls per
step on the MXU, no decomposition.  After ``iters`` steps every eigenvalue
with |lambda| / ||T||_F >= ~1.5^-iters has converged sign; smaller ones
contribute at most that relative error to the projection.  36 iterations
give ~2e-6 relative error in float32 — below the solver's accuracy floor,
and certification is unaffected (the safe dual bound re-projects
multipliers exactly in float64 on host; see omc/sdp/relax.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


_HI = jax.lax.Precision.HIGHEST  # f32 accumulation on the MXU (6-pass);
# the TPU default (bf16-grade) would floor ADMM accuracy at ~1e-2.


def project_psd_ns(T, iters: int = 36):
    """Project symmetric (..., d, d) matrices onto the PSD cone using the
    Newton-Schulz matrix-sign iteration (matmuls only)."""
    T = 0.5 * (T + jnp.swapaxes(T, -1, -2))
    s = jnp.sqrt(jnp.sum(T * T, axis=(-2, -1), keepdims=True)) + 1e-30
    Z = T / s

    def body(_, S):
        S2 = jnp.matmul(S, S, precision=_HI)
        return 1.5 * S - 0.5 * jnp.matmul(S2, S, precision=_HI)

    S = jax.lax.fori_loop(0, iters, body, Z)
    P = 0.5 * (T + jnp.matmul(S, T, precision=_HI))
    return 0.5 * (P + jnp.swapaxes(P, -1, -2))
