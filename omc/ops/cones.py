"""Batched cone projections — the inner kernels of the conic solver.

The reference delegates all conic work to Mosek's interior-point method
(`/root/reference/src/OptimalMatrixCompletion.jl:1482-1859`).  The TPU
design replaces it with a first-order splitting method whose per-iteration
work is exactly these projections, batched over thousands of B&B nodes.
PSD projections are batched ``eigh`` (MXU-friendly dense linear algebra);
everything else is closed-form elementwise VPU work.

All functions are jit/vmap-safe and accept leading batch dimensions.
"""

from __future__ import annotations

import jax.numpy as jnp


def symmetrize(M):
    return 0.5 * (M + jnp.swapaxes(M, -1, -2))


def project_psd(M):
    """Project symmetric matrices (..., d, d) onto the PSD cone."""
    M = symmetrize(M)
    w, V = jnp.linalg.eigh(M)
    w = jnp.maximum(w, 0.0)
    return jnp.einsum("...ik,...k,...jk->...ij", V, w, V)


def project_soc(t, x):
    """Project (t, x) onto the second-order cone {(t, x): ||x|| <= t}.

    ``t``: (...,); ``x``: (..., d).  Returns (t_proj, x_proj).
    """
    nx = jnp.linalg.norm(x, axis=-1)
    # three cases: inside (nx <= t), polar (nx <= -t), else boundary blend
    inside = nx <= t
    polar = nx <= -t
    scale = jnp.where(nx > 0, 0.5 * (1.0 + t / jnp.where(nx > 0, nx, 1.0)), 0.0)
    t_b = 0.5 * (t + nx)
    x_b = scale[..., None] * x
    t_out = jnp.where(inside, t, jnp.where(polar, 0.0, t_b))
    x_out = jnp.where(
        inside[..., None], x, jnp.where(polar[..., None], jnp.zeros_like(x), x_b)
    )
    return t_out, x_out


def project_rsoc(u, v, x):
    """Project onto the rotated second-order cone
    {(u, v, x): 2 u v >= ||x||^2, u >= 0, v >= 0}.

    Uses the linear isometry (u, v) -> ((u+v)/sqrt2, (u-v)/sqrt2) mapping the
    RSOC onto the standard SOC {(t, (s, x)): ||(s, x)|| <= t}.
    ``u``, ``v``: (...,); ``x``: (..., d).
    """
    s2 = jnp.sqrt(jnp.asarray(2.0, dtype=x.dtype))
    t = (u + v) / s2
    s = (u - v) / s2
    z = jnp.concatenate([s[..., None], x], axis=-1)
    t_p, z_p = project_soc(t, z)
    s_p = z_p[..., 0]
    x_p = z_p[..., 1:]
    u_p = (t_p + s_p) / s2
    v_p = (t_p - s_p) / s2
    return u_p, v_p, x_p
