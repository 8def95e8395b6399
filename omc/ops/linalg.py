"""Batched masked ridge least-squares primitives.

These are the compute kernels of alternating minimisation.  The reference
solves both altmin subproblems with a general conic solver (Mosek models at
`/root/reference/src/OptimalMatrixCompletion.jl:2014,2173`); here each one
is recognised as a (masked) ridge least-squares problem with a closed form:
batched k x k solves assembled by masked matmuls — pure MXU work.
"""

from __future__ import annotations

import jax.numpy as jnp


def v_step(U, A, mask, gamma, ridge_eps=1e-10):
    """argmin_V  1/2 sum_Omega (UV - A)^2 + 1/(2 gamma) ||U V||_F^2.

    Column-separable: per column j of V,
      (U^T diag(w_j) U + (1/gamma) U^T U) v_j = U^T (w_j * a_j).
    U: (n, k), A/mask: (n, m).  Returns V: (k, m).
    """
    k = U.shape[1]
    G = jnp.einsum("nk,nm,nl->mkl", U, mask, U)  # (m, k, k)
    G = G + (1.0 / gamma) * (U.T @ U)[None, :, :]
    G = G + ridge_eps * jnp.eye(k, dtype=U.dtype)[None, :, :]
    rhs = (U.T @ (mask * A)).T  # (m, k)
    if k == 1:  # scalar closed form — avoids batched LU compile/runtime
        V = rhs / G[..., 0]
    else:
        V = jnp.linalg.solve(G, rhs[..., None])[..., 0]  # (m, k)
    return V.T


def u_step_unconstrained(V, A, mask, gamma, ridge_eps=1e-10):
    """argmin_U  1/2 sum_Omega (UV - A)^2 + 1/(2 gamma) ||U V||_F^2.

    Row-separable: per row i of U,
      (V diag(w_i) V^T + (1/gamma) V V^T) u_i = V (w_i * a_i).
    V: (k, m), A/mask: (n, m).  Returns U: (n, k).
    """
    k = V.shape[0]
    H = jnp.einsum("km,nm,lm->nkl", V, mask, V)  # (n, k, k)
    H = H + (1.0 / gamma) * (V @ V.T)[None, :, :]
    H = H + ridge_eps * jnp.eye(k, dtype=V.dtype)[None, :, :]
    rhs = (mask * A) @ V.T  # (n, k)
    if k == 1:
        U = rhs / H[..., 0]
    else:
        U = jnp.linalg.solve(H, rhs[..., None])[..., 0]  # (n, k)
    return U
