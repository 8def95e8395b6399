"""Batched symmetric-eigenproblem utilities.

Replace the reference's ARPACK calls (smallest-eigenpair extraction for
master-feasibility certificates and the disjunction separation oracle,
reference lines 1274/1283/1287/2467/2470) with batched dense ``eigh`` —
the matrices are small (n <= a few hundred), so full batched dense eigh on
the MXU beats an Arnoldi iteration per matrix.
"""

from __future__ import annotations

import jax.numpy as jnp


def smallest_eigpairs(M, num: int = 1):
    """Smallest ``num`` eigenpairs of symmetric (..., d, d) matrices.

    Returns (w, V): w (..., num) ascending, V (..., d, num).
    """
    M = 0.5 * (M + jnp.swapaxes(M, -1, -2))
    w, V = jnp.linalg.eigh(M)  # ascending order
    return w[..., :num], V[..., :, :num]


def lambda_min(M):
    w, _ = jnp.linalg.eigh(0.5 * (M + jnp.swapaxes(M, -1, -2)))
    return w[..., 0]


def kyfan_min_sum(G, k: int):
    """inf over {0 <= Y <= I, tr(Y) <= k} of <G, Y> (batched).

    Equals the sum of min(lambda_i, 0) over the ``k`` smallest eigenvalues
    of G.  This is the closed-form partial minimisation used by the safe
    Lagrangian dual bound (the Y-block of the node relaxation's kept set).
    """
    w = jnp.linalg.eigh(0.5 * (G + jnp.swapaxes(G, -1, -2)))[0]  # ascending
    return jnp.sum(jnp.minimum(w[..., :k], 0.0), axis=-1)


def min_eig_times_scale(G, scale):
    """scale * min(lambda_min(G), 0) — inf over {Theta >= 0, tr <= scale}
    of <G, Theta> (batched)."""
    return scale * jnp.minimum(lambda_min(G), 0.0)
