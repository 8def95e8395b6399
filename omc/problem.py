"""Problem definition and exact metric oracles.

These are the pure-function correctness oracles of the framework: the exact
master objective, the relaxation objective recomputation, and the MSE
metrics.  Semantics match the reference implementations
(`/root/reference/src/OptimalMatrixCompletion.jl`):

- ``evaluate_objective``                 — reference lines 2330-2359
- ``compute_SDP_relaxation_objective``   — reference lines 1945-1977
- ``compute_MSE``                        — reference lines 2361-2409

All functions accept numpy or jax arrays and are jit/vmap-safe (pure jnp
ops, no Python control flow on traced values).  ``indices`` is a boolean
(n, m) observation mask.
"""

from __future__ import annotations

import jax.numpy as jnp


def evaluate_objective(X, A, indices, U, gamma):
    """Exact master objective of a candidate completion ``X``.

    ``(1/2) * sum_{(i,j) in indices} (X_ij - A_ij)^2
      + (1/(2*gamma)) * ||X||_F^2``

    ``U`` is accepted for API parity with the reference (which validates
    its shape but does not use it in the value); any rank-<=k factor.
    Valid upper bound for the master problem whenever rank(X) <= k.
    """
    X = jnp.asarray(X)
    A = jnp.asarray(A)
    mask = jnp.asarray(indices)
    fit = 0.5 * jnp.sum(jnp.where(mask, (X - A) ** 2, 0.0))
    reg = (0.5 / gamma) * jnp.sum(X**2)
    return fit + reg


def compute_SDP_relaxation_objective(
    X, Y, Theta, U, A, indices, gamma, *, add_Shor_valid_inequalities=False, W=None
):
    """Recompute the node-relaxation objective from solution values.

    Guards against solver objective drift, exactly as the reference does
    after every relaxation solve (reference lines 1882-1896).

    Without Shor inequalities:
        ``(1/2) * sum_Omega (A_ij - X_ij)^2 + (1/(2*gamma)) * tr(Theta)``
    With Shor inequalities (W-linearised square, W_ij >= X_ij^2):
        ``(1/2) * sum_Omega (A_ij^2 - 2 A_ij X_ij + W_ij)
          + (1/(2*gamma)) * tr(Theta)``
    """
    X = jnp.asarray(X)
    A = jnp.asarray(A)
    mask = jnp.asarray(indices)
    Theta = jnp.asarray(Theta)
    reg = (0.5 / gamma) * jnp.trace(Theta)
    if add_Shor_valid_inequalities:
        if W is None:
            raise ValueError("W is required when add_Shor_valid_inequalities=True")
        W = jnp.asarray(W)
        fit = 0.5 * jnp.sum(jnp.where(mask, A**2 - 2.0 * A * X + W, 0.0))
    else:
        fit = 0.5 * jnp.sum(jnp.where(mask, (A - X) ** 2, 0.0))
    return fit + reg


def compute_MSE(X, A, indices, *, kind: str = "out"):
    """Mean-squared error of ``X`` vs ``A`` over in/out/all entries.

    ``kind``: "in" (observed entries), "out" (unobserved), "all".
    Matches reference lines 2373-2409, including the 0.0 conventions for
    empty entry sets.
    """
    X = jnp.asarray(X)
    A = jnp.asarray(A)
    mask = jnp.asarray(indices).astype(X.dtype)
    sq = (X - A) ** 2
    total = mask.size
    n_obs = jnp.sum(mask)
    if kind == "out":
        denom = total - n_obs
        val = jnp.sum(sq * (1.0 - mask))
        return jnp.where(denom == 0, 0.0, val / jnp.maximum(denom, 1.0))
    elif kind == "in":
        val = jnp.sum(sq * mask)
        return jnp.where(n_obs == 0, 0.0, val / jnp.maximum(n_obs, 1.0))
    elif kind == "all":
        return jnp.sum(sq) / total
    else:
        raise ValueError(
            'Input argument `kind` not recognized! Must be one of "out", "in", or "all".'
        )
