"""Public per-node entry points.

The reference exports ``alternating_minimization`` and
``matrix_completion_SDP_relaxation`` as standalone functions
(`/root/reference/src/OptimalMatrixCompletion.jl:21-25`) so users can run
the upper-bound heuristic or a single node relaxation outside the
branch-and-bound driver.  These wrappers expose the same capability on top
of the batched TPU programs: one call packs a single node (batch of 1),
runs the jitted solver, and returns a result dict with the reference's key
contract.

Signatures mirror the reference
(``alternating_minimization`` at lines 1979-2005,
``matrix_completion_SDP_relaxation`` at lines 1431-1453); TPU-specific
knobs (iteration budget, dtype) are added keyword-only.
"""

from __future__ import annotations

import time
from typing import Optional, Sequence

import numpy as np

import jax.numpy as jnp

from omc.problem import compute_SDP_relaxation_objective, evaluate_objective
from omc.tree import BBNode, root_box


def _as_mask(indices: np.ndarray) -> np.ndarray:
    return np.asarray(indices).astype(np.float64)


def alternating_minimization(
    A: np.ndarray,
    n: int,
    k: int,
    indices: np.ndarray,
    gamma: float,
    use_disjunctive_cuts: bool = True,
    *,
    disjunctive_cuts_type: Optional[str] = None,
    U_initial: np.ndarray,
    U_lower: Optional[np.ndarray] = None,
    U_upper: Optional[np.ndarray] = None,
    disjunctive_cuts: Sequence = (),
    eps: float = 1e-5,
    max_iters: int = 100,
    dtype: str = "float64",
) -> dict:
    """Alternating minimisation from ``U_initial`` — the reference's
    upper-bound heuristic (reference lines 1979-2279) as a public entry.

    Returns ``{"converged", "U", "V", "solve_time", "n_iters", "max_iters",
    "objectives"}`` matching the reference's return dict (lines 2249-2278).
    ``disjunctive_cuts`` entries are ``DisjunctiveCut``-like objects (the
    cut-constrained U-step projects onto the node's cut intervals).
    """
    from omc.altmin import make_altmin
    from omc.solve import _cut_interval_arrays

    A = np.asarray(A, dtype=np.float64)
    mask = _as_mask(indices)
    m = A.shape[1]
    jdtype = jnp.float64 if dtype == "float64" else jnp.float32
    if U_lower is None or U_upper is None:
        lo_d, hi_d = root_box(n, k)
        U_lower = lo_d if U_lower is None else U_lower
        U_upper = hi_d if U_upper is None else U_upper

    t0 = time.time()
    cx, clo, chi, cmask = _cut_interval_arrays(
        list(disjunctive_cuts), disjunctive_cuts_type, n, k
    )
    fn = make_altmin(n, m, k, gamma, max_iters=max_iters, tol=eps, dtype=jdtype)
    res = fn(
        jnp.asarray(A, jdtype),
        jnp.asarray(mask, jdtype),
        jnp.asarray(U_initial, jdtype)[None],
        jnp.asarray(U_lower, jdtype)[None],
        jnp.asarray(U_upper, jdtype)[None],
        cut_x=jnp.asarray(cx, jdtype)[None],
        cut_lo=jnp.asarray(clo, jdtype)[None],
        cut_hi=jnp.asarray(chi, jdtype)[None],
        cut_mask=jnp.asarray(cmask, jdtype)[None],
    )
    U = np.asarray(res.U[0], np.float64)
    V = np.asarray(res.V[0], np.float64)
    # the reference returns the per-iteration objective list (reference
    # lines 2249-2278); the trace is padded with +inf past n_iters
    n_it = int(res.n_iters[0])
    trace = np.asarray(res.obj_trace[0], np.float64)[:n_it]
    objectives = [float(v) for v in trace if np.isfinite(v)]
    if not objectives:
        objectives = [float(res.objective[0])]
    return {
        "converged": bool(res.converged[0]),
        "U": U,
        "V": V,
        "solve_time": time.time() - t0,
        "n_iters": n_it,
        "max_iters": max_iters,
        "objectives": objectives,
    }


def matrix_completion_SDP_relaxation(
    node: BBNode,
    n: int,
    k: int,
    A: np.ndarray,
    indices: np.ndarray,
    gamma: float,
    use_disjunctive_cuts: bool = True,
    *,
    disjunctive_cuts_type: Optional[str] = None,
    add_Shor_valid_inequalities: bool = False,
    iters: int = 2000,
    dtype: str = "float64",
    ub_bar: Optional[float] = None,
) -> dict:
    """Solve one node's SDP relaxation (reference lines 1431-1943).

    Returns ``{"feasible", "objective", "Y", "U", "X", "Theta",
    "solve_time", "lower_bound", "sep_w", "sep_V"}``.  ``objective`` is the
    relaxation objective recomputed from the primal solution (the
    reference's drift guard, lines 1882-1896); ``lower_bound`` is the
    *certified* safe Lagrangian dual bound — the value branch-and-bound
    actually prunes with (the reference gets certification from Mosek's
    interior point instead).  ``ub_bar`` caps the certification kept sets;
    defaults to the trivial upper bound ``objective(X = 0)``.
    """
    from omc.sdp.admm import init_admm_state, make_admm_solver
    from omc.sdp.admm_shor import (
        host_certified_bound_shor,
        init_shor_state,
        make_shor_solver,
        shor_batch_to_device,
    )
    from omc.sdp.mccormick import (
        MCBatch,
        host_certified_bound_mc,
        init_mc_state,
        make_mccormick_solver,
    )
    from omc.sdp.shor_encode import pack_shor_batch
    from omc.sdp.relax import NodeBatch, host_certified_bound
    from omc.solve import _pack_batch

    A = np.asarray(A, dtype=np.float64)
    mask = _as_mask(indices)
    m = A.shape[1]
    jdtype = jnp.float64 if dtype == "float64" else jnp.float32
    np_dtype = np.float64 if dtype == "float64" else np.float32
    if ub_bar is None:
        ub_bar = 0.5 * float(np.sum(mask * A * A))  # objective at X = 0
    sX = max(1.0, float(np.max(np.abs(A))))
    sT = max(1.0, 2.0 * gamma * ub_bar / (4.0 * m))
    A_dev = jnp.asarray(A, jdtype)
    mask_dev = jnp.asarray(mask, jdtype)

    t0 = time.time()
    if not use_disjunctive_cuts:
        solve = make_mccormick_solver(
            n, m, k, gamma, iters=iters, dtype=jdtype, rho=10.0
        )
        lo = jnp.asarray(node.U_lower, jdtype)[None]
        hi = jnp.asarray(node.U_upper, jdtype)[None]
        state0 = init_mc_state(
            1, n, m, k, dtype=jdtype, sX=sX, sT=sT, rho=10.0
        )
        _, out = solve(A_dev, mask_dev, MCBatch(U_lo=lo, U_hi=hi), ub_bar, state0)
        out = {key: np.asarray(val) for key, val in out.items()}
        lbs = host_certified_bound_mc(
            A, mask, node.U_lower[None], node.U_upper[None], out, gamma, k, ub_bar
        )
        W = None
    else:
        L = max(1, len(node.cuts or []))
        batch = _pack_batch([node], 1, L, n, k, disjunctive_cuts_type, np_dtype)
        if add_Shor_valid_inequalities:
            M5 = max(1, len(node.Shor_info.constraints_indexes))
            if k == 1:
                sbh = pack_shor_batch(
                    n, m, [node.Shor_info.constraints_indexes],
                    [node.Shor_info.SOC_constraints_indexes], M5, n * m,
                )
                solve = make_shor_solver(
                    n, m, L, M5, n * m, gamma, iters=iters, dtype=jdtype,
                )
                state0 = init_shor_state(
                    1, n, m, k, L, M5, n * m, dtype=jdtype, sX=sX, sT=sT
                )
                _, out = solve(
                    A_dev, mask_dev, batch, shor_batch_to_device(sbh, jdtype),
                    ub_bar, state0,
                )
                out = {key: np.asarray(val) for key, val in out.items()}
                lbs = host_certified_bound_shor(
                    A, mask, batch, sbh, out, gamma, ub_bar
                )
            else:
                # rank-k Xt-split path (reference lines 1491-1551, 1781-1828)
                from omc.sdp.shor_k import (
                    host_certified_bound_shor_k,
                    init_shor_k_state,
                    make_shor_k_solver,
                    pack_shor_k_batch,
                    shor_k_batch_to_device,
                )

                sbh = pack_shor_k_batch(
                    n, m, [node.Shor_info.constraints_indexes],
                    [node.Shor_info.SOC_constraints_indexes], M5, n * m,
                )
                solve = make_shor_k_solver(
                    n, m, k, L, M5, n * m, gamma, iters=iters, dtype=jdtype,
                )
                state0 = init_shor_k_state(
                    1, n, m, k, L, M5, n * m, dtype=jdtype, sX=sX, sT=sT
                )
                _, out = solve(
                    A_dev, mask_dev, batch, shor_k_batch_to_device(sbh, jdtype),
                    ub_bar, state0,
                )
                out = {key: np.asarray(val) for key, val in out.items()}
                lbs = host_certified_bound_shor_k(
                    A, mask, batch, sbh, out, gamma, k, ub_bar
                )
            W = out["W"][0].astype(np.float64)
        else:
            solve = make_admm_solver(
                n, m, k, L, gamma, iters=iters, dtype=jdtype, rho=0.03,
            )
            state0 = init_admm_state(
                1, n, m, k, L, dtype=jdtype, sX=sX, sT=sT, rho=0.03
            )
            _, out = solve(A_dev, mask_dev, batch, ub_bar, state0)
            out = {key: np.asarray(val) for key, val in out.items()}
            lbs = host_certified_bound(A, mask, batch, out, gamma, k, ub_bar)
            W = None
    solve_time = time.time() - t0

    X = out["X"][0].astype(np.float64)
    Y = out["Y"][0].astype(np.float64)
    Th = out["Th"][0].astype(np.float64)
    U = out["U"][0].astype(np.float64)
    objective = float(
        compute_SDP_relaxation_objective(
            X, Y, Th, U, A, mask > 0, gamma,
            add_Shor_valid_inequalities=add_Shor_valid_inequalities, W=W,
        )
    )
    results = {
        "feasible": True,
        "objective": objective,
        "lower_bound": float(lbs[0]),
        "Y": Y,
        "U": U,
        "X": X,
        "Theta": Th,
        "solve_time": solve_time,
        "sep_w": out["sep_w"][0].astype(np.float64),
        "sep_V": out["sep_V"][0].astype(np.float64),
    }
    if W is not None:
        results["W"] = W
    return results
