"""Tests for batched alternating minimisation and the B&B tree engine."""

import numpy as np
import pytest

import jax.numpy as jnp

from omc.altmin import make_altmin
from omc.data import generate_matrix_completion_data
from omc.ops.linalg import u_step_unconstrained, v_step
from omc.problem import evaluate_objective
from omc.tree import BBNode, BBTree, compute_gap, root_box


def test_v_step_optimality():
    rng = np.random.default_rng(0)
    n, m, k, gamma = 6, 8, 2, 10.0
    U = rng.standard_normal((n, k))
    A = rng.standard_normal((n, m))
    mask = (rng.random((n, m)) < 0.6).astype(np.float64)
    V = np.asarray(v_step(jnp.asarray(U), jnp.asarray(A), jnp.asarray(mask), gamma))
    # stationarity: U' diag(w_j) (U v_j - a_j) + (1/gamma) U'U v_j = 0
    for j in range(m):
        D = np.diag(mask[:, j])
        g = U.T @ D @ (U @ V[:, j] - A[:, j]) + (1 / gamma) * U.T @ U @ V[:, j]
        assert np.linalg.norm(g) < 1e-6


def test_u_step_optimality():
    rng = np.random.default_rng(1)
    n, m, k, gamma = 6, 8, 2, 10.0
    V = rng.standard_normal((k, m))
    A = rng.standard_normal((n, m))
    mask = (rng.random((n, m)) < 0.6).astype(np.float64)
    U = np.asarray(
        u_step_unconstrained(jnp.asarray(V), jnp.asarray(A), jnp.asarray(mask), gamma)
    )
    for i in range(n):
        D = np.diag(mask[i, :])
        g = V @ D @ (V.T @ U[i] - A[i]) + (1 / gamma) * V @ V.T @ U[i]
        assert np.linalg.norm(g) < 1e-6


def test_altmin_improves_objective():
    n = m = 10
    k, gamma = 1, 20.0
    A, idx = generate_matrix_completion_data(k, n, m, 60, seed=0)
    mask = idx.astype(np.float64)
    U0 = np.linalg.svd(A * mask, full_matrices=False)[0][:, :k]
    lo, hi = root_box(n, k)
    am = make_altmin(n, m, k, gamma, dtype=jnp.float64)
    res = am(jnp.asarray(A), jnp.asarray(mask), jnp.asarray(U0[None]),
             jnp.asarray(lo[None]), jnp.asarray(hi[None]))
    X = np.asarray(res.U[0]) @ np.asarray(res.V[0])
    obj = float(evaluate_objective(X, A, mask, U0, gamma))
    obj0 = float(evaluate_objective(np.zeros_like(A), A, mask, U0, gamma))
    assert obj < obj0
    assert bool(res.converged[0])
    assert int(res.n_iters[0]) <= 100


def _mk_node(nid, parent, lb, depth=0):
    lo, hi = root_box(4, 1)
    return BBNode(node_id=nid, parent_id=parent, U_lower=lo, U_upper=hi,
                  LB=lb, depth=depth, cuts=[])


def test_tree_policies():
    root = _mk_node(1, 0, -np.inf)
    tree = BBTree(root, best_upper_bound=10.0)
    tree.retrieve_batch("bestfirst", 1)
    tree.add_nodes([_mk_node(2, 1, 5.0), _mk_node(3, 1, 5.0)], 5.0)
    tree.add_nodes([_mk_node(4, 2, 7.0), _mk_node(5, 2, 3.0)], 3.0)
    # bestfirst pops lowest queued LB first (nodes 4,5 queued at 3.0)
    got = tree.retrieve_batch("bestfirst", 2)
    assert {nd.node_id for nd in got} == {4, 5}
    # breadthfirst pops oldest remaining
    got = tree.retrieve_batch("breadthfirst", 1)
    assert got[0].node_id == 2
    # depthfirst pops newest remaining
    tree.add_nodes([_mk_node(6, 3, 8.0)], 8.0)
    got = tree.retrieve_batch("depthfirst", 1)
    assert got[0].node_id == 6


def test_prune_and_lower_bound():
    root = _mk_node(1, 0, -np.inf)
    tree = BBTree(root, best_upper_bound=4.0)
    tree.retrieve_batch("bestfirst", 1)
    tree.add_nodes([_mk_node(2, 1, 3.0)], 3.0)
    tree.add_nodes([_mk_node(3, 1, 5.0)], 5.0)  # dominated (5 > UB 4)
    tree.prune_dominated()
    assert 3 not in tree.nodes and 2 in tree.nodes
    assert tree.update_lower_bound()
    assert tree.best_lower_bound == 3.0
    # emptying the tree closes the gap to the incumbent
    tree.retrieve_batch("bestfirst", 1)
    tree.update_lower_bound()
    assert tree.best_lower_bound == 4.0


def test_compute_gap_conventions():
    assert compute_gap(-1.0, 5.0) == np.inf
    assert compute_gap(2.0, 2.0) == 0.0
    assert compute_gap(2.0, 3.0) == pytest.approx(0.5)


def test_root_box_symmetry_breaking():
    lo, hi = root_box(5, 2)
    assert np.all(hi == 1.0)
    assert np.all(lo[3:, 0] == 0.0)
    assert np.all(lo[4:, 1] == 0.0)
    assert lo[0, 0] == -1.0


def test_altmin_cut_constrained_stays_in_region():
    """The cut-constrained U-step (reference lines 2048-2092) keeps the
    altmin iterate inside the node's disjunctive region; the unconstrained
    variant escapes it on a region that excludes the root basin."""
    n = m = 10
    k, gamma = 1, 20.0
    A, idx = generate_matrix_completion_data(k, n, m, 60, seed=0)
    mask = idx.astype(np.float64)
    U0 = np.linalg.svd(A * mask, full_matrices=False)[0][:, :k]
    lo, hi = root_box(n, k)
    am = make_altmin(n, m, k, gamma, dtype=jnp.float64)

    # region: v = x' U constrained to the side OPPOSITE the warm start
    x = U0[:, 0] / np.linalg.norm(U0[:, 0])
    v0 = float(x @ U0[:, 0])  # ~1 by construction
    cut_x = jnp.asarray(x[None, None, :])  # (B=1, L=1, n)
    cut_lo = jnp.asarray(np.array([[[-1.0]]]))
    cut_hi = jnp.asarray(np.array([[[-0.2]]]))
    cut_mask = jnp.ones((1, 1))

    res_free = am(jnp.asarray(A), jnp.asarray(mask), jnp.asarray(U0[None]),
                  jnp.asarray(lo[None]), jnp.asarray(hi[None]))
    res_cut = am(jnp.asarray(A), jnp.asarray(mask), jnp.asarray(U0[None]),
                 jnp.asarray(lo[None]), jnp.asarray(hi[None]),
                 cut_x=cut_x, cut_lo=cut_lo, cut_hi=cut_hi,
                 cut_mask=cut_mask)
    v_free = float(x @ np.asarray(res_free.U[0])[:, 0])
    v_cut = float(x @ np.asarray(res_cut.U[0])[:, 0])
    assert v0 > 0.5  # warm start is deep in the excluded side
    assert v_free > -0.2 + 1e-6  # unconstrained escapes the region
    assert -1.0 - 1e-9 <= v_cut <= -0.2 + 1e-6  # constrained stays in
    # box and column-ball feasibility of the constrained iterate
    U_c = np.asarray(res_cut.U[0])
    assert np.all(U_c >= lo - 1e-9) and np.all(U_c <= hi + 1e-9)
    assert np.linalg.norm(U_c[:, 0]) <= 1.0 + 1e-9


def test_altmin_objective_history():
    """The reference returns the full per-iteration objective list
    (reference lines 2249-2278); obj_trace must carry it, padded +inf."""
    n = m = 10
    k, gamma = 1, 20.0
    A, idx = generate_matrix_completion_data(k, n, m, 60, seed=0)
    mask = idx.astype(np.float64)
    U0 = np.linalg.svd(A * mask, full_matrices=False)[0][:, :k]
    lo, hi = root_box(n, k)
    am = make_altmin(n, m, k, gamma, dtype=jnp.float64)
    res = am(jnp.asarray(A), jnp.asarray(mask), jnp.asarray(U0[None]),
             jnp.asarray(lo[None]), jnp.asarray(hi[None]))
    n_it = int(res.n_iters[0])
    trace = np.asarray(res.obj_trace[0])
    assert n_it >= 1
    assert np.all(np.isfinite(trace[:n_it]))
    assert np.all(np.isinf(trace[n_it:]))
    # the recorded final objective matches the re-evaluated one
    assert np.isclose(trace[n_it - 1], float(res.objective[0]), rtol=1e-9)

    # public API contract: objectives is the full history
    from omc.api import alternating_minimization

    out = alternating_minimization(
        A, n, k, idx, gamma, U_initial=U0, dtype="float64"
    )
    # (the API path runs the cut-constrained projection, so its objective
    # differs from the box-free run above; check its OWN history contract)
    assert len(out["objectives"]) == out["n_iters"]
    obj_api = float(
        0.5 * np.sum(mask * (out["U"] @ out["V"] - A) ** 2)
        + (0.5 / gamma) * np.sum((out["U"] @ out["V"]) ** 2)
    )
    assert np.isclose(out["objectives"][-1], obj_api, rtol=1e-9)


def test_altmin_pair_soc_binding_k2():
    """k = 2: the pairwise SOC rows ||U_j1 +- U_j2|| <= sqrt(2) of the
    reference's disjunctive-path U-model (reference lines 2029-2045) must
    hold on every returned iterate, including inputs engineered so the
    plain column-norm cap alone would violate them."""
    from omc.altmin import _project_pairs

    rng = np.random.default_rng(3)
    n, k = 8, 2
    # two nearly identical unit columns: each column norm is fine but
    # ||a + b|| ~ 2 > sqrt(2) -> the pair constraint binds
    a = rng.standard_normal(n)
    a /= np.linalg.norm(a)
    U_bad = np.stack([a, a + 1e-3 * rng.standard_normal(n)], axis=1)
    U_proj = np.asarray(_project_pairs(jnp.asarray(U_bad[None])))[0]
    s2 = np.sqrt(2.0) + 1e-6
    assert np.linalg.norm(U_proj[:, 0] + U_proj[:, 1]) <= s2
    assert np.linalg.norm(U_proj[:, 0] - U_proj[:, 1]) <= s2
    # a compliant point is a fixed point of the projection
    U_ok = np.linalg.qr(rng.standard_normal((n, k)))[0] * 0.9
    U_fix = np.asarray(_project_pairs(jnp.asarray(U_ok[None])))[0]
    assert np.allclose(U_fix, U_ok, atol=1e-7)

    # end-to-end: the altmin result respects the pair rows
    n = m = 12
    gamma = 20.0
    A, idx = generate_matrix_completion_data(k, n, m, 100, seed=1)
    mask = idx.astype(np.float64)
    U0 = np.linalg.svd(A * mask, full_matrices=False)[0][:, :k]
    lo, hi = root_box(n, k)
    am = make_altmin(n, m, k, gamma, dtype=jnp.float64)
    res = am(jnp.asarray(A), jnp.asarray(mask), jnp.asarray(U0[None]),
             jnp.asarray(lo[None]), jnp.asarray(hi[None]))
    U = np.asarray(res.U[0])
    for j1 in range(k):
        for j2 in range(j1 + 1, k):
            assert np.linalg.norm(U[:, j1] + U[:, j2]) <= s2
            assert np.linalg.norm(U[:, j1] - U[:, j2]) <= s2
