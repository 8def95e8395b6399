"""Rank-k (k > 1) Shor valid-inequality relaxation tests.

Reference formulation: `/root/reference/src/OptimalMatrixCompletion.jl`
lines 1491-1551 (Xt/Wt/H/V variables), 1781-1828 (per-t 5x5 minors + XWH
PSD blocks), 1837-1846 (W-form objective).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from omc.data import generate_matrix_completion_data
from omc.sdp.relax import NodeBatch
from omc.sdp.shor import (
    generate_rank1_matrix_completion_Shor_constraints_indexes,
    shor_soc_complement,
)
from omc.sdp.shor_k import (
    _adjoint_shor_k,
    _forward_shor_k,
    host_certified_bound_shor_k,
    init_shor_k_state,
    make_shor_k_solver,
    pack_shor_k_batch,
    shor_k_batch_to_device,
)
from omc.tree import BBNode, ShorInfo, root_box


def _small_instance(k=2, n=8, m=8, seed=2):
    A, idx = generate_matrix_completion_data(k, n, m, int(0.7 * n * m), seed)
    return A, idx


def _some_minors(idx, cap=6):
    minors = generate_rank1_matrix_completion_Shor_constraints_indexes(idx, [4])
    return minors[:cap]


def test_pack_shor_k_batch_tables():
    A, idx = _small_instance()
    n, m = A.shape
    minors = _some_minors(idx, cap=4)
    soc = shor_soc_complement(n, m, minors)
    sbh = pack_shor_k_batch(n, m, [minors], [soc], M5=4, Msoc=n * m)
    assert sbh.minor_mask[0].sum() == len(minors)
    # every corner's coordinate index maps back to the right flat entry
    for l, (i1, i2, j1, j2) in enumerate(minors):
        corners = [(i1, j1), (i1, j2), (i2, j1), (i2, j2)]
        for ci, (i, j) in enumerate(corners):
            cc = sbh.mc[0, l, ci]
            assert sbh.coord_flat[0, cc] == i * m + j
            assert sbh.coord_j[0, cc] == j
            assert sbh.coord_mask[0, cc] == 1.0
    # SOC complement excludes minor coordinates
    coords = {(i, j) for (i1, i2, j1, j2) in minors
              for (i, j) in [(i1, j1), (i1, j2), (i2, j1), (i2, j2)]}
    soc_set = {tuple(divmod(int(f), m)) for f, msk in
               zip(sbh.soc_flat[0], sbh.soc_mask[0]) if msk > 0}
    assert soc_set.isdisjoint(coords)
    # counts: cnt_minor sums to 4 * n_minors
    assert sbh.cnt_minor[0].sum() == 4 * len(minors)


def test_forward_adjoint_consistency():
    """<y, F z> == <F' y, z> for the hand-written Shor-k slot operator."""
    rng = np.random.default_rng(0)
    k, n, m = 3, 8, 8
    A, idx = _small_instance(k=2, n=n, m=m)
    minors = _some_minors(idx, cap=5)
    soc = shor_soc_complement(n, m, minors)
    M5 = 8
    sbh = pack_shor_k_batch(n, m, [minors], [soc], M5=M5, Msoc=n * m)
    sb = shor_k_batch_to_device(sbh, jnp.float64)
    B, C = 1, 4 * M5
    kp = k * (k - 1) // 2
    P1 = P2 = 2 * M5
    P3 = M5
    sX, sW = 1.7, 1.7 * 1.7

    r = lambda *s: jnp.asarray(rng.standard_normal(s))
    Xt, W = r(B, k, n, m), r(B, n, m)
    Wt, Hh = r(B, k, C), r(B, kp, C)
    v1, v2, v3 = r(B, k, P1), r(B, k, P2), r(B, k, P3)
    Th = r(B, m, m)

    z5 = (jnp.zeros((B, k, n, m)), jnp.zeros((B, n, m)),
          jnp.zeros((B, k, C)), jnp.zeros((B, kp, C)),
          jnp.zeros((B, k, P1)), jnp.zeros((B, k, P2)), jnp.zeros((B, k, P3)))
    offs5, offsx, offsr, _, _ = _forward_shor_k(sb, *z5, k, m, sX, sW)
    f5, fx, fr, fcol, fwl = _forward_shor_k(sb, Xt, W, Wt, Hh, v1, v2, v3,
                                            k, m, sX, sW)
    sT = 2.3
    f_link = sT * jnp.diagonal(Th, axis1=-2, axis2=-1) - fcol

    def sym(M):
        return 0.5 * (M + jnp.swapaxes(M, -1, -2))

    # PSD-slot duals are symmetric in the solver (slot values and their
    # projections are symmetric matrices); the adjoint exploits that
    y5 = sym(r(B, M5, k, 5, 5)) * jnp.asarray(sbh.minor_mask)[..., None, None, None]
    yx = sym(r(B, C, k + 1, k + 1)) * jnp.asarray(sbh.coord_mask)[..., None, None]
    yr = r(B, n * m, 3) * jnp.asarray(sbh.soc_mask)[..., None]
    yl = r(B, m)
    ywl = r(B, C) * jnp.asarray(sbh.coord_mask)

    lhs = (
        jnp.sum(y5 * (f5 - offs5)) + jnp.sum(yx * (fx - offsx))
        + jnp.sum(yr * (fr - offsr)) + jnp.sum(yl * f_link)
        + jnp.sum(ywl * fwl)
    )
    gXt, gW, gWt, gH, gv1, gv2, gv3 = _adjoint_shor_k(
        sb, y5, yx, yr, yl, ywl, B, n, m, k, kp, sX, sW
    )
    rhs = (
        jnp.sum(gXt * Xt) + jnp.sum(gW * W) + jnp.sum(gWt * Wt)
        + jnp.sum(gH * Hh) + jnp.sum(gv1 * v1) + jnp.sum(gv2 * v2)
        + jnp.sum(gv3 * v3)
        + jnp.sum(yl * sT * jnp.diagonal(Th, axis1=-2, axis2=-1))
    )
    np.testing.assert_allclose(float(lhs), float(rhs), rtol=1e-10)


def test_shor_k2_certified_bound_weak_duality():
    """k = 2: the certified Shor-k bound under-estimates a polished exact
    upper bound (weak duality at ANY solver accuracy)."""
    import omc
    from omc.solve import _polish_incumbent

    A, idx = _small_instance(k=2)
    n, m = A.shape
    k, gamma = 2, 20.0
    mask = idx.astype(np.float64)
    minors = _some_minors(idx, cap=6)
    soc = shor_soc_complement(n, m, minors)
    lo, hi = root_box(n, k)
    node = BBNode(
        node_id=1, parent_id=0, U_lower=lo, U_upper=hi, LB=-np.inf,
        depth=0, cuts=[],
        Shor_info=ShorInfo(constraints_indexes=minors,
                           SOC_constraints_indexes=soc),
    )
    res = omc.matrix_completion_SDP_relaxation(
        node, n, k, A, idx, gamma, disjunctive_cuts_type="linear",
        add_Shor_valid_inequalities=True, iters=1200,
    )
    assert np.isfinite(res["lower_bound"])
    assert "W" in res
    U0 = np.linalg.svd(A * mask, full_matrices=False)[0][:, :k]
    am = omc.alternating_minimization(A, n, k, idx, gamma, U_initial=U0)
    ub, _, _ = _polish_incumbent(am["U"] @ am["V"], A, mask, gamma, k)
    assert res["lower_bound"] <= ub + 1e-8
    # the bound should be non-trivial (way above -inf scale garbage)
    assert res["lower_bound"] > -10.0 * ub - 10.0


def test_safe_bound_backend_agreement():
    """The jnp evaluation of the backend-agnostic rank-k safe bound must
    match the numpy host certification on identical float64 duals (the
    on-device early-exit screen and the host bound share one function)."""
    from omc.sdp.shor_k import safe_dual_bound_shor_k

    rng = np.random.default_rng(7)
    k = 2
    A, idx = _small_instance(k=k)
    n, m = A.shape
    gamma, ub_bar = 20.0, 3.0
    mask = idx.astype(np.float64)
    minors = _some_minors(idx, cap=5)
    soc = shor_soc_complement(n, m, minors)
    M5 = 8
    sbh = pack_shor_k_batch(n, m, [minors], [soc], M5=M5, Msoc=n * m)
    B, C = 1, 4 * M5
    kp = k * (k - 1) // 2
    lo, hi = root_box(n, k)
    batch = NodeBatch(
        cut_x=np.zeros((B, 1, n)), cut_lo=np.zeros((B, 1, k)),
        cut_hi=np.zeros((B, 1, k)), cut_mask=np.zeros((B, 1)),
        U_lo=lo[None], U_hi=hi[None],
    )
    r = lambda *s: 0.1 * rng.standard_normal(s)
    out = {
        "y1": r(B, n + m, n + m), "y2": r(B, n + k, n + k),
        "ya": r(B, 1, k), "yb": r(B, 1, k), "yc": r(B, 1),
        "y5": r(B, M5, k, 5, 5), "yx": r(B, C, k + 1, k + 1),
        "yr": r(B, n * m, 3), "yl": r(B, m), "ywl": r(B, C),
    }
    lb_np = host_certified_bound_shor_k(
        A, mask, batch, sbh, out, gamma, k, ub_bar
    )
    from omc.sdp.shor_k import shor_k_batch_to_device

    sb64 = shor_k_batch_to_device(sbh, jnp.float64)
    b64 = NodeBatch(*[jnp.asarray(x, jnp.float64) for x in batch])
    lb_j = safe_dual_bound_shor_k(
        jnp, jnp.asarray(A), jnp.asarray(mask), b64, sb64,
        *[jnp.asarray(out[key]) for key in
          ("y1", "y2", "ya", "yb", "yc", "y5", "yx", "yr", "yl", "ywl")],
        gamma, k, ub_bar, margin_rel=1e-10,
    )
    np.testing.assert_allclose(np.asarray(lb_j), lb_np, rtol=1e-8, atol=1e-10)


def test_shor_k_early_exit():
    """k = 2 solver with a trivially-cleared target exits after ONE check
    chunk instead of running the full budget (VERDICT r3 weak #4)."""
    A, idx = _small_instance(k=2)
    n, m = A.shape
    k, gamma = 2, 20.0
    minors = _some_minors(idx, cap=4)
    soc = shor_soc_complement(n, m, minors)
    M5 = 4
    sbh = pack_shor_k_batch(n, m, [minors], [soc], M5=M5, Msoc=n * m)
    sb = shor_k_batch_to_device(sbh, jnp.float32)
    B, L = 1, 1
    lo, hi = root_box(n, k)
    f32 = jnp.float32
    batch = NodeBatch(
        cut_x=jnp.zeros((B, L, n), f32), cut_lo=jnp.zeros((B, L, k), f32),
        cut_hi=jnp.zeros((B, L, k), f32), cut_mask=jnp.zeros((B, L), f32),
        U_lo=jnp.asarray(lo, f32)[None], U_hi=jnp.asarray(hi, f32)[None],
    )
    solver = make_shor_k_solver(
        n, m, k, L, M5, n * m, gamma, iters=800, check_every=100,
    )
    state = init_shor_k_state(B, n, m, k, L, M5, n * m)
    Adev = jnp.asarray(A, jnp.float32)
    mdev = jnp.asarray(idx, jnp.float32)
    # a -1e9 target is cleared by any finite first-chunk bound
    target = jnp.full((B,), -1e9, jnp.float32)
    group = jnp.arange(B, dtype=jnp.int32)
    _, out = solver(Adev, mdev, batch, sb, 5.0, state, 800, target, group)
    iters = int(np.max(np.asarray(out["iters_run"])))
    assert iters == 100, iters
    assert np.isfinite(float(out["lb_est"][0]))
    # without a target the loop runs the full budget
    _, out2 = solver(Adev, mdev, batch, sb, 5.0, state, 300, None, None)
    assert int(np.max(np.asarray(out2["iters_run"]))) == 300


@pytest.mark.slow
def test_bnb_k2_shor_e2e():
    """End-to-end k = 2 with Shor valid inequalities (iterative growth)."""
    from omc.solve import matrix_completion_branchandbound

    A, idx = _small_instance(k=2, n=8, m=8, seed=4)
    sol, _, inst = matrix_completion_branchandbound(
        2, A, idx, 20.0,
        node_selection="bestfirst",
        disjunctive_cuts_type="linear",
        disjunctive_cuts_breakpoints="smallest_1_eigvec",
        add_Shor_valid_inequalities=True,
        add_Shor_valid_inequalities_iterative=True,
        update_Shor_indices_n_minors=8,
        gap=5e-2,
        batch_size=4,
        sdp_iters=800,
        dtype="float64",
        time_limit=240,
        verbosity=0,
    )
    rd = inst["run_details"]
    assert rd["nodes_explored"] >= 1
    assert sol["objective"] <= sol["objective_initial"] + 1e-12
    assert np.linalg.matrix_rank(sol["X"], tol=1e-6) <= 2
    lowers = [r["lower"] for r in inst["run_log"] if np.isfinite(r["lower"])]
    assert all(b >= a - 1e-9 for a, b in zip(lowers, lowers[1:]))


@pytest.mark.slow
def test_shor_k_bound_scale_invariance():
    """The k > 1 Shor slots are diagonally rescaled by the runtime sX (see
    omc.sdp.shor_k._forward_shor_k): solving the SAME problem at sX = 1
    and sX = 2.5 must converge to (near-)identical certified f64 bounds —
    catches any missed 1/sX / 1/sX^2 factor in solver or certification."""
    A, idx = _small_instance(k=2, n=6, m=6, seed=3)
    n, m = A.shape
    k, gamma = 2, 20.0
    minors = _some_minors(idx, cap=3)
    soc = shor_soc_complement(n, m, minors)
    M5 = 4
    sbh = pack_shor_k_batch(n, m, [minors], [soc], M5=M5, Msoc=n * m)
    sb = shor_k_batch_to_device(sbh, jnp.float64)
    B, L = 1, 1
    lo, hi = root_box(n, k)
    f64 = jnp.float64
    batch = NodeBatch(
        cut_x=jnp.zeros((B, L, n), f64), cut_lo=jnp.zeros((B, L, k), f64),
        cut_hi=jnp.zeros((B, L, k), f64), cut_mask=jnp.zeros((B, L), f64),
        U_lo=jnp.asarray(lo, f64)[None], U_hi=jnp.asarray(hi, f64)[None],
    )
    mask = idx.astype(np.float64)
    ub_bar = 0.5 * float(np.sum(mask * A * A))
    solver = make_shor_k_solver(
        n, m, k, L, M5, n * m, gamma, iters=40000, dtype=f64,
        psd_method="eigh", ema_iters=4000,
    )
    lbs = {}
    for sX in (1.0, 2.5):
        st0 = init_shor_k_state(B, n, m, k, L, M5, n * m, dtype=f64,
                                sX=sX, sT=1.0, rho=0.05)
        _, out = solver(jnp.asarray(A, f64), jnp.asarray(mask, f64), batch,
                        sb, ub_bar, st0)
        out_np = {kk: np.asarray(v) for kk, v in out.items()}
        lbs[sX] = float(host_certified_bound_shor_k(
            A, mask, batch, sbh, out_np, gamma, k, ub_bar
        )[0])
    assert np.isfinite(lbs[1.0]) and np.isfinite(lbs[2.5])
    assert abs(lbs[1.0] - lbs[2.5]) <= 5e-3 * max(1.0, abs(lbs[1.0])), lbs
