"""Tests for the Shor valid-inequality machinery (rank-1 path)."""

import numpy as np
import pytest

import jax.numpy as jnp

from omc.data import generate_matrix_completion_data
from omc.problem import evaluate_objective
from omc.sdp.admm import init_admm_state, make_admm_solver
from omc.sdp.admm_shor import (
    host_certified_bound_shor,
    init_shor_state,
    make_shor_solver,
    shor_batch_to_device,
)
from omc.sdp.relax import NodeBatch, host_certified_bound
from omc.sdp.shor import (
    generate_rank1_matrix_completion_Shor_constraints_indexes,
    generate_violated_Shor_minors,
    shor_soc_complement,
)
from omc.sdp.shor_encode import pack_shor_batch
from omc.tree import root_box


def test_shor_index_enumeration_counts():
    idx = np.zeros((3, 4), dtype=bool)
    idx[0, :2] = True
    idx[1, :2] = True
    idx[2, 2:] = True
    # rows (0,1): both observed at columns {0,1} -> one 4-minor
    out4 = generate_rank1_matrix_completion_Shor_constraints_indexes(idx, [4])
    assert (0, 1, 0, 1) in out4
    # classification is by observed count
    for num in [0, 1, 2, 3]:
        outs = generate_rank1_matrix_completion_Shor_constraints_indexes(idx, [num])
        for (i1, i2, j1, j2) in outs:
            cnt = int(idx[i1, j1]) + int(idx[i1, j2]) + int(idx[i2, j1]) + int(idx[i2, j2])
            assert cnt == num
            assert i1 < i2 and j1 < j2


def test_violated_minor_scoring():
    X = np.array([[1.0, 2.0], [3.0, 4.0]])  # det = -2
    idx = np.ones((2, 2), dtype=bool)
    minors = generate_violated_Shor_minors(X, idx, [4], [], 5)
    assert minors[0][1] == (0, 1, 0, 1)
    assert minors[0][0] == pytest.approx(2.0)
    # excluding the active minor leaves nothing
    assert generate_violated_Shor_minors(X, idx, [4], [(0, 1, 0, 1)], 5) == []


def test_soc_complement():
    soc = shor_soc_complement(2, 2, [(0, 1, 0, 1)])
    assert soc == []
    soc = shor_soc_complement(3, 2, [(0, 1, 0, 1)])
    assert soc == [(2, 0), (2, 1)]


@pytest.fixture(scope="module")
def shor_setup():
    n = m = 6
    k, gamma = 1, 20.0
    A, idx = generate_matrix_completion_data(k, n, m, 24, seed=1)
    mask = idx.astype(np.float64)
    minors = generate_rank1_matrix_completion_Shor_constraints_indexes(idx, [4])
    minors = minors[:12]
    soc = shor_soc_complement(n, m, minors)
    lo, hi = root_box(n, k)
    B, L, M5, Ms = 1, 4, 16, n * m
    batch = NodeBatch(
        cut_x=jnp.zeros((B, L, n)), cut_lo=jnp.zeros((B, L, k)),
        cut_hi=jnp.zeros((B, L, k)), cut_mask=jnp.zeros((B, L)),
        U_lo=jnp.asarray(lo[None]), U_hi=jnp.asarray(hi[None]),
    )
    sbh = pack_shor_batch(n, m, [minors], [soc], M5, Ms)
    return dict(n=n, m=m, k=k, gamma=gamma, A=A, mask=mask, batch=batch,
                sbh=sbh, L=L, M5=M5, Ms=Ms)


def test_shor_solver_weak_duality_and_tightening(shor_setup):
    s = shor_setup
    n, m, gamma = s["n"], s["m"], s["gamma"]
    A, mask = s["A"], s["mask"]
    # a master-feasible rank-1 point for the upper bound
    rng = np.random.default_rng(0)
    u = rng.standard_normal(n)
    u /= np.linalg.norm(u)
    U = u[:, None]
    G = np.einsum("nk,nm,nl->mkl", U, mask, U) + (1 / gamma) * (U.T @ U)[None]
    V = np.linalg.solve(G, ((U.T @ (mask * A)).T)[..., None])[..., 0].T
    X = U @ V
    obj = float(evaluate_objective(X, A, mask, U, gamma))
    ub_bar = obj * (1 + 1e-9)

    solver = make_shor_solver(
        n, m, s["L"], s["M5"], s["Ms"], gamma, iters=6000,
        dtype=jnp.float64, psd_method="eigh",
    )
    sb_dev = shor_batch_to_device(s["sbh"], jnp.float64)
    st0 = init_shor_state(1, n, m, 1, s["L"], s["M5"], s["Ms"], jnp.float64,
                          rho=0.05)
    state, out = solver(jnp.asarray(A), jnp.asarray(mask), s["batch"], sb_dev,
                        ub_bar, st0)
    out_np = {kk: np.asarray(v) for kk, v in out.items()}
    lb_shor = float(host_certified_bound_shor(
        A, mask, s["batch"], s["sbh"], out_np, gamma, ub_bar
    )[0])
    assert lb_shor <= obj + 1e-9

    # primal near-feasibility of the W-linearised objective value
    Xp = out_np["X"][0]
    Wp = out_np["W"][0]
    Thp = out_np["Th"][0]
    pobj = (
        0.5 * np.sum(mask * (A**2 - 2 * A * Xp + Wp))
        + 0.5 / gamma * np.trace(Thp)
    )
    assert lb_shor <= pobj + 0.05 * max(1.0, abs(pobj))

    # the Shor-strengthened bound should not be (materially) weaker than
    # the plain relaxation bound at convergence
    plain = make_admm_solver(n, m, 1, s["L"], gamma, iters=6000,
                             dtype=jnp.float64, rho=0.05, psd_method="eigh")
    st_p = init_admm_state(1, n, m, 1, s["L"], jnp.float64, rho=0.05)
    _, out_p = plain(jnp.asarray(A), jnp.asarray(mask), s["batch"], ub_bar, st_p)
    out_p = {kk: np.asarray(v) for kk, v in out_p.items()}
    lb_plain = float(host_certified_bound(
        A, mask, s["batch"], out_p, gamma, 1, ub_bar
    )[0])
    assert lb_shor >= lb_plain - 0.02 * max(1.0, abs(lb_plain))


def test_shor_bound_scale_invariance(shor_setup):
    """The 5x5 minor slots are diagonally rescaled by the runtime sX (see
    omc.sdp.admm_shor._forward_shor): solving the SAME problem with
    sX = 1 and sX = 2.5 must give (near-)identical certified f64 bounds —
    catches any missed 1/sX / 1/sX^2 factor in the solver or the
    certification scatter coefficients."""
    s = shor_setup
    n, m, gamma = s["n"], s["m"], s["gamma"]
    A, mask = s["A"], s["mask"]
    ub_bar = 0.5 * float(np.sum(mask * A * A))
    solver = make_shor_solver(
        n, m, s["L"], s["M5"], s["Ms"], gamma, iters=40000,
        dtype=jnp.float64, psd_method="eigh", ema_iters=4000,
    )
    sb_dev = shor_batch_to_device(s["sbh"], jnp.float64)
    lbs = {}
    for sX in (1.0, 2.5):
        st0 = init_shor_state(1, n, m, 1, s["L"], s["M5"], s["Ms"],
                              jnp.float64, rho=0.05, sX=sX, sT=1.0)
        _, out = solver(jnp.asarray(A), jnp.asarray(mask), s["batch"],
                        sb_dev, ub_bar, st0)
        out_np = {kk: np.asarray(v) for kk, v in out.items()}
        lbs[sX] = float(host_certified_bound_shor(
            A, mask, s["batch"], s["sbh"], out_np, gamma, ub_bar
        )[0])
    assert np.isfinite(lbs[1.0]) and np.isfinite(lbs[2.5])
    # different ADMM trajectories -> not bit-equal, but both must land at
    # the same relaxation optimum
    assert abs(lbs[1.0] - lbs[2.5]) <= 2e-3 * max(1.0, abs(lbs[1.0])), lbs
