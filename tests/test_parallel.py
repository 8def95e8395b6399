"""Multi-device sharded super-step tests on the virtual 8-device CPU mesh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from omc.data import generate_matrix_completion_data
from omc.parallel.mesh import make_mesh, shard_batch, shard_solver
from omc.sdp.admm import init_admm_state, make_admm_solver
from omc.sdp.relax import NodeBatch, host_certified_bound
from omc.tree import root_box


def _batch(B, n, k, L):
    lo, hi = root_box(n, k)
    return NodeBatch(
        cut_x=jnp.zeros((B, L, n)), cut_lo=jnp.zeros((B, L, k)),
        cut_hi=jnp.zeros((B, L, k)), cut_mask=jnp.zeros((B, L)),
        U_lo=jnp.asarray(np.broadcast_to(lo, (B, n, k))),
        U_hi=jnp.asarray(np.broadcast_to(hi, (B, n, k))),
    )


def test_shard_solver_matches_single_device():
    """The PRODUCTION mesh wrapper (shard_solver, the one the driver uses)
    must reproduce single-device solver outputs and certified bounds."""
    assert jax.device_count() >= 8, "conftest must provide 8 virtual devices"
    n = m = 8
    k, gamma, L, B = 1, 40.0, 4, 8
    A, idx = generate_matrix_completion_data(k, n, m, 40, seed=0)
    mask = idx.astype(np.float64)
    ub = 0.5 * float(np.sum(mask * A * A))

    mesh = make_mesh(8)
    raw = make_admm_solver(n, m, k, L, gamma, iters=200, dtype=jnp.float64,
                           rho=0.05, jit=False)
    step = shard_solver(mesh, raw, extra_sharded=2)
    batch = _batch(B, n, k, L)
    st0 = init_admm_state(B, n, m, k, L, jnp.float64)
    batch_s, st_s = shard_batch(mesh, batch, st0)
    # +inf targets: no slot's estimator ever clears, so the loop runs the
    # full budget on every device — exact parity with the reference call
    target = jnp.full((B,), jnp.inf, jnp.float64)
    group = jnp.arange(B, dtype=jnp.int32)
    from omc.parallel.mesh import put_sharded

    state, out = step(
        jnp.asarray(A), jnp.asarray(mask), batch_s, ub, st_s,
        200, put_sharded(mesh, target), put_sharded(mesh, group),
    )
    lb_dev = np.asarray(out["lb_dev"])
    assert np.isfinite(lb_dev).all()

    # identical math on one device (same batch, same iterations)
    solver = make_admm_solver(n, m, k, L, gamma, iters=200, dtype=jnp.float64,
                              rho=0.05)
    _, out1 = solver(jnp.asarray(A), jnp.asarray(mask), batch, ub, st0,
                     200, target, group)
    np.testing.assert_allclose(
        np.asarray(out["Y"]), np.asarray(out1["Y"]), rtol=1e-8, atol=1e-8
    )
    # host-certified bounds agree too
    outs = {kk: np.asarray(v) for kk, v in out.items()}
    out1s = {kk: np.asarray(v) for kk, v in out1.items()}
    lb_a = host_certified_bound(A, mask, batch, outs, gamma, k, ub)
    lb_b = host_certified_bound(A, mask, batch, out1s, gamma, k, ub)
    np.testing.assert_allclose(lb_a, lb_b, rtol=1e-8, atol=1e-8)


def test_driver_mesh_matches_single_device():
    """The full B&B driver with mesh_shape=(8,) must certify the same
    optimum as the single-device run (bit-for-bit tree decisions are not
    required — the certified objective and gap are)."""
    from omc.data import generate_matrix_completion_data
    from omc.solve import matrix_completion_branchandbound

    A, idx = generate_matrix_completion_data(1, 10, 10, 60, seed=2)
    common = dict(
        node_selection="bestfirst", disjunctive_cuts_type="linear",
        disjunctive_cuts_breakpoints="smallest_1_eigvec", gap=1e-2,
        batch_size=8, sdp_iters=600, dtype="float64", time_limit=120,
        verbosity=0,
    )
    sol1, _, inst1 = matrix_completion_branchandbound(1, A, idx, 20.0, **common)
    sol8, _, inst8 = matrix_completion_branchandbound(
        1, A, idx, 20.0, mesh_shape=(8,), **common
    )
    assert inst8["run_log"][-1]["gap"] <= 1e-2
    assert sol8["objective"] == pytest.approx(sol1["objective"], rel=1e-6)


def test_driver_mesh_mccormick():
    from omc.data import generate_matrix_completion_data
    from omc.solve import matrix_completion_branchandbound

    A, idx = generate_matrix_completion_data(1, 8, 8, 44, seed=4)
    sol, _, inst = matrix_completion_branchandbound(
        1, A, idx, 20.0, use_disjunctive_cuts=False, mesh_shape=(8,),
        node_selection="bestfirst", gap=5e-2, batch_size=8, sdp_iters=800,
        dtype="float64", time_limit=120, verbosity=0,
    )
    assert np.isfinite(sol["objective"])
    assert inst["run_log"][-1]["gap"] <= 5e-2


def test_driver_mesh_shor():
    """Shor valid inequalities under an 8-device mesh (sharded constraint
    tables + runtime iteration budget)."""
    from omc.data import generate_matrix_completion_data
    from omc.solve import matrix_completion_branchandbound

    A, idx = generate_matrix_completion_data(1, 8, 8, 44, seed=4)
    sol, _, inst = matrix_completion_branchandbound(
        1, A, idx, 20.0,
        node_selection="bestfirst",
        disjunctive_cuts_type="linear",
        disjunctive_cuts_breakpoints="smallest_1_eigvec",
        add_Shor_valid_inequalities=True,
        add_Shor_valid_inequalities_iterative=True,
        update_Shor_indices_n_minors=6,
        mesh_shape=(8,), gap=5e-2, batch_size=8, sdp_iters=600,
        dtype="float64", time_limit=180, verbosity=0,
    )
    assert np.isfinite(sol["objective"])
    assert inst["run_log"][-1]["gap"] <= 5e-2
