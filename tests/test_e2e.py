"""End-to-end branch-and-bound integration tests (SURVEY.md section 4:
the reference gives correctness oracles; the end-to-end oracle is a
certified gap plus an incumbent matching the best-known solution)."""

import numpy as np
import pytest

from omc.data import generate_matrix_completion_data
from omc.solve import matrix_completion_branchandbound


@pytest.fixture(scope="module")
def small_instance():
    n = m = 12
    k = 1
    A, idx = generate_matrix_completion_data(k, n, m, int(0.5 * n * m), seed=3)
    return A, idx


def test_bnb_certifies_small_instance(small_instance):
    A, idx = small_instance
    gamma = 80.0
    sol, printlist, inst = matrix_completion_branchandbound(
        1, A, idx, gamma,
        node_selection="bestfirst",
        disjunctive_cuts_type="linear",
        disjunctive_cuts_breakpoints="smallest_1_eigvec",
        gap=1e-3,
        batch_size=4,
        sdp_iters=1500,
        sdp_rho=0.03,
        dtype="float64",
        time_limit=120,
        verbosity=0,
    )
    rd = inst["run_details"]
    log = inst["run_log"]
    assert log[-1]["gap"] <= 1e-3
    # incumbent is a valid rank-1 completion and beats the warm start or ties
    assert sol["objective"] <= sol["objective_initial"] + 1e-12
    assert np.linalg.matrix_rank(sol["X"], tol=1e-6) <= 1
    # census EQUALITY invariants (reference lines 411-454), exact on a
    # gap-certified run under the terminal-outcome partition:
    # (3) + (4) + (5) == (1)
    assert (
        rd["nodes_dominated"]
        + rd["nodes_relax_infeasible"]
        + rd["nodes_relax_feasible"]
        == rd["nodes_explored"]
    )
    # (6) + (7) + (9) == (5)
    assert (
        rd["nodes_relax_feasible_pruned"]
        + rd["nodes_master_feasible"]
        + rd["nodes_relax_feasible_split"]
        == rd["nodes_relax_feasible"]
    )
    # (8) <= (7); (10) <= (9); (11) <= (10)
    assert (
        rd["nodes_master_feasible_improvement"] <= rd["nodes_master_feasible"]
    )
    assert (
        rd["nodes_relax_feasible_split_altmin"]
        <= rd["nodes_relax_feasible_split"]
    )
    assert (
        rd["nodes_relax_feasible_split_altmin_improvement"]
        <= rd["nodes_relax_feasible_split_altmin"]
    )
    # run_log columns present and monotone lower bound
    lowers = [r["lower"] for r in log if np.isfinite(r["lower"])]
    assert all(b >= a - 1e-9 for a, b in zip(lowers, lowers[1:]))
    # output contract fields
    for key in ["X", "Y", "U", "MSE_in", "MSE_out", "MSE_all",
                "objective_initial", "X_initial"]:
        assert key in sol


def test_root_only_mode(small_instance):
    A, idx = small_instance
    sol, _, inst = matrix_completion_branchandbound(
        1, A, idx, 80.0,
        node_selection="bestfirst",
        disjunctive_cuts_type="linear",
        disjunctive_cuts_breakpoints="smallest_1_eigvec",
        root_only=True,
        batch_size=2,
        sdp_iters=500,
        dtype="float64",
        verbosity=0,
    )
    assert inst["run_details"]["nodes_explored"] == 1
    assert inst["run_details"]["nodes_total"] >= 1


@pytest.mark.slow
def test_bnb_rank2_linear3_smallest2_bfdf():
    """Rank-2 disjunctive end-to-end: 4^k fan-out (linear3), blended
    smallest_2_eigvec breakpoints, bestfirst_depthfirst selection —
    the BASELINE config-3 feature set at test size."""
    n = m = 10
    A, idx = generate_matrix_completion_data(2, n, m, int(0.7 * n * m), seed=6)
    sol, _, inst = matrix_completion_branchandbound(
        2, A, idx, 20.0,
        node_selection="bestfirst_depthfirst",
        bestfirst_depthfirst_cutoff=50,
        disjunctive_cuts_type="linear3",
        disjunctive_cuts_breakpoints="smallest_2_eigvec",
        gap=2e-2,
        batch_size=8,
        sdp_iters=1200,
        dtype="float64",
        time_limit=300,
        verbosity=0,
    )
    rd = inst["run_details"]
    log = inst["run_log"]
    assert log[-1]["gap"] <= 2e-2
    assert sol["objective"] <= sol["objective_initial"] + 1e-12
    assert np.linalg.matrix_rank(sol["X"], tol=1e-6) <= 2
    # 4^k = 16-way fan-out: any split must have created 16 children
    if rd["nodes_relax_feasible_split"] > 0:
        assert rd["nodes_total"] >= 1 + 16
    lowers = [r["lower"] for r in log if np.isfinite(r["lower"])]
    assert all(b >= a - 1e-9 for a, b in zip(lowers, lowers[1:]))


def test_selective_host_certify_path(small_instance):
    """host_certify_max_batch below the bucket forces the scale path:
    device bounds + f64 certification of binding slots only.  The solve
    must still certify the same optimum."""
    A, idx = small_instance
    sol, _, inst = matrix_completion_branchandbound(
        1, A, idx, 80.0,
        node_selection="bestfirst",
        disjunctive_cuts_type="linear",
        disjunctive_cuts_breakpoints="smallest_1_eigvec",
        gap=1e-3, batch_size=8, sdp_iters=1500, dtype="float64",
        time_limit=120, verbosity=0,
        host_certify_max_batch=1,
    )
    assert inst["run_log"][-1]["gap"] <= 1e-3
    sol_ref, _, _ = matrix_completion_branchandbound(
        1, A, idx, 80.0,
        node_selection="bestfirst",
        disjunctive_cuts_type="linear",
        disjunctive_cuts_breakpoints="smallest_1_eigvec",
        gap=1e-3, batch_size=8, sdp_iters=1500, dtype="float64",
        time_limit=120, verbosity=0,
    )
    assert abs(sol["objective"] - sol_ref["objective"]) <= 1e-6 * max(
        1.0, abs(sol_ref["objective"])
    )
