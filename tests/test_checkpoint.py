"""Checkpoint / resume tests."""

import os

import numpy as np

from omc.data import generate_matrix_completion_data
from omc.solve import matrix_completion_branchandbound
from omc.utils.checkpoint import load_checkpoint, save_checkpoint


def test_checkpoint_roundtrip(tmp_path):
    p = str(tmp_path / "ck.pkl")
    payload = {"a": np.arange(5), "b": {"x": 1.5}}
    save_checkpoint(p, payload)
    out = load_checkpoint(p)
    np.testing.assert_array_equal(out["a"], np.arange(5))
    assert out["b"]["x"] == 1.5


def test_solver_writes_and_resumes_checkpoint(tmp_path):
    n = m = 12
    k = 1
    A, idx = generate_matrix_completion_data(k, n, m, int(0.5 * n * m), seed=3)
    ck = str(tmp_path / "solver.ckpt")
    common = dict(
        node_selection="bestfirst",
        disjunctive_cuts_type="linear",
        disjunctive_cuts_breakpoints="smallest_1_eigvec",
        batch_size=2, sdp_iters=1500, dtype="float64",
        verbosity=0, checkpoint_path=ck, checkpoint_every=0,
    )
    # phase 1: a short run that cannot finish
    sol1, _, inst1 = matrix_completion_branchandbound(
        1, A, idx, 80.0, gap=1e-9, use_max_steps=True, max_steps=3, **common
    )
    assert os.path.exists(ck)
    state = load_checkpoint(ck)
    assert state["tree"].nodes_explored >= 1
    # phase 2: resume and run to a modest gap
    sol2, _, inst2 = matrix_completion_branchandbound(
        1, A, idx, 80.0, gap=1e-3, resume=True, time_limit=120, **common
    )
    assert inst2["run_log"][-1]["gap"] <= 1e-3
    assert sol2["objective"] <= sol1["objective"] + 1e-12
