"""Multi-host frontier distribution, tested by multi-process CPU
simulation (SURVEY section 4: jax.distributed over TCP on one machine).

The 2-process run must certify the same optimum as the single-process run
and sync a consistent global census.
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

from omc.data import generate_matrix_completion_data
from omc.parallel.dist import (
    deserialize_node,
    node_wire_size,
    serialize_node,
)
from omc.tree import BBNode, DisjunctiveCut, root_box


def test_node_wire_roundtrip():
    rng = np.random.default_rng(0)
    n, k, Lmax = 7, 2, 3
    lo, hi = root_box(n, k)
    cuts = [
        DisjunctiveCut(
            x=rng.standard_normal(n), vhat=rng.standard_normal(k),
            code=np.asarray(rng.integers(0, 2, k), np.int32),
        )
        for _ in range(2)
    ]
    node = BBNode(
        node_id=17, parent_id=4, U_lower=lo, U_upper=hi, LB=1.25, depth=2,
        master_feasible=True, cuts=cuts, refines=3, lb_solver=1.2,
    )
    vec = serialize_node(node, prio_lb=1.1, n=n, k=k, Lmax=Lmax)
    assert vec.shape == (node_wire_size(n, k, Lmax),)
    prio, back, _ = deserialize_node(vec, n, k, Lmax, node_id=99)
    assert prio == 1.1
    assert back.node_id == 99
    assert back.LB == node.LB and back.depth == 2 and back.refines == 3
    assert back.master_feasible
    np.testing.assert_array_equal(back.U_lower, node.U_lower)
    np.testing.assert_array_equal(back.U_upper, node.U_upper)
    assert len(back.cuts) == 2
    for a, b in zip(back.cuts, cuts):
        np.testing.assert_allclose(a.x, b.x)
        np.testing.assert_allclose(a.vhat, b.vhat)
        np.testing.assert_array_equal(a.code, b.code)


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.slow
def test_two_process_distributed_matches_single():
    here = os.path.dirname(os.path.abspath(__file__))
    worker = os.path.join(here, "dist_worker.py")
    coord = f"localhost:{_free_port()}"
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    procs = [
        subprocess.Popen(
            [sys.executable, worker, coord, str(pid), "2"],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
            env=env,
        )
        for pid in range(2)
    ]
    results = {}
    try:
        for p in procs:
            out, err = p.communicate(timeout=600)
            assert p.returncode == 0, f"worker failed:\n{err[-3000:]}"
            line = [l for l in out.splitlines() if l.startswith("RESULT ")][-1]
            r = json.loads(line[len("RESULT "):])
            results[r["pid"]] = r
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()

    assert set(results) == {0, 1}
    r0, r1 = results[0], results[1]
    assert r0["process_count"] == 2
    # both hosts converged to the same certified state
    assert r0["gap"] <= 1e-2 and r1["gap"] <= 1e-2
    assert r0["objective"] == pytest.approx(r1["objective"], rel=1e-9)
    assert r0["nodes_explored_global"] == r1["nodes_explored_global"]
    assert (
        r0["nodes_explored_global"]
        == r0["nodes_explored_local"] + r1["nodes_explored_local"]
    )

    # single-process ground truth on the same instance
    from omc.solve import matrix_completion_branchandbound

    A, idx = generate_matrix_completion_data(1, 10, 10, 60, seed=2)
    sol1, _, inst1 = matrix_completion_branchandbound(
        1, A, idx, 20.0,
        node_selection="bestfirst", disjunctive_cuts_type="linear",
        disjunctive_cuts_breakpoints="smallest_1_eigvec", gap=1e-2,
        batch_size=4, sdp_iters=600, dtype="float64", time_limit=150,
        verbosity=0,
    )
    assert r0["objective"] == pytest.approx(sol1["objective"], rel=1e-6)


def test_node_wire_roundtrip_shor():
    from omc.sdp.shor import shor_soc_complement
    from omc.tree import ShorInfo

    rng = np.random.default_rng(1)
    n, k, Lmax, Mmax, m = 6, 1, 2, 5, 8
    lo, hi = root_box(n, k)
    minors = [(0, 2, 1, 3), (1, 4, 0, 5)]
    node = BBNode(
        node_id=3, parent_id=1, U_lower=lo, U_upper=hi, LB=0.5, depth=1,
        cuts=[DisjunctiveCut(
            x=rng.standard_normal(n), vhat=rng.standard_normal(k),
            code=np.asarray([1], np.int32),
        )],
        Shor_info=ShorInfo(
            constraints_indexes=minors,
            SOC_constraints_indexes=shor_soc_complement(n, m, minors),
        ),
    )
    vec = serialize_node(node, prio_lb=0.4, n=n, k=k, Lmax=Lmax, Mmax=Mmax)
    assert vec.shape == (node_wire_size(n, k, Lmax, Mmax),)
    prio, back, _ = deserialize_node(vec, n, k, Lmax, node_id=9, Mmax=Mmax, m=m)
    assert back.Shor_info is not None
    assert back.Shor_info.constraints_indexes == minors
    assert back.Shor_info.SOC_constraints_indexes == shor_soc_complement(
        n, m, minors
    )
    # a Shor-less node on the same wire capacity round-trips to None
    node2 = BBNode(
        node_id=4, parent_id=1, U_lower=lo, U_upper=hi, LB=0.5, depth=1,
        cuts=[],
    )
    vec2 = serialize_node(node2, prio_lb=0.4, n=n, k=k, Lmax=Lmax, Mmax=Mmax)
    _, back2, _ = deserialize_node(vec2, n, k, Lmax, node_id=10, Mmax=Mmax, m=m)
    assert back2.Shor_info is None


def test_node_wire_roundtrip_warm_state():
    """A node's float32 solver-state slice travels on the wire (VERDICT r3
    weak #7: migrated nodes must not restart refinement cold), including
    leading-axis refit across cut-capacity buckets."""
    rng = np.random.default_rng(2)
    n, k, Lmax = 5, 1, 2
    lo, hi = root_box(n, k)
    node = BBNode(
        node_id=6, parent_id=2, U_lower=lo, U_upper=hi, LB=0.7, depth=1,
        cuts=[], refines=2,
    )
    # spec with a matrix leaf, a bucket-sized leaf, and a scalar-ish leaf
    spec = [(n, n), (4, k), (1,)]
    leaves = [
        rng.standard_normal((n, n)).astype(np.float32),
        rng.standard_normal((2, k)).astype(np.float32),  # smaller L bucket
        np.asarray([3.5], np.float32),
    ]
    vec = serialize_node(
        node, prio_lb=0.6, n=n, k=k, Lmax=Lmax, state=leaves, state_spec=spec
    )
    assert vec.shape == (node_wire_size(n, k, Lmax, 0, spec),)
    _, back, st = deserialize_node(
        vec, n, k, Lmax, node_id=11, state_spec=spec
    )
    assert st is not None and len(st) == 3
    np.testing.assert_allclose(st[0], leaves[0], rtol=1e-6)
    np.testing.assert_allclose(st[1][:2], leaves[1], rtol=1e-6)
    np.testing.assert_allclose(st[1][2:], 0.0)  # zero-padded rows
    np.testing.assert_allclose(st[2], leaves[2])
    # a node without cached state round-trips to None on the same capacity
    vec2 = serialize_node(
        node, prio_lb=0.6, n=n, k=k, Lmax=Lmax, state=None, state_spec=spec
    )
    _, _, st2 = deserialize_node(vec2, n, k, Lmax, node_id=12, state_spec=spec)
    assert st2 is None


def _run_two_workers(mode=None, timeout=600):
    here = os.path.dirname(os.path.abspath(__file__))
    worker = os.path.join(here, "dist_worker.py")
    coord = f"localhost:{_free_port()}"
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    procs = [
        subprocess.Popen(
            [sys.executable, worker, coord, str(pid), "2"]
            + ([mode] if mode else []),
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
            env=env,
        )
        for pid in range(2)
    ]
    results = {}
    try:
        for p in procs:
            out, err = p.communicate(timeout=timeout)
            assert p.returncode == 0, f"worker failed:\n{err[-3000:]}"
            line = [l for l in out.splitlines() if l.startswith("RESULT ")][-1]
            r = json.loads(line[len("RESULT "):])
            results[r["pid"]] = r
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    assert set(results) == {0, 1}
    return results


@pytest.mark.slow
def test_warm_migration_not_worse_than_cold():
    """Warm state migration (solver-state slices on the rebalancing wire)
    must certify the same optimum as the cold-restart ablation without
    paying MORE refinement visits (VERDICT r3 weak #7).  Both runs are
    deterministic, so the comparison is stable."""
    warm = _run_two_workers()
    cold = _run_two_workers("coldmigrate")
    assert warm[0]["objective"] == pytest.approx(
        cold[0]["objective"], rel=1e-6
    )
    assert warm[0]["gap"] <= 1e-2 and cold[0]["gap"] <= 1e-2
    assert (
        warm[0]["refinement_visits_global"]
        <= cold[0]["refinement_visits_global"]
    )


@pytest.mark.slow
def test_two_process_distributed_shor():
    """Distributed mode with iterative Shor minors: both hosts certify the
    same optimum; minor state migrates with rebalanced nodes."""
    here = os.path.dirname(os.path.abspath(__file__))
    worker = os.path.join(here, "dist_worker.py")
    coord = f"localhost:{_free_port()}"
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    procs = [
        subprocess.Popen(
            [sys.executable, worker, coord, str(pid), "2", "shor"],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
            env=env,
        )
        for pid in range(2)
    ]
    results = {}
    try:
        for p in procs:
            out, err = p.communicate(timeout=600)
            assert p.returncode == 0, f"worker failed:\n{err[-3000:]}"
            line = [l for l in out.splitlines() if l.startswith("RESULT ")][-1]
            r = json.loads(line[len("RESULT "):])
            results[r["pid"]] = r
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    assert set(results) == {0, 1}
    r0, r1 = results[0], results[1]
    assert r0["gap"] <= 1e-2 and r1["gap"] <= 1e-2
    assert r0["objective"] == pytest.approx(r1["objective"], rel=1e-9)
