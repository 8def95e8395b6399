#!/usr/bin/env python
"""BASELINE.md benchmark configs 2-5.

Usage: python benchmarks/bench_configs.py <config> [<config> ...]
Each config prints ONE JSON line:

  2  rank-1 100x100 noisy + iterative Shor valid inequalities ([4]-minors,
     top-100 violated per step), breadthfirst — time/gap within budget
  3  rank-2 75x75, smallest_2_eigvec breakpoints, linear3 (4-piece) cuts,
     bestfirst_depthfirst — time/gap within budget
  4  rank-5 250x250 vmapped-frontier throughput: one batched super-step of
     B simultaneous node SDP relaxations on one chip (node relaxations/sec,
     on-device safe bounds + selective host certification)
  5  multi-host scaling: 2-process jax.distributed CPU simulation vs the
     single-process run on the same instance (nodes/sec efficiency)

Env knobs: OMC_B4_BATCH (default 1024), OMC_B4_ITERS (400),
OMC_BENCH_TIME_LIMIT (600), OMC_BENCH_GAP (1e-2).

The reference cannot run these in-container (no Julia/Mosek; BASELINE.md
"Reference baseline stand-in"), so configs 2-3 report absolute time-to-gap
for the record rather than a vs_baseline ratio.
"""

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def _common():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    on_tpu = jax.default_backend() not in ("cpu",)
    return jax, on_tpu


def config2():
    jax, on_tpu = _common()
    from omc.data import generate_matrix_completion_data
    from omc.solve import matrix_completion_branchandbound

    n = m = 100
    A, idx = generate_matrix_completion_data(1, n, m, int(0.3 * n * m), seed=1)
    gap = float(os.environ.get("OMC_BENCH_GAP", "1e-2"))
    tl = int(os.environ.get("OMC_BENCH_TIME_LIMIT", "600"))
    kwargs2 = dict(
        node_selection="breadthfirst",
        disjunctive_cuts_type="linear",
        disjunctive_cuts_breakpoints="smallest_1_eigvec",
        add_Shor_valid_inequalities=True,
        add_Shor_valid_inequalities_iterative=True,
        Shor_valid_inequalities_noisy_rank1_num_entries_present=[4],
        update_Shor_indices_n_minors=100,
        gap=gap, time_limit=tl, batch_size=32, sdp_iters=2000,
        dtype="float32" if on_tpu else "float64", altmin_root_n_iters=3,
        verbosity=0,
    )
    if os.environ.get("OMC_BENCH_WARMUP"):
        # compile warmup at a tight step budget (program set is shared);
        # the timed run below then measures warm time-to-gap like bench.py
        matrix_completion_branchandbound(
            1, A, idx, 80.0, **{**kwargs2, "use_max_steps": True,
                                "max_steps": 2, "time_limit": min(tl, 120)}
        )
    t0 = time.time()
    sol, _, inst = matrix_completion_branchandbound(1, A, idx, 80.0, **kwargs2)
    elapsed = time.time() - t0
    rd = inst["run_details"]
    gap_final = (
        float(inst["run_log"][-1]["gap"]) if inst["run_log"] else float("inf")
    )
    print(json.dumps({
        "metric": "config2_rank1_100x100_shor_iterative_breadthfirst",
        "value": round(elapsed, 3), "unit": "s",
        "gap_achieved": gap_final,
        "gap_target": gap,
        "objective": float(sol["objective"]),
        "nodes_explored": int(rd["nodes_explored"]),
        "backend": jax.default_backend(),
    }), flush=True)


def config3():
    jax, on_tpu = _common()
    from omc.data import generate_matrix_completion_data
    from omc.solve import matrix_completion_branchandbound

    n = m = 75
    A, idx = generate_matrix_completion_data(2, n, m, int(0.5 * n * m), seed=1)
    gap = float(os.environ.get("OMC_BENCH_GAP", "1e-2"))
    tl = int(os.environ.get("OMC_BENCH_TIME_LIMIT", "600"))
    kwargs3 = dict(
        node_selection="bestfirst_depthfirst",
        bestfirst_depthfirst_cutoff=10000,
        disjunctive_cuts_type="linear3",
        disjunctive_cuts_breakpoints="smallest_2_eigvec",
        gap=gap, time_limit=tl, batch_size=64, sdp_iters=2000,
        dtype="float32" if on_tpu else "float64", altmin_root_n_iters=3,
        verbosity=0,
    )
    if os.environ.get("OMC_BENCH_WARMUP"):
        matrix_completion_branchandbound(
            2, A, idx, 80.0, **{**kwargs3, "use_max_steps": True,
                                "max_steps": 2, "time_limit": min(tl, 120)}
        )
    t0 = time.time()
    sol, _, inst = matrix_completion_branchandbound(2, A, idx, 80.0, **kwargs3)
    elapsed = time.time() - t0
    rd = inst["run_details"]
    gap_final3 = (
        float(inst["run_log"][-1]["gap"]) if inst["run_log"] else float("inf")
    )
    print(json.dumps({
        "metric": "config3_rank2_75x75_linear3_smallest2_bfdf",
        "value": round(elapsed, 3), "unit": "s",
        "gap_achieved": gap_final3,
        "gap_target": gap,
        "objective": float(sol["objective"]),
        "nodes_explored": int(rd["nodes_explored"]),
        "refinement_visits": int(rd["refinement_visits"]),
        "device_s": round(float(rd["solve_time_device"]), 3),
        "certify_s": round(float(rd["solve_time_certify"]), 3),
        "backend": jax.default_backend(),
    }), flush=True)


def config4():
    jax, on_tpu = _common()
    import jax.numpy as jnp
    from omc.data import generate_matrix_completion_data
    from omc.sdp.admm import init_admm_state, make_admm_solver
    from omc.sdp.relax import NodeBatch, host_certified_bound
    from omc.tree import root_box

    n = m = 250
    k = 5
    L = 8
    # one 250x250 node's ADMM state is ~4 MB (w1/u1 are (500, 500)); the
    # BASELINE 4096-node frontier is a v5p(96 GB HBM) shape — on smaller
    # chips the same frontier runs as sequential sub-batches of B_dev
    # nodes (throughput is what the config measures, and the driver
    # buckets batches the same way)
    B = int(os.environ.get("OMC_B4_BATCH", "1024"))
    B_dev = int(os.environ.get("OMC_B4_DEV_BATCH", "128"))
    B_dev = min(B_dev, B)
    iters = int(os.environ.get("OMC_B4_ITERS", "400"))
    gamma = 80.0
    dtype = jnp.float32
    A, idx = generate_matrix_completion_data(k, n, m, int(0.3 * n * m), seed=1)
    mask = idx.astype(np.float64)
    lo, hi = root_box(n, k)
    rng = np.random.default_rng(0)

    # a synthetic depth-1 frontier: every node carries one random unit-
    # vector cut (exercises the full constraint path, not just the root)
    cut_x = rng.standard_normal((B_dev, L, n))
    cut_x /= np.linalg.norm(cut_x, axis=-1, keepdims=True)
    cut_lo = np.tile(np.array([-1.0] * k), (B_dev, L, 1))
    cut_hi = np.tile(np.array([0.1] * k), (B_dev, L, 1))
    cut_mask = np.zeros((B_dev, L))
    cut_mask[:, 0] = 1.0
    batch = NodeBatch(
        cut_x=jnp.asarray(cut_x, dtype), cut_lo=jnp.asarray(cut_lo, dtype),
        cut_hi=jnp.asarray(cut_hi, dtype), cut_mask=jnp.asarray(cut_mask, dtype),
        U_lo=jnp.asarray(np.broadcast_to(lo, (B_dev, n, k)), dtype),
        U_hi=jnp.asarray(np.broadcast_to(hi, (B_dev, n, k)), dtype),
    )
    ub_bar = 0.5 * float(np.sum(mask * A * A))
    solver = make_admm_solver(
        n, m, k, L, gamma, iters=iters, dtype=dtype, rho=0.03,
        check_every=iters,
    )
    state = init_admm_state(
        B_dev, n, m, k, L, dtype=dtype,
        sX=max(1.0, float(np.abs(A).max())), sT=1.0, rho=0.03,
    )
    A_d = jnp.asarray(A, dtype)
    m_d = jnp.asarray(mask, dtype)

    # NOTE: jax.block_until_ready returns without waiting on the axon
    # remote-TPU platform — every sync below fetches an actual value
    t0 = time.time()
    state, out = solver(A_d, m_d, batch, ub_bar, state)
    _ = np.asarray(out["lb_dev"])
    compile_and_first = time.time() - t0

    n_sub = (B + B_dev - 1) // B_dev
    t0 = time.time()
    for _ in range(n_sub):
        state, out = solver(A_d, m_d, batch, ub_bar, state)
        _ = np.asarray(out["lb_dev"])
    frontier_s = time.time() - t0
    step_s = frontier_s / n_sub

    # selective host certification of the 8 lowest + any near-binding
    # slots, screened by the float64-tracking estimator
    t0 = time.time()
    lb_dev = np.asarray(out["lb_dev"], np.float64)
    lb_est = np.asarray(out.get("lb_est", out["lb_dev"]), np.float64)
    sel = np.argsort(lb_est)[:8]
    sub_batch = NodeBatch(*[np.asarray(x)[sel] for x in batch])
    sub_out = {key: np.asarray(out[key])[sel]
               for key in ("y1", "y2", "ya", "yb", "yc")}
    lb64 = host_certified_bound(A, mask, sub_batch, sub_out, gamma, k, ub_bar)
    certify_s = time.time() - t0

    print(json.dumps({
        "metric": "config4_rank5_250x250_vmapped_frontier_throughput",
        "value": round(B / frontier_s, 2), "unit": "node_relaxations_per_sec",
        "frontier": B, "device_batch": B_dev, "iters_per_step": iters,
        "step_s": round(step_s, 3),
        "frontier_s": round(frontier_s, 3),
        "compile_and_first_step_s": round(compile_and_first, 3),
        "selective_certify_s": round(certify_s, 3),
        "host_certified_min_lb": float(np.min(lb64)),
        "device_min_lb": float(np.min(lb_dev)),
        "backend": jax.default_backend(),
    }), flush=True)


def config5():
    """2-process CPU-simulated multi-host scaling (no multi-host TPU in
    this container; BASELINE config 5's v5p-16 shape is exercised by the
    same code path via jax.distributed).

    Measurement discipline (round-4 verdict item 7): every process is
    PINNED to its own core (the 1-process baseline to core 0; the two
    workers to cores 0 and 1), so the 2-process total is compared against
    a true per-core baseline instead of an oversubscribed shared machine,
    and the per-round collective time is reported separately so the
    efficiency loss decomposes into sync overhead vs compute."""
    here = os.path.dirname(os.path.abspath(__file__))
    worker = os.path.join(here, "dist_scaling_worker.py")

    def run(nproc, cores):
        import socket

        s = socket.socket()
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
        s.close()
        procs = [
            subprocess.Popen(
                [sys.executable, worker, f"localhost:{port}", str(pid),
                 str(nproc), str(cores[pid])],
                stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
            )
            for pid in range(nproc)
        ]
        outs = []
        for p in procs:
            out, err = p.communicate(timeout=900)
            if p.returncode != 0:
                raise RuntimeError(f"worker failed:\n{err[-2000:]}")
            line = [l for l in out.splitlines() if l.startswith("RESULT ")][-1]
            outs.append(json.loads(line[len("RESULT "):]))
        return outs

    n_cores = len(os.sched_getaffinity(0))
    cores2 = [0, 1] if n_cores >= 2 else [0, 0]
    r1 = run(1, [0])[0]  # pinned 1-core baseline
    r2 = run(2, cores2)
    # contention ceiling control: two INDEPENDENT 1-process solves running
    # simultaneously on the same two pinned cores, sharing cache/DRAM but
    # exchanging zero bytes — no 2-process scheme can beat their combined
    # throughput on this machine, so it separates shared-memory-bandwidth
    # loss (present in the control) from sync + search overhead (absent)
    def run_pair_independent():
        procs = [
            subprocess.Popen(
                [sys.executable, worker, "unused:0", "0", "1", str(core)],
                stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
            )
            for core in cores2
        ]
        outs = []
        for p in procs:
            out, err = p.communicate(timeout=900)
            if p.returncode != 0:
                raise RuntimeError(f"solo worker failed:\n{err[-2000:]}")
            line = [l for l in out.splitlines() if l.startswith("RESULT ")][-1]
            outs.append(json.loads(line[len("RESULT "):]))
        return outs

    r_solo2 = run_pair_independent()
    nps1 = r1["nodes_per_sec"]
    nps2 = sum(r["nodes_per_sec_local"] for r in r2)
    nps_ceiling = sum(r["nodes_per_sec_local"] for r in r_solo2)
    eff = (nps2 / 2.0) / nps1 if nps1 > 0 else 0.0
    ceiling_frac = (nps_ceiling / 2.0) / nps1 if nps1 > 0 else 0.0
    sync_s = [r.get("sync_seconds", 0.0) for r in r2]
    elapsed2 = max(r["elapsed"] for r in r2)
    print(json.dumps({
        "metric": "config5_two_process_scaling_pinned_cores",
        "value": round(eff, 3),
        "unit": "fraction_of_linear",
        "pinned_cores": cores2,
        "nodes_per_sec_1proc_pinned": round(nps1, 3),
        "nodes_per_sec_2proc_total": round(nps2, 3),
        # measured hardware ceiling: 2 independent zero-communication
        # solves on the same cores (shared cache/DRAM contention only)
        "nodes_per_sec_2solo_total": round(nps_ceiling, 3),
        "ceiling_fraction_of_linear": round(ceiling_frac, 3),
        "fraction_of_ceiling": round(
            eff / ceiling_frac if ceiling_frac > 0 else 0.0, 3
        ),
        "sync_seconds_per_proc": [round(s, 3) for s in sync_s],
        "sync_fraction_of_wall": round(max(sync_s) / max(elapsed2, 1e-9), 3),
        "objective_1p": r1["objective"],
        "objective_2p": r2[0]["objective"],
        "objectives_match": bool(
            abs(r1["objective"] - r2[0]["objective"])
            <= 1e-6 * max(1.0, abs(r1["objective"]))
        ),
        "backend": "cpu_multiprocess_simulation",
    }), flush=True)


if __name__ == "__main__":
    todo = sys.argv[1:] or ["2", "3", "4", "5"]
    for c in todo:
        {"2": config2, "3": config3, "4": config4, "5": config5}[c]()
