#!/usr/bin/env python
"""Generate certified-objective instance fixtures (tests/fixtures/).

Each fixture pins an instance of the reference's synthetic class
(``generate_matrix_completion_data``, same distribution as
`/root/reference/src/utils.jl:68-111` — documented stream deviation at
``omc/data.py``) together with the objective CERTIFIED by this solver in
float64 at a tight gap.  Purpose (VERDICT r3 item 8): future rounds assert
objective EQUALITY against a recorded certificate, not just internal
consistency.  Honesty note: the Julia+Mosek reference is not runnable in
this container (no Julia, no Mosek license), so these certificates are
self-issued — but each is a *certified* optimum (safe dual lower bound
within ``gap`` of an exactly-evaluated rank-k incumbent), so any future
regression that changes the optimum is caught, and a reference cross-check
on matching instances stays possible wherever Julia is available.

Usage: python benchmarks/make_fixtures.py   (CPU, float64; ~minutes)
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np

FIXTURES = [
    # (k, n, m, n_indices, seed, gamma, gap, solver kwargs)
    dict(k=1, n=12, m=12, n_indices=72, seed=3, gamma=80.0, gap=1e-4,
         batch_size=4, sdp_iters=1500, time_limit=600),
    dict(k=1, n=16, m=16, n_indices=128, seed=1, gamma=40.0, gap=1e-4,
         batch_size=8, sdp_iters=1500, time_limit=900),
    dict(k=1, n=20, m=20, n_indices=200, seed=2, gamma=80.0, gap=1e-4,
         batch_size=8, sdp_iters=2000, time_limit=1200),
    # k=2 branches heavily (>1800 nodes at 1e-3 without closing in 900 s
    # on 2 CPU cores); 1e-2 still pins a certified optimum within 1%
    dict(k=2, n=10, m=10, n_indices=70, seed=6, gamma=20.0, gap=1e-2,
         batch_size=8, sdp_iters=1500, time_limit=900),
]


def main():
    from omc.data import generate_matrix_completion_data
    from omc.solve import matrix_completion_branchandbound

    out = []
    for fx in FIXTURES:
        A, idx = generate_matrix_completion_data(
            fx["k"], fx["n"], fx["m"], fx["n_indices"], fx["seed"]
        )
        sol, _, inst = matrix_completion_branchandbound(
            fx["k"], A, idx, fx["gamma"],
            node_selection="bestfirst",
            disjunctive_cuts_type="linear",
            disjunctive_cuts_breakpoints="smallest_1_eigvec",
            gap=fx["gap"], batch_size=fx["batch_size"],
            sdp_iters=fx["sdp_iters"], dtype="float64",
            time_limit=fx["time_limit"], verbosity=0,
        )
        log = inst["run_log"][-1]
        rec = {
            "k": fx["k"], "n": fx["n"], "m": fx["m"],
            "n_indices": fx["n_indices"], "seed": fx["seed"],
            "gamma": fx["gamma"],
            "certified_objective": float(sol["objective"]),
            "certified_lower_bound": float(log["lower"]),
            "certified_gap": float(log["gap"]),
            "gap_target": fx["gap"],
            "nodes_explored": int(inst["run_details"]["nodes_explored"]),
        }
        assert rec["certified_gap"] <= fx["gap"], rec
        print(json.dumps(rec), flush=True)
        out.append(rec)
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "tests", "fixtures", "instances.json",
    )
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1)
    print("wrote", path)


if __name__ == "__main__":
    main()
