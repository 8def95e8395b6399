"""Worker process for the multi-host CPU simulation test.

Usage: python dist_worker.py <coordinator> <process_id> <num_processes>

Forces the CPU backend (the test machine's TPU tunnel must not be touched),
joins the jax distributed runtime over TCP, runs the distributed
branch-and-bound driver on the shared instance, and prints one RESULT line.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)


def main():
    coord, pid, nproc = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])
    mode = sys.argv[4] if len(sys.argv) > 4 else "plain"
    jax.distributed.initialize(
        coordinator_address=coord, num_processes=nproc, process_id=pid
    )
    from omc.data import generate_matrix_completion_data
    from omc.solve import matrix_completion_branchandbound

    A, idx = generate_matrix_completion_data(1, 10, 10, 60, seed=2)
    kwargs = dict(
        node_selection="bestfirst",
        disjunctive_cuts_type="linear",
        disjunctive_cuts_breakpoints="smallest_1_eigvec",
        gap=1e-2, batch_size=4, sdp_iters=600, dtype="float64",
        time_limit=150, verbosity=0,
        distributed=True, dist_rebalance_every=2,
    )
    if mode == "shor":
        # iterative Shor: minor sets grow at tree nodes and must migrate
        # with them (omc/parallel/dist.py wire format)
        kwargs.update(
            add_Shor_valid_inequalities=True,
            add_Shor_valid_inequalities_iterative=True,
            Shor_valid_inequalities_noisy_rank1_num_entries_present=[4],
            update_Shor_indices_n_minors=10,
            sdp_iters=500,
        )
    elif mode == "coldmigrate":
        # ablation: rebalanced nodes restart from the incumbent template
        # (the pre-r4 behaviour) — the warm-migration test compares
        # refinement totals against this baseline
        kwargs.update(dist_migrate_state=False)
    sol, _, inst = matrix_completion_branchandbound(1, A, idx, 20.0, **kwargs)
    rd = inst["run_details"]
    print("RESULT " + json.dumps({
        "pid": pid,
        "objective": sol["objective"],
        "gap": inst["run_log"][-1]["gap"],
        "nodes_explored_local": rd["nodes_explored"],
        "nodes_explored_global": rd["census_global"]["nodes_explored"],
        "refinement_visits_local": rd["refinement_visits"],
        "refinement_visits_global": rd["census_global"]["refinement_visits"],
        "process_count": rd["process_count"],
    }), flush=True)


if __name__ == "__main__":
    main()
