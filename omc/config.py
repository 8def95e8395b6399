"""Solver configuration.

``SolverConfig`` mirrors the 25 keyword arguments of the reference entry
point ``matrix_completion_branchandbound`` 1:1 in names and defaults
(`/root/reference/src/OptimalMatrixCompletion.jl:146-170`), with eager
validation matching reference lines 217-330 (including nulling of
inapplicable knobs before echoing into ``run_details``), plus TPU-specific
additions (batch size, solver iteration budget, dtype, mesh shape).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

_NODE_SELECTIONS = ("breadthfirst", "bestfirst", "depthfirst", "bestfirst_depthfirst")
_CUT_TYPES = ("linear", "linear2", "linear3")
_BREAKPOINTS = ("smallest_1_eigvec", "smallest_2_eigvec")


@dataclasses.dataclass(frozen=True)
class SolverConfig:
    # --- reference-parity knobs (same names & defaults) ---
    node_selection: str = "breadthfirst"
    bestfirst_depthfirst_cutoff: int = 10000
    gap: float = 1e-4
    use_disjunctive_cuts: bool = True
    disjunctive_cuts_type: Optional[str] = None
    disjunctive_cuts_breakpoints: Optional[str] = None
    add_Shor_valid_inequalities: bool = False
    Shor_valid_inequalities_noisy_rank1_num_entries_present: Tuple[int, ...] = (
        1,
        2,
        3,
        4,
    )
    add_Shor_valid_inequalities_fraction: Optional[float] = 1.0
    add_Shor_valid_inequalities_iterative: bool = False
    max_update_Shor_indices_probability: Optional[float] = 1.0
    min_update_Shor_indices_probability: Optional[float] = 0.1
    update_Shor_indices_probability_decay_rate: Optional[float] = 1.1
    update_Shor_indices_n_minors: Optional[int] = 100
    root_only: bool = False
    altmin_flag: bool = True
    max_altmin_probability: Optional[float] = 1.0
    min_altmin_probability: Optional[float] = 0.005
    altmin_probability_decay_rate: Optional[float] = 1.1
    altmin_root_n_iters: int = 1
    use_max_steps: bool = False
    max_steps: int = 1000000
    time_limit: int = 3600
    update_step: int = 1000
    verbosity: int = 1

    # --- TPU-native additions ---
    batch_size: int = 64  # nodes relaxed simultaneously per device step
    sdp_method: str = "admm"  # "admm" (production) | "pdhg" (reference)
    sdp_iters: int = 400  # solver iterations per relaxation super-step
    sdp_omega: float = 3.0  # PDHG primal/dual step balance
    # ADMM penalty parameter; None => size-scaled auto value
    # min(0.025, 62.5 / (n*m)) — equal to the long-standing 0.025 tuning
    # at the 50x50 headline size and scaled down ~1/(n m) for larger
    # problems (measured on rank-1 100x100 Shor: rho 0.00625 reaches in
    # 120 s a bound the 0.025 default had not reached in 600 s)
    sdp_rho: Optional[float] = None
    # the McCormick relaxation (equality orthogonality rows) converges much
    # faster with a large penalty; measured sweep in tests/test_mccormick.py
    sdp_rho_mccormick: float = 10.0
    # ADMM over-relaxation; 1.9 measured ~15% fewer iterations-to-certify
    # than 1.6 on the rank-1 50x50 root (sweep in round-3 notes) and stays
    # within the relaxed-DR stability range (0, 2)
    sdp_alpha: float = 1.9
    # the McCormick path keeps the conservative setting it was tuned at
    sdp_alpha_mccormick: float = 1.6
    # bound refinement: requeue a node (continuing from its own solver
    # state) instead of splitting while its bound is still behind the
    # inherited LB or still moving by more than refine_frac of the
    # remaining local gap, up to max_refines visits
    refine_frac: float = 0.25
    max_refines: int = 12
    # stop refining a node after this many CONSECUTIVE visits whose
    # computed bound stayed below its inherited LB (the solver is
    # oscillating, not catching up; splitting keeps the monotone LB)
    max_behind_refines: int = 3
    # iterative-Shor growth rounds per node at refinement stalls (each
    # growth strengthens the node in place with its top violated minors
    # and RESETS the refinement budget — the strengthened relaxation is a
    # new solve and deserves fresh visits); splitting happens only when
    # growth rounds or fresh violated minors run out
    update_Shor_max_growths: int = 8
    # rho portfolio: on REFINEMENT visits (a node whose first solve did
    # not close it), fill the padded batch slots with REPLICAS of the live
    # nodes running at these multiples of their current ADMM penalty;
    # every replica's certified bound is valid, so the per-node max is
    # taken (sound) and the winning replica's state/penalty carries
    # forward — a parallel line search on the worst ADMM hyperparameter.
    # First visits run solo at the tight batch bucket: device time is
    # ~linear in the bucket size (measured 70/129/219 us/iter at buckets
    # 1/4/8 on 50x50), so replicas are NOT free and only pay off once the
    # base penalty has demonstrably stalled.  () disables.  Slot 0
    # multiplier is implicitly 1.0.
    rho_portfolio: Tuple[float, ...] = (0.25, 4.0, 0.0625)
    sdp_warm_start: bool = True  # warm-start children from parent duals
    # hand CHILD nodes a warm start carrying the parent visit's BEST-CHUNK
    # duals (by the float64-tracking estimator) instead of the final ADMM
    # iterate: the final iterate oscillates with a multi-thousand-
    # iteration period, so a child starting its fresh EMA from the
    # trajectory's best point re-pays fewer catch-up iterations.  Applies
    # to parent->child inheritance ONLY — a node's own refinement
    # re-visits always continue from the exact device-resident iterate
    # (overwriting those duals stalls the contraction; measured 9 -> 418
    # explored nodes on the 50x50 30%-observed headline instance)
    sdp_best_dual_warm: bool = True
    # when the frontier underfills the batch, raise the per-visit iteration
    # budget by up to this factor (padded slots cost the same device time
    # whether or not they carry live nodes, so concentrate it)
    sdp_iter_boost_max: int = 8
    # uniform weight of the equilibrated Shor constraint rows as a POWER
    # of the data scale sX: sS = sX**shor_slot_pow (runtime value — no
    # recompile across settings).  0.0 = pure diagonal rescale (weakest
    # coupling), 1.0 matches the core M1 row's X coupling, 2.0 matches the
    # pre-r5 implicit W coupling.  See omc.sdp.admm.ADMMState.sS.
    shor_slot_pow: float = 1.0
    # on-device certification cadence: inside the jitted ADMM loop the
    # safe dual bound is evaluated every this many iterations and the loop
    # exits as soon as every live node's bound target is cleared (by the
    # float64-tracking estimator; the driver re-certifies in float64)
    sdp_check_every: int = 1000
    # dual-EMA averaging window (iterations): the certified bound is
    # evaluated on an exponential moving average of the scaled duals,
    # decoupled from the check cadence (measured: window 1000 certifies
    # the 50x50 root where 4000 lags and 250 is too noisy)
    sdp_ema_iters: int = 1000
    # cap the duration of a SINGLE device solver execution: the visit
    # budget is split across multiple calls (state stays on device)
    # using the measured per-iteration rate.  A remote-TPU (axon) tunnel
    # kills executions past ~1-2 minutes ("TPU worker crashed"); this
    # also bounds how stale the driver's incumbent/termination state can
    # get during one visit
    sdp_max_call_seconds: float = 20.0
    sdp_first_call_iters: int = 2000  # cap before the rate is known
    # anchored (Halpern / HPR-style) acceleration of the relaxed DR map;
    # opt-in experiment — O(1/k) worst-case fixed-point residual rate, but
    # MEASURED WORSE on the warm-started headline instance (anchoring pulls
    # the iterate back toward the warm start: 59k vs 16k iterations to the
    # same bound on rank-1 50x50); left available for cold-start studies
    sdp_halpern: bool = False
    # at batch buckets above this size, host float64 certification runs
    # only on the binding slots (prune/close candidates + the lowest
    # bounds, which drive the global LB); the rest keep the on-device
    # margin-guarded safe bound (BASELINE config 4 scale: certifying
    # thousands of 250x250 nodes in host float64 would dominate the step)
    host_certify_max_batch: int = 64
    # opt-in jax.profiler trace (SURVEY section 5 "Tracing / profiling"):
    # writes a TensorBoard-compatible device trace of the first
    # ``profile_steps`` super-steps into ``profile_dir``
    profile_dir: Optional[str] = None
    profile_steps: int = 3
    altmin_max_iters: int = 100  # matches reference altmin max_iters (line 2000)
    altmin_tol: float = 1e-5  # matches reference eps (line 1998)
    dtype: str = "float32"  # device compute dtype ("float32" | "float64")
    seed: int = 0  # matches reference Random.seed!(0) at line 333
    mesh_shape: Optional[Tuple[int, ...]] = None  # None => single device
    # multi-host frontier distribution (omc/parallel/dist.py): every host
    # process runs this driver over its own frontier shard with per-round
    # bound sync + periodic node rebalancing.  Requires the jax distributed
    # runtime to be initialised (jax.distributed.initialize / the
    # init_distributed helper).
    distributed: bool = False
    dist_rebalance_every: int = 4  # rounds between rebalancing exchanges
    # carry each migrated node's compressed float32 solver-state slice on
    # the rebalancing wire so it resumes refinement warm on the receiving
    # host (instead of re-paying refinement visits from the incumbent
    # template); costs wire volume proportional to the per-node state
    dist_migrate_state: bool = True
    # checkpoint / resume (absent in the reference; SURVEY.md section 5)
    checkpoint_path: Optional[str] = None
    checkpoint_every: int = 60  # seconds between checkpoint writes
    resume: bool = False  # resume from checkpoint_path if it exists

    def __post_init__(self):
        if self.sdp_method not in ("admm", "pdhg"):
            raise ValueError(
                'Argument `sdp_method` must be "admm" or "pdhg"; '
                f"{self.sdp_method} supplied instead."
            )
        if self.use_disjunctive_cuts:
            if self.disjunctive_cuts_type not in _CUT_TYPES:
                raise ValueError(
                    "Invalid input for disjunctive cuts type. Disjunctive cuts type "
                    'must be either "linear" or "linear2" or "linear3"; '
                    f"{self.disjunctive_cuts_type} supplied instead."
                )
            if self.disjunctive_cuts_breakpoints not in _BREAKPOINTS:
                raise ValueError(
                    "Invalid input for disjunctive cuts breakpoints. Must be either "
                    '"smallest_1_eigvec" or "smallest_2_eigvec"; '
                    f"{self.disjunctive_cuts_breakpoints} supplied instead."
                )
        if not self.use_disjunctive_cuts:
            # null inapplicable knobs before echoing (reference lines 264-330)
            object.__setattr__(self, "disjunctive_cuts_type", None)
            object.__setattr__(self, "disjunctive_cuts_breakpoints", None)
        if self.node_selection not in _NODE_SELECTIONS:
            raise ValueError(
                "Invalid input for node selection. Node selection must be either "
                '"breadthfirst" or "bestfirst" or "depthfirst" or '
                f'"bestfirst_depthfirst"; {self.node_selection} supplied instead.'
            )
        if self.add_Shor_valid_inequalities:
            frac = self.add_Shor_valid_inequalities_fraction
            if frac is None or not (0.0 <= frac <= 1.0):
                raise ValueError(
                    f"Argument `add_Shor_valid_inequalities_fraction` = {frac} out of bounds [0.0, 1.0]."
                )
        else:
            object.__setattr__(self, "add_Shor_valid_inequalities_fraction", None)

        if self.altmin_flag:
            if not (0.0 <= self.max_altmin_probability <= 1.0):
                raise ValueError(
                    f"Argument `max_altmin_probability` = {self.max_altmin_probability} out of bounds [0.0, 1.0]."
                )
            if not (0.0 < self.min_altmin_probability < 1.0):
                raise ValueError(
                    f"Argument `min_altmin_probability` = {self.min_altmin_probability} out of bounds (0.0, 1.0)."
                )
            if not (1.0 < self.altmin_probability_decay_rate):
                raise ValueError(
                    f"Argument `altmin_probability_decay_rate` = {self.altmin_probability_decay_rate} out of bounds (1.0, inf)."
                )
        else:
            object.__setattr__(self, "max_altmin_probability", None)
            object.__setattr__(self, "min_altmin_probability", None)
            object.__setattr__(self, "altmin_probability_decay_rate", None)

        if (
            self.use_disjunctive_cuts
            and self.add_Shor_valid_inequalities
            and self.add_Shor_valid_inequalities_iterative
        ):
            if not (0.0 <= self.max_update_Shor_indices_probability <= 1.0):
                raise ValueError(
                    f"Argument `max_update_Shor_indices_probability` = "
                    f"{self.max_update_Shor_indices_probability} out of bounds [0.0, 1.0]."
                )
            if not (0.0 < self.min_update_Shor_indices_probability < 1.0):
                raise ValueError(
                    f"Argument `min_update_Shor_indices_probability` = "
                    f"{self.min_update_Shor_indices_probability} out of bounds (0.0, 1.0)."
                )
            if not (1.0 < self.update_Shor_indices_probability_decay_rate):
                raise ValueError(
                    f"Argument `update_Shor_indices_probability_decay_rate` = "
                    f"{self.update_Shor_indices_probability_decay_rate} out of bounds (1.0, inf)."
                )
            if not (1 <= self.update_Shor_indices_n_minors):
                raise ValueError(
                    f"Argument `update_Shor_indices_n_minors` = "
                    f"{self.update_Shor_indices_n_minors} out of bounds [1.0, inf)."
                )
        else:
            object.__setattr__(self, "max_update_Shor_indices_probability", None)
            object.__setattr__(self, "min_update_Shor_indices_probability", None)
            object.__setattr__(self, "update_Shor_indices_probability_decay_rate", None)
            object.__setattr__(self, "update_Shor_indices_n_minors", None)

        if isinstance(
            self.Shor_valid_inequalities_noisy_rank1_num_entries_present, list
        ):
            object.__setattr__(
                self,
                "Shor_valid_inequalities_noisy_rank1_num_entries_present",
                tuple(self.Shor_valid_inequalities_noisy_rank1_num_entries_present),
            )

    def run_details_params(self) -> dict:
        """Parameter echo for run_details, matching reference key names
        (reference lines 466-496)."""
        return {
            "node_selection": self.node_selection,
            "bestfirst_depthfirst_cutoff": self.bestfirst_depthfirst_cutoff,
            "optimality_gap": self.gap,
            "root_only": self.root_only,
            "altmin_flag": self.altmin_flag,
            "max_altmin_probability": self.max_altmin_probability,
            "min_altmin_probability": self.min_altmin_probability,
            "altmin_probability_decay_rate": self.altmin_probability_decay_rate,
            "altmin_root_n_iters": self.altmin_root_n_iters,
            "use_max_steps": self.use_max_steps,
            "max_steps": self.max_steps,
            "time_limit": self.time_limit,
            "use_disjunctive_cuts": self.use_disjunctive_cuts,
            "disjunctive_cuts_type": self.disjunctive_cuts_type,
            "disjunctive_cuts_breakpoints": self.disjunctive_cuts_breakpoints,
            "add_Shor_valid_inequalities": self.add_Shor_valid_inequalities,
            "add_Shor_valid_inequalities_fraction": self.add_Shor_valid_inequalities_fraction,
            "add_Shor_valid_inequalities_iterative": self.add_Shor_valid_inequalities_iterative,
            "max_update_Shor_indices_probability": self.max_update_Shor_indices_probability,
            "min_update_Shor_indices_probability": self.min_update_Shor_indices_probability,
            "update_Shor_indices_probability_decay_rate": self.update_Shor_indices_probability_decay_rate,
            "update_Shor_indices_n_minors": self.update_Shor_indices_n_minors,
            "Shor_valid_inequalities_noisy_rank1_num_entries_present": list(
                self.Shor_valid_inequalities_noisy_rank1_num_entries_present
            ),
        }
