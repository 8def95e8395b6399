"""omc — TPU-native certifiably-optimal low-rank matrix completion.

A brand-new JAX/XLA/Pallas framework with the capabilities of the Julia
reference ``sean-lo/OptimalMatrixCompletion.jl`` (branch-and-bound with
eigenvector disjunctive cuts over a lifted SDP relaxation), re-designed
TPU-first: branch-and-bound nodes are fixed-shape array data, the per-node
SDP relaxation is one jitted batched first-order conic solver (PDHG with
batched-``eigh`` PSD projections) vmapped over the live frontier, and lower
bounds are certified via closed-form safe Lagrangian dual bounds rather
than an interior-point solver's termination status.

Public API mirrors the 10 exported symbols of the reference
(`/root/reference/src/OptimalMatrixCompletion.jl:21-31`).
"""

from omc.problem import (
    evaluate_objective,
    compute_SDP_relaxation_objective,
    compute_MSE,
)
from omc.data import (
    generate_matrix_completion_data,
    generate_masked_bitmatrix,
    generate_sparse_masked_bitmatrix,
)
from omc.config import SolverConfig
from omc.tree import BBNode, BBTree, DisjunctiveCut, ShorInfo

# exact-name aliases for the reference's exported node-state types
# (`src/OptimalMatrixCompletion.jl:30-31`); the native names describe one
# cut / one Shor record rather than the reference's whole-list containers
BBNodeDisjunctiveCuts = DisjunctiveCut
BBNodeShorInfo = ShorInfo
from omc.solve import matrix_completion_branchandbound
from omc.api import alternating_minimization, matrix_completion_SDP_relaxation
from omc.sdp.shor import generate_rank1_matrix_completion_Shor_constraints_indexes

__all__ = [
    "matrix_completion_branchandbound",
    "alternating_minimization",
    "matrix_completion_SDP_relaxation",
    "evaluate_objective",
    "compute_SDP_relaxation_objective",
    "compute_MSE",
    "SolverConfig",
    "BBNode",
    "BBTree",
    "DisjunctiveCut",
    "ShorInfo",
    "BBNodeDisjunctiveCuts",
    "BBNodeShorInfo",
    "generate_matrix_completion_data",
    "generate_masked_bitmatrix",
    "generate_sparse_masked_bitmatrix",
    "generate_rank1_matrix_completion_Shor_constraints_indexes",
]

__version__ = "0.1.0"
