"""Shor valid-inequality index machinery (host side).

Mirrors the reference's combinatorial enumeration of 2x2 minors classified
by the number of observed entries
(``generate_rank1_matrix_completion_Shor_constraints_indexes``, reference
lines 2545-2612) and the violated-minor scoring / top-N selection
(``generate_violated_Shor_minors``, lines 2614-2640).  The scoring is
vectorised numpy (the reference loops in Julia); the conic Shor blocks
themselves (5x5 PSD minors, RSOC rows) live in the batched relaxation.
"""

from __future__ import annotations

import itertools
from typing import List, Sequence, Tuple

import numpy as np

Minor = Tuple[int, int, int, int]


def generate_rank1_matrix_completion_Shor_constraints_indexes(
    indices: np.ndarray, num_entries_present_list: Sequence[int]
) -> List[Minor]:
    """All 2x2 minors (i1, i2, j1, j2), i1<i2, j1<j2, whose number of
    observed entries is in ``num_entries_present_list``.

    Indices are 0-based (the reference is 1-based Julia)."""
    indices = np.asarray(indices, dtype=bool)
    n, m = indices.shape
    out: List[Minor] = []
    for num in num_entries_present_list:
        for i1, i2 in itertools.combinations(range(n), 2):
            r1, r2 = indices[i1], indices[i2]
            both = np.flatnonzero(r1 & r2)
            xor = np.flatnonzero(r1 ^ r2)
            neither = np.flatnonzero(~(r1 | r2))
            if num == 4:
                for j1, j2 in itertools.combinations(both.tolist(), 2):
                    out.append((i1, i2, j1, j2))
            elif num == 3:
                for j1 in both.tolist():
                    for j2 in xor.tolist():
                        a, b = (j1, j2) if j1 < j2 else (j2, j1)
                        out.append((i1, i2, a, b))
            elif num == 2:
                # (a) one fully-observed column + one fully-unobserved column
                for j1 in both.tolist():
                    for j2 in neither.tolist():
                        a, b = (j1, j2) if j1 < j2 else (j2, j1)
                        out.append((i1, i2, a, b))
                # (b) two half-observed columns
                for j1, j2 in itertools.combinations(xor.tolist(), 2):
                    out.append((i1, i2, j1, j2))
            elif num == 1:
                for j1 in xor.tolist():
                    for j2 in neither.tolist():
                        a, b = (j1, j2) if j1 < j2 else (j2, j1)
                        out.append((i1, i2, a, b))
            elif num == 0:
                for j1, j2 in itertools.combinations(neither.tolist(), 2):
                    out.append((i1, i2, j1, j2))
    return out


def generate_violated_Shor_minors(
    X: np.ndarray,
    indices: np.ndarray,
    num_entries_present_list: Sequence[int],
    existing: Sequence[Minor],
    n_minors: int,
) -> List[Tuple[float, Minor]]:
    """Top-``n_minors`` minors by determinant-violation score
    ``sum_t |X_t[i1,j1] X_t[i2,j2] - X_t[i1,j2] X_t[i2,j1]|``
    among candidates not already active (reference lines 2614-2640).

    ``X``: (k, n, m) (the per-term split of X; (n, m) inputs are promoted).
    """
    X = np.asarray(X, dtype=np.float64)
    if X.ndim == 2:
        X = X[None]
    cand = generate_rank1_matrix_completion_Shor_constraints_indexes(
        indices, num_entries_present_list
    )
    existing_set = set(existing)
    cand = [c for c in cand if c not in existing_set]
    if not cand:
        return []
    idx = np.asarray(cand, dtype=np.int64)  # (M, 4)
    i1, i2, j1, j2 = idx[:, 0], idx[:, 1], idx[:, 2], idx[:, 3]
    score = np.sum(
        np.abs(X[:, i1, j1] * X[:, i2, j2] - X[:, i1, j2] * X[:, i2, j1]), axis=0
    )
    order = np.argsort(-score, kind="stable")[:n_minors]
    return [(float(score[o]), cand[o]) for o in order]


def shor_soc_complement(n: int, m: int, minors: Sequence[Minor]) -> List[Tuple[int, int]]:
    """Coordinates (i, j) NOT covered by any active minor — these keep the
    plain RSOC constraint W_ij >= X_ij^2 (reference lines 656-665)."""
    covered = set()
    for (i1, i2, j1, j2) in minors:
        covered.update({(i1, j1), (i1, j2), (i2, j1), (i2, j2)})
    return [(i, j) for i in range(n) for j in range(m) if (i, j) not in covered]
