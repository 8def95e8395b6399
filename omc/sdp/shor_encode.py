"""Host-side packing of Shor valid-inequality state into fixed-shape
device tensors (rank-1 path, reference lines 1755-1779).

A node's Shor state is a set of 2x2 minors (i1, i2, j1, j2) plus the
complementary coordinate set that keeps the plain RSOC row
``W_ij >= X_ij^2``.  On device this becomes:

- a (M5, 4) int32 minor table + mask,
- gather tables mapping each minor's five lifted entries to indices into
  per-node flat arrays v1 (entries V1[i, (j1, j2)]), v2 (V2[(i1,i2), j]),
  v3 (V3[(i1,i2), (j1,j2)]) — *shared* across minors exactly as in the
  reference's JuMP model (the same pair-indexed variable appears in every
  minor that references it),
- the RSOC coordinate list + mask,
- per-entry appearance counts for the ADMM z-step diagonal.

All shapes padded to static capacities so one compiled solver serves any
node whose minor count fits the bucket.
"""

from __future__ import annotations

from typing import Dict, List, NamedTuple, Sequence, Tuple

import numpy as np


class ShorBatchHost(NamedTuple):
    """Numpy-side Shor batch (converted to jnp by the caller).

    minor_idx:  (B, M5, 4) int32   (i1, i2, j1, j2), 0-padded
    minor_mask: (B, M5)
    iv1a/iv1b:  (B, M5) int32      index into v1 for V1[i1,.], V1[i2,.]
    iv2a/iv2b:  (B, M5) int32      index into v2 for V2[.,j1], V2[.,j2]
    iv3:        (B, M5) int32      index into v3
    P1, P2, P3: static capacities of the shared v-arrays
    soc_idx:    (B, Ms, 2) int32   RSOC coordinates (i, j)
    soc_mask:   (B, Ms)
    cnt_X:      (B, n, m)          appearances of X_ij in minor+RSOC slots
    cnt_W:      (B, n, m)          appearances of W_ij in minor+RSOC+link
    cnt_v1/v2/v3: (B, P*)          appearances of each shared v entry
    """

    minor_idx: np.ndarray
    minor_mask: np.ndarray
    iv1a: np.ndarray
    iv1b: np.ndarray
    iv2a: np.ndarray
    iv2b: np.ndarray
    iv3: np.ndarray
    soc_idx: np.ndarray
    soc_mask: np.ndarray
    cnt_X: np.ndarray
    cnt_W: np.ndarray
    cnt_v1: np.ndarray
    cnt_v2: np.ndarray
    cnt_v3: np.ndarray


def pack_shor_batch(
    n: int,
    m: int,
    minors_per_node: List[Sequence[Tuple[int, int, int, int]]],
    soc_per_node: List[Sequence[Tuple[int, int]]],
    M5: int,
    Msoc: int,
) -> ShorBatchHost:
    B = len(minors_per_node)
    P1 = 2 * M5
    P2 = 2 * M5
    P3 = M5
    assert Msoc == n * m, "canonical SOC layout requires Msoc == n*m"
    minor_idx = np.zeros((B, M5, 4), dtype=np.int32)
    minor_mask = np.zeros((B, M5), dtype=np.float64)
    iv1a = np.zeros((B, M5), dtype=np.int32)
    iv1b = np.zeros((B, M5), dtype=np.int32)
    iv2a = np.zeros((B, M5), dtype=np.int32)
    iv2b = np.zeros((B, M5), dtype=np.int32)
    iv3 = np.zeros((B, M5), dtype=np.int32)
    soc_idx = np.zeros((B, Msoc, 2), dtype=np.int32)
    soc_mask = np.zeros((B, Msoc), dtype=np.float64)
    cnt_X = np.zeros((B, n, m))
    cnt_W = np.zeros((B, n, m))
    cnt_v1 = np.zeros((B, P1))
    cnt_v2 = np.zeros((B, P2))
    cnt_v3 = np.zeros((B, P3))
    # canonical coordinate table (same for every node): slot s = i*m + j
    coords = np.arange(Msoc, dtype=np.int32)
    soc_idx[:, :, 0] = coords // m
    soc_idx[:, :, 1] = coords % m

    for b in range(B):
        minors = list(minors_per_node[b])
        if len(minors) > M5:
            raise ValueError(f"node has {len(minors)} Shor minors > capacity {M5}")
        v1_map: Dict[Tuple[int, int, int], int] = {}
        v2_map: Dict[Tuple[int, int, int], int] = {}
        v3_map: Dict[Tuple[int, int, int, int], int] = {}

        def get(mapping, key, cap, name):
            if key not in mapping:
                if len(mapping) >= cap:
                    raise ValueError(f"{name} capacity exceeded")
                mapping[key] = len(mapping)
            return mapping[key]

        for l, (i1, i2, j1, j2) in enumerate(minors):
            minor_idx[b, l] = (i1, i2, j1, j2)
            minor_mask[b, l] = 1.0
            iv1a[b, l] = get(v1_map, (i1, j1, j2), P1, "v1")
            iv1b[b, l] = get(v1_map, (i2, j1, j2), P1, "v1")
            iv2a[b, l] = get(v2_map, (i1, i2, j1), P2, "v2")
            iv2b[b, l] = get(v2_map, (i1, i2, j2), P2, "v2")
            iv3[b, l] = get(v3_map, (i1, i2, j1, j2), P3, "v3")
            for (i, j) in ((i1, j1), (i1, j2), (i2, j1), (i2, j2)):
                cnt_X[b, i, j] += 2.0  # (0, c) and (c, 0) slots of the 5x5
                cnt_W[b, i, j] += 1.0  # diagonal slot
            cnt_v1[b, iv1a[b, l]] += 2.0
            cnt_v1[b, iv1b[b, l]] += 2.0
            cnt_v2[b, iv2a[b, l]] += 2.0
            cnt_v2[b, iv2b[b, l]] += 2.0
            cnt_v3[b, iv3[b, l]] += 4.0

        # CANONICAL SOC layout: slot s <-> coordinate (s // m, s % m), so
        # the per-iteration RSOC slot map is a pure reshape (no gathers /
        # scatters over n*m indices — measured ~5 ms/iteration at
        # B=32, n=m=100); membership is carried by the mask alone
        socs = list(soc_per_node[b])
        if Msoc != n * m:
            raise ValueError(
                f"canonical SOC layout requires Msoc == n*m ({n * m}); got {Msoc}"
            )
        for (i, j) in socs:
            soc_mask[b, i * m + j] = 1.0
            cnt_X[b, i, j] += 1.0
            cnt_W[b, i, j] += 1.0

        # W >= 0 slot (reference: @variable W >= 0): +1 on every entry
        cnt_W[b] += 1.0
        # Theta-link rows Theta_jj = sum_i W_ij live in the low-rank part of
        # K'K (see admm.py), not in the diagonal counts.

    return ShorBatchHost(
        minor_idx=minor_idx, minor_mask=minor_mask,
        iv1a=iv1a, iv1b=iv1b, iv2a=iv2a, iv2b=iv2b, iv3=iv3,
        soc_idx=soc_idx, soc_mask=soc_mask,
        cnt_X=cnt_X, cnt_W=cnt_W,
        cnt_v1=cnt_v1, cnt_v2=cnt_v2, cnt_v3=cnt_v3,
    )
