"""Batched ADMM node relaxation with Shor valid inequalities, k > 1 path.

Implements the reference's rank-k Shor strengthening
(`/root/reference/src/OptimalMatrixCompletion.jl:1491-1551` variables,
`:1781-1828` constraints, `:1837-1846` W-form objective):

- ``X`` splits into per-term variables ``Xt`` (k, n, m) with
  ``X = sum_t Xt`` (reference line 1492-1494),
- per active minor (i1, i2, j1, j2) and per term t, a 5x5 PSD block on
  ``[1, Xt_11, Xt_12, Xt_21, Xt_22]`` against ``Wt``/``V1``/``V2``/``V3``
  entries (lines 1797-1809),
- per minor *coordinate* (i, j), a (k+1)x(k+1) ``XWH`` PSD block
  ``[[1, Xt'], [Xt, M]]`` with ``M_tt = Wt[t]``, ``M_t1t2 = H[(t1,t2)]``
  (lines 1810-1826),
- linkage ``W_ij = sum_t Wt + 2 sum_{t1<t2} H`` on minor coordinates
  (lines 1788-1791), rotated SOC ``W_ij >= X_ij^2`` on the complement
  (lines 1781-1786), and ``Theta_jj = sum_i W_ij`` (lines 1792-1796).

TPU-native design: all Shor state is coordinate-indexed padded tensors
(capacity C = 4*M5 unique minor coordinates); the z-step stays closed-form:

- the X-block of K'K is, per matrix entry, ``D I_k + c J_k`` (the M1 slot
  and RSOC rows couple all k terms identically through ``X = sum_t Xt``,
  while the 5x5 / XWH slots are term-diagonal) — inverted by the
  Sherman-Morrison identity per entry, no factorisation;
- the Theta-link and W-link rows form a Woodbury block whose Gram is
  *diagonal after a diagonal Schur complement* (link rows overlap only on
  single W entries), so the whole correction is gather/scatter work.

Certification mirrors ``omc.sdp.admm_shor.host_certified_bound_shor`` with
kept sets ``|Xt| <= R_X``, ``Wt in [0, 2 gamma ub]``, ``|H| <= 2 gamma ub``
(valid: master points have ``Xt = U_t v_t'`` with ``|Xt_ij| <= ||v_t|| <=
sqrt(2 gamma ub)``, ``Wt = Xt^2``, ``H = Xt1 Xt2`` entrywise).
"""

from __future__ import annotations

from typing import Dict, List, NamedTuple, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from omc.ops.cones import project_psd, project_rsoc, project_soc
from omc.ops.polar import project_psd_ns, project_psd_ns_small
from omc.sdp.admm import (
    _HI,
    _V_apply,
    _Vt_apply,
    _adjoint,
    _forward,
    _gram1,
    ADMMState as ADMMStateCore,
    init_admm_state,
)
from omc.sdp.relax import NodeBatch, margin_rel_default


# ---------------------------------------------------------------------------
# Host-side packing
# ---------------------------------------------------------------------------


class ShorKBatchHost(NamedTuple):
    """Numpy-side rank-k Shor batch.

    minor_idx:   (B, M5, 4) int32  (i1, i2, j1, j2)
    minor_mask:  (B, M5)
    mc:          (B, M5, 4) int32  coordinate index (into the C axis) of the
                 minor's four corners, order (i1,j1), (i1,j2), (i2,j1), (i2,j2)
    coord_flat:  (B, C) int32      flat i*m+j of each unique minor coordinate
    coord_j:     (B, C) int32      column j of each coordinate
    coord_mask:  (B, C)
    coord_minor_cnt: (B, C)        minors containing each coordinate
    iv1a/iv1b/iv2a/iv2b/iv3: (B, M5) int32  shared V-array gather tables
    soc_flat:    (B, Ms) int32     flat coords of the RSOC complement rows
    soc_mask:    (B, Ms)
    cnt_minor:   (B, n, m)         minors containing each matrix entry
    is_coord:    (B, n, m)         1.0 on minor coordinates
    is_soc:      (B, n, m)         1.0 on RSOC complement coordinates
    cnt_v1/v2/v3: (B, P*)          K'K diagonal counts of the shared V arrays
    """

    minor_idx: np.ndarray
    minor_mask: np.ndarray
    mc: np.ndarray
    coord_flat: np.ndarray
    coord_j: np.ndarray
    coord_mask: np.ndarray
    coord_minor_cnt: np.ndarray
    iv1a: np.ndarray
    iv1b: np.ndarray
    iv2a: np.ndarray
    iv2b: np.ndarray
    iv3: np.ndarray
    soc_flat: np.ndarray
    soc_mask: np.ndarray
    cnt_minor: np.ndarray
    is_coord: np.ndarray
    is_soc: np.ndarray
    cnt_v1: np.ndarray
    cnt_v2: np.ndarray
    cnt_v3: np.ndarray


class ShorKBatch(NamedTuple):
    minor_idx: jnp.ndarray
    minor_mask: jnp.ndarray
    mc: jnp.ndarray
    coord_flat: jnp.ndarray
    coord_j: jnp.ndarray
    coord_mask: jnp.ndarray
    coord_minor_cnt: jnp.ndarray
    iv1a: jnp.ndarray
    iv1b: jnp.ndarray
    iv2a: jnp.ndarray
    iv2b: jnp.ndarray
    iv3: jnp.ndarray
    soc_flat: jnp.ndarray
    soc_mask: jnp.ndarray
    cnt_minor: jnp.ndarray
    is_coord: jnp.ndarray
    is_soc: jnp.ndarray
    cnt_v1: jnp.ndarray
    cnt_v2: jnp.ndarray
    cnt_v3: jnp.ndarray


def shor_k_batch_to_device(h: ShorKBatchHost, dtype) -> ShorKBatch:
    f = lambda a: jnp.asarray(a, dtype=dtype)
    i = lambda a: jnp.asarray(a, dtype=jnp.int32)
    return ShorKBatch(
        minor_idx=i(h.minor_idx), minor_mask=f(h.minor_mask), mc=i(h.mc),
        coord_flat=i(h.coord_flat), coord_j=i(h.coord_j),
        coord_mask=f(h.coord_mask), coord_minor_cnt=f(h.coord_minor_cnt),
        iv1a=i(h.iv1a), iv1b=i(h.iv1b), iv2a=i(h.iv2a), iv2b=i(h.iv2b),
        iv3=i(h.iv3), soc_flat=i(h.soc_flat), soc_mask=f(h.soc_mask),
        cnt_minor=f(h.cnt_minor), is_coord=f(h.is_coord), is_soc=f(h.is_soc),
        cnt_v1=f(h.cnt_v1), cnt_v2=f(h.cnt_v2), cnt_v3=f(h.cnt_v3),
    )


def pack_shor_k_batch(
    n: int,
    m: int,
    minors_per_node: List[Sequence[Tuple[int, int, int, int]]],
    soc_per_node: List[Sequence[Tuple[int, int]]],
    M5: int,
    Msoc: int,
) -> ShorKBatchHost:
    B = len(minors_per_node)
    C = 4 * M5
    P1 = P2 = 2 * M5
    P3 = M5
    minor_idx = np.zeros((B, M5, 4), dtype=np.int32)
    minor_mask = np.zeros((B, M5))
    mc = np.zeros((B, M5, 4), dtype=np.int32)
    coord_flat = np.zeros((B, C), dtype=np.int32)
    coord_j = np.zeros((B, C), dtype=np.int32)
    coord_mask = np.zeros((B, C))
    coord_minor_cnt = np.zeros((B, C))
    iv1a = np.zeros((B, M5), dtype=np.int32)
    iv1b = np.zeros((B, M5), dtype=np.int32)
    iv2a = np.zeros((B, M5), dtype=np.int32)
    iv2b = np.zeros((B, M5), dtype=np.int32)
    iv3 = np.zeros((B, M5), dtype=np.int32)
    soc_flat = np.zeros((B, Msoc), dtype=np.int32)
    soc_mask = np.zeros((B, Msoc))
    cnt_minor = np.zeros((B, n, m))
    is_coord = np.zeros((B, n, m))
    is_soc = np.zeros((B, n, m))
    cnt_v1 = np.zeros((B, P1))
    cnt_v2 = np.zeros((B, P2))
    cnt_v3 = np.zeros((B, P3))

    for b in range(B):
        minors = list(minors_per_node[b])
        if len(minors) > M5:
            raise ValueError(f"node has {len(minors)} Shor minors > capacity {M5}")
        cmap: Dict[Tuple[int, int], int] = {}
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
            for corner, (i, j) in enumerate(((i1, j1), (i1, j2), (i2, j1), (i2, j2))):
                ci = get(cmap, (i, j), C, "coord")
                mc[b, l, corner] = ci
                coord_flat[b, ci] = i * m + j
                coord_j[b, ci] = j
                coord_mask[b, ci] = 1.0
                coord_minor_cnt[b, ci] += 1.0
                cnt_minor[b, i, j] += 1.0
                is_coord[b, i, j] = 1.0
            iv1a[b, l] = get(v1_map, (i1, j1, j2), P1, "v1")
            iv1b[b, l] = get(v1_map, (i2, j1, j2), P1, "v1")
            iv2a[b, l] = get(v2_map, (i1, i2, j1), P2, "v2")
            iv2b[b, l] = get(v2_map, (i1, i2, j2), P2, "v2")
            iv3[b, l] = get(v3_map, (i1, i2, j1, j2), P3, "v3")
            cnt_v1[b, iv1a[b, l]] += 2.0
            cnt_v1[b, iv1b[b, l]] += 2.0
            cnt_v2[b, iv2a[b, l]] += 2.0
            cnt_v2[b, iv2b[b, l]] += 2.0
            cnt_v3[b, iv3[b, l]] += 4.0

        socs = list(soc_per_node[b])
        if len(socs) > Msoc:
            raise ValueError(f"node has {len(socs)} RSOC rows > capacity {Msoc}")
        for s, (i, j) in enumerate(socs):
            soc_flat[b, s] = i * m + j
            soc_mask[b, s] = 1.0
            is_soc[b, i, j] = 1.0

    return ShorKBatchHost(
        minor_idx=minor_idx, minor_mask=minor_mask, mc=mc,
        coord_flat=coord_flat, coord_j=coord_j, coord_mask=coord_mask,
        coord_minor_cnt=coord_minor_cnt,
        iv1a=iv1a, iv1b=iv1b, iv2a=iv2a, iv2b=iv2b, iv3=iv3,
        soc_flat=soc_flat, soc_mask=soc_mask,
        cnt_minor=cnt_minor, is_coord=is_coord, is_soc=is_soc,
        cnt_v1=cnt_v1, cnt_v2=cnt_v2, cnt_v3=cnt_v3,
    )


# ---------------------------------------------------------------------------
# Solver state
# ---------------------------------------------------------------------------


class ShorKState(NamedTuple):
    core: ADMMStateCore  # core cones; core.X holds sum_t Xt (for outputs)
    Xt: jnp.ndarray  # (B, k, n, m) scaled by sX
    W: jnp.ndarray  # (B, n, m) scaled by sW
    Wt: jnp.ndarray  # (B, k, C) scaled
    Hh: jnp.ndarray  # (B, kp, C) scaled
    v1: jnp.ndarray  # (B, k, P1)
    v2: jnp.ndarray  # (B, k, P2)
    v3: jnp.ndarray  # (B, k, P3)
    w5: jnp.ndarray  # (B, M5, k, 5, 5)
    u5: jnp.ndarray
    wx: jnp.ndarray  # (B, C, k+1, k+1)
    ux: jnp.ndarray
    wr: jnp.ndarray  # (B, Ms, 3)
    ur: jnp.ndarray
    wl: jnp.ndarray  # (B, m)  Theta-link (zero cone)
    ul: jnp.ndarray
    wwl: jnp.ndarray  # (B, C)  W-link (zero cone)
    uwl: jnp.ndarray
    wp: jnp.ndarray  # (B, n, m)  W >= 0
    up: jnp.ndarray
    wq: jnp.ndarray  # (B, k, C)  Wt >= 0
    uq: jnp.ndarray


def init_shor_k_state(B, n, m, k, L, M5, Ms, dtype=jnp.float32, *, sX=1.0,
                      sT=1.0, sS=1.0, rho=0.02, X0=None, Y0=None, Th0=None,
                      U0=None) -> ShorKState:
    C = 4 * M5
    P1 = P2 = 2 * M5
    P3 = M5
    kp = (k * (k - 1)) // 2
    z = lambda *s: jnp.zeros(s, dtype=dtype)
    core = init_admm_state(B, n, m, k, L, dtype, sX=sX, sT=sT, sS=sS,
                           rho=rho, X0=X0, Y0=Y0, Th0=Th0, U0=U0)
    Xt0 = z(B, k, n, m)
    if X0 is not None:
        # split the warm primal evenly across terms (any split with the
        # right sum is feasible for the core cones)
        s = jnp.asarray(sX, dtype)
        if s.ndim:  # (B,) per-slot scales -> (B, 1, 1, 1)
            s = s.reshape(s.shape + (1,) * (4 - s.ndim))
        Xt0 = jnp.broadcast_to(
            jnp.asarray(X0, dtype)[:, None] / (s * k), (B, k, n, m)
        )
    return ShorKState(
        core=core, Xt=Xt0, W=z(B, n, m), Wt=z(B, k, C), Hh=z(B, kp, C),
        v1=z(B, k, P1), v2=z(B, k, P2), v3=z(B, k, P3),
        w5=z(B, M5, k, 5, 5), u5=z(B, M5, k, 5, 5),
        wx=z(B, C, k + 1, k + 1), ux=z(B, C, k + 1, k + 1),
        wr=z(B, Ms, 3), ur=z(B, Ms, 3), wl=z(B, m), ul=z(B, m),
        wwl=z(B, C), uwl=z(B, C), wp=z(B, n, m), up=z(B, n, m),
        wq=z(B, k, C), uq=z(B, k, C),
    )


# ---------------------------------------------------------------------------
# Forward / adjoint of the Shor-k slots
# ---------------------------------------------------------------------------


def _gather_bk(flat_bk, idx_b):
    """flat_bk (B, k, N), idx_b (B, M) -> (B, k, M)."""
    B, k, N = flat_bk.shape
    M = idx_b.shape[1]
    idx = jnp.broadcast_to(idx_b[:, None, :], (B, k, M))
    return jnp.take_along_axis(flat_bk, idx, axis=2)


def _scatter_add_bk(target, idx_b, val_bkM):
    """Accumulate val (B, k, M) into target (B, k, N) at idx (B, M)."""
    B, k, N = target.shape
    M = idx_b.shape[1]
    idx = jnp.broadcast_to(idx_b[:, None, :], (B, k, M))
    return target.at[
        jnp.arange(B)[:, None, None], jnp.arange(k)[None, :, None], idx
    ].add(val_bkM)


def _pair_indices(k: int):
    t1s, t2s = [], []
    for a in range(k):
        for b in range(a + 1, k):
            t1s.append(a)
            t2s.append(b)
    return t1s, t2s


def _forward_shor_k(sb: ShorKBatch, Xt_s, Ws, Wts, Hs, v1s, v2s, v3s,
                    k: int, m: int, sX, sW, sS=1.0):
    """Slot values: w5 (B,M5,k,5,5), wx (B,C,k+1,k+1), wr (B,Ms,3),
    wcol (B,m) = sum_i W_ij, wwl (B,C)."""
    B = Xt_s.shape[0]
    M5 = sb.minor_mask.shape[1]
    C = sb.coord_mask.shape[1]
    # per-slot (B,) runtime scales (or python scalars in tests)
    sW = jnp.reshape(jnp.asarray(sW, Xt_s.dtype), (-1,))
    s3w = sW[:, None, None]
    sS = jnp.reshape(jnp.asarray(sS, Xt_s.dtype), (-1,))
    # DIAGONAL RESCALING (round-4 verdict item 1, k > 1 path): the 5x5
    # minor and (k+1)x(k+1) XWH slots are D M D with
    # D = diag(1, 1/sX, ...), i.e. built from the SCALED variables
    # Xts = Xt/sX, Wts = Wt/sX^2, Hs = H/sX^2 — O(1) entries for the f32
    # PSD projection.  RSOC rows use (0.5, Ws, sum_t Xts) (same cone) and
    # the W-link row is divided by sW (coefficients +1/-1/-2 on scaled
    # variables).  Only the Theta-link row stays on raw variables.
    Xf = Xt_s.reshape(B, k, -1)  # (B, k, n*m), scaled
    corner_flat = jnp.take_along_axis(sb.coord_flat, sb.mc.reshape(B, -1), axis=1)
    corner_flat = corner_flat.reshape(B, M5, 4)

    xs = [_gather_bk(Xf, corner_flat[..., c]) for c in range(4)]  # 4 x (B,k,M5)
    ws = [
        _gather_bk(Wts, sb.mc[..., c]) for c in range(4)
    ]  # Wt at the corner coords (scaled)
    V1a = _gather_bk(v1s, sb.iv1a)
    V1b = _gather_bk(v1s, sb.iv1b)
    V2a = _gather_bk(v2s, sb.iv2a)
    V2b = _gather_bk(v2s, sb.iv2b)
    V3 = _gather_bk(v3s, sb.iv3)
    one = jnp.ones_like(xs[0])
    x11, x12, x21, x22 = xs
    w11, w12, w21, w22 = ws
    rows = [
        [one, x11, x12, x21, x22],
        [x11, w11, V1a, V2a, V3],
        [x12, V1a, w12, V3, V2b],
        [x21, V2a, V3, w21, V1b],
        [x22, V3, V2b, V1b, w22],
    ]
    w5 = jnp.stack([jnp.stack(r, axis=-1) for r in rows], axis=-2)
    w5 = sS[:, None, None, None, None] * jnp.moveaxis(
        w5, 1, 2
    )  # (B, k, M5, 5, 5) -> (B, M5, k, 5, 5)

    # XWH block per coordinate
    Xc = _gather_bk(Xf, sb.coord_flat)  # (B, k, C)
    Xc = jnp.swapaxes(Xc, 1, 2)  # (B, C, k)
    Wc = jnp.swapaxes(Wts, 1, 2)  # (B, C, k), scaled
    kp = Hs.shape[1]
    wx = jnp.zeros((B, C, k + 1, k + 1), dtype=Xt_s.dtype)
    wx = wx.at[..., 0, 0].set(1.0)
    wx = wx.at[..., 0, 1:].set(Xc)
    wx = wx.at[..., 1:, 0].set(Xc)
    tt = jnp.arange(k)
    wx = wx.at[..., tt + 1, tt + 1].set(Wc)
    if kp:
        t1s, t2s = _pair_indices(k)
        Hc = jnp.swapaxes(Hs, 1, 2)  # (B, C, kp), scaled
        t1a = jnp.asarray(t1s)
        t2a = jnp.asarray(t2s)
        wx = wx.at[..., t1a + 1, t2a + 1].set(Hc)
        wx = wx.at[..., t2a + 1, t1a + 1].set(Hc)

    wx = sS[:, None, None, None] * wx
    # RSOC rows on the complement: (0.5, W, X) with X = sum_t Xt
    Xsum = jnp.sum(Xf, axis=1)  # (B, n*m), scaled
    Wf = Ws.reshape(B, -1)  # scaled
    wr = sS[:, None, None] * jnp.stack(
        [
            0.5 * jnp.ones(sb.soc_flat.shape, Xt_s.dtype),
            jnp.take_along_axis(Wf, sb.soc_flat, axis=1),
            jnp.take_along_axis(Xsum, sb.soc_flat, axis=1),
        ],
        axis=-1,
    )
    wcol = jnp.sum(s3w * Ws, axis=-2)  # (B, m): Theta-link, RAW scale
    # W-link (scaled by sS/sW): Ws_c - sum_t Wts - 2 sum_p Hs
    Wat = jnp.take_along_axis(Wf, sb.coord_flat, axis=1)  # (B, C)
    wwl = sS[:, None] * (
        Wat - jnp.sum(Wts, axis=1) - 2.0 * jnp.sum(Hs, axis=1)
    ) * sb.coord_mask
    return w5, wx, wr, wcol, wwl


def _adjoint_shor_k(sb: ShorKBatch, y5, yx, yr, yl, ywl, B, n, m, k, kp,
                    sX, sW, sS=1.0):
    """Adjoint: duals -> gradients on (Xt_s, Ws, Wts, Hs, v1s, v2s, v3s).
    The Theta-diagonal contribution of yl is added by the caller."""
    M5 = sb.minor_mask.shape[1]
    C = sb.coord_mask.shape[1]
    # per-slot (B,) runtime scales; minor/XWH/RSOC/W-link rows are on the
    # SCALED variables (coefficient 1.0 — see _forward_shor_k), only the
    # Theta-link row keeps the raw coefficient -sW on W
    sW = jnp.reshape(jnp.asarray(sW, y5.dtype), (-1,))
    s3w = sW[:, None, None]
    sS = jnp.reshape(jnp.asarray(sS, y5.dtype), (-1,))
    y5 = sS[:, None, None, None, None] * y5
    yx = sS[:, None, None, None] * yx
    yr = sS[:, None, None] * yr
    ywl = sS[:, None] * ywl
    y5 = y5 * sb.minor_mask[..., None, None, None]
    yx = yx * sb.coord_mask[..., None, None]
    yr = yr * sb.soc_mask[..., None]
    ywl = ywl * sb.coord_mask

    y5k = jnp.moveaxis(y5, 2, 1)  # (B, k, M5, 5, 5)
    corner_flat = jnp.take_along_axis(sb.coord_flat, sb.mc.reshape(B, -1), axis=1)
    corner_flat = corner_flat.reshape(B, M5, 4)

    gXt = jnp.zeros((B, k, n * m), dtype=y5.dtype)
    gWt = jnp.zeros((B, k, C), dtype=y5.dtype)
    for c in range(4):
        gXt = _scatter_add_bk(gXt, corner_flat[..., c],
                              2.0 * y5k[..., 0, c + 1])
        gWt = _scatter_add_bk(gWt, sb.mc[..., c],
                              y5k[..., c + 1, c + 1])
    gv1 = jnp.zeros((B, k, sb.cnt_v1.shape[1]), dtype=y5.dtype)
    gv2 = jnp.zeros((B, k, sb.cnt_v2.shape[1]), dtype=y5.dtype)
    gv3 = jnp.zeros((B, k, sb.cnt_v3.shape[1]), dtype=y5.dtype)
    gv1 = _scatter_add_bk(gv1, sb.iv1a, 2.0 * y5k[..., 1, 2])
    gv1 = _scatter_add_bk(gv1, sb.iv1b, 2.0 * y5k[..., 3, 4])
    gv2 = _scatter_add_bk(gv2, sb.iv2a, 2.0 * y5k[..., 1, 3])
    gv2 = _scatter_add_bk(gv2, sb.iv2b, 2.0 * y5k[..., 2, 4])
    gv3 = _scatter_add_bk(gv3, sb.iv3,
                          2.0 * (y5k[..., 1, 4] + y5k[..., 2, 3]))

    # XWH adjoint
    gXc = 2.0 * yx[..., 0, 1:]  # (B, C, k)
    gXt = _scatter_add_bk(gXt, sb.coord_flat, jnp.swapaxes(gXc, 1, 2))
    tt = jnp.arange(k)
    gWt = gWt + jnp.swapaxes(yx[..., tt + 1, tt + 1], 1, 2)
    gH = jnp.zeros((B, kp, C), dtype=y5.dtype)
    if kp:
        t1s, t2s = _pair_indices(k)
        t1a = jnp.asarray(t1s)
        t2a = jnp.asarray(t2s)
        gHc = yx[..., t1a + 1, t2a + 1] + yx[..., t2a + 1, t1a + 1]
        gH = jnp.swapaxes(gHc, 1, 2)

    # RSOC rows: the X slot is sum_t Xt, so the gradient lands on every term
    gWf = jnp.zeros((B, n * m), dtype=y5.dtype)
    bidx = jnp.arange(B)[:, None]
    gWf = gWf.at[bidx, sb.soc_flat].add(yr[..., 1])
    gXt = _scatter_add_bk(
        gXt, sb.soc_flat,
        jnp.broadcast_to(yr[..., 2][:, None, :],
                         (B, k, yr.shape[1])),
    )

    # W-link adjoint: +ywl on W_c, -ywl on Wt[:, c], -2 ywl on H[:, c]
    gWf = gWf.at[bidx, sb.coord_flat].add(ywl)
    gWt = gWt - ywl[:, None, :]
    gH = gH - 2.0 * ywl[:, None, :]

    # Theta-link rows: -yl_j on every W_ij
    gW = gWf.reshape(B, n, m) - s3w * yl[:, None, :]
    return gXt.reshape(B, k, n, m), gW, gWt, gH, gv1, gv2, gv3


def make_shor_k_solver(n: int, m: int, k: int, L: int, M5: int, Ms: int,
                       gamma: float, *, iters: int = 400,
                       dtype=jnp.float32, alpha: float = 1.6,
                       psd_method: str = "auto", jit: bool = True,
                       check_every: int = 2000, ema_iters: int = 1500):
    """Batched ADMM solver for the rank-k (k > 1) Shor relaxation.

    solve(A, mask, batch, sb, ub_bar, state) -> (state, out); ``out``
    carries the unscaled primal (X = sum_t Xt, Xt, W, Y, Th, U), dual
    blocks for certification, and the separation eigenpairs.

    ``check_every`` / ``target`` / ``group`` give the same on-device
    safe-bound certification early exit as the k = 1 solvers
    (``omc.sdp.admm`` / ``omc.sdp.admm_shor``): duals are tail-averaged
    with a bias-corrected EMA over ~``ema_iters`` iterations, the
    backend-agnostic safe bound is evaluated on device every
    ``check_every`` iterations, the best chunk's duals (by the
    float64-tracking estimator) are carried as the output, and the loop
    exits as soon as every live node group's best estimate clears its
    target.
    """
    assert k >= 2
    if psd_method == "auto":
        psd_method = "eigh" if dtype == jnp.float64 else "ns"
    proj = project_psd_ns if psd_method == "ns" else project_psd
    # tiny PSD blocks (5x5 minors, (k+1)x(k+1) XWH): lane-major VPU
    # projection — see omc.ops.polar.project_psd_ns_small
    proj_small = project_psd_ns_small if psd_method == "ns" else project_psd
    kp = (k * (k - 1)) // 2
    C = 4 * M5

    def solve(A, mask, batch: NodeBatch, sb: ShorKBatch, ub_bar,
              state: ShorKState, n_iters=None, target=None, group=None):
        ni = jnp.asarray(iters if n_iters is None else n_iters, jnp.int32)
        A = A.astype(dtype)
        mask = mask.astype(dtype)
        B = batch.cut_mask.shape[0]
        cm = batch.cut_mask
        m5m = sb.minor_mask
        cdm = sb.coord_mask
        socm = sb.soc_mask
        # per-slot runtime block scales (see omc.sdp.admm.ADMMState.sX);
        # views by target rank: _f (B,), 2 (B,1), 3 (B,1,1), 4 (B,1,1,1)
        sX_f = state.core.sX
        sW_f = sX_f * sX_f
        sX = sX_f[:, None, None]
        sX4 = sX_f[:, None, None, None]
        sT = state.core.sT[:, None, None]
        sT2 = state.core.sT[:, None]
        sW = sX * sX
        sW2 = sW_f[:, None]
        sS_f = state.core.sS  # (B,) uniform Shor-row weight
        sS2 = sS_f[:, None]
        sS3 = sS_f[:, None, None]
        ss2 = (sS_f * sS_f)[:, None]  # (B, 1)
        ss2_3 = ss2[..., None]  # (B, 1, 1)

        G1 = _gram1(batch, k, dtype)
        G1c = jax.lax.linalg.cholesky(G1)

        # objective: all linear under the W form (per-slot via the scales)
        cXt = -sX * (mask * A)[None]  # (B, n, m), applied to EVERY term t
        cW = 0.5 * sW * mask[None]
        cTh = (sT * 0.5 / gamma) * jnp.eye(m, dtype=dtype)[None]

        # --- rho-free K'K diagonals (D = rho * D1) ---
        # X block, per entry: D1x I_k + c1x J_k.  For entries outside every
        # minor/XWH block, only the sum over t is constrained (D1x = 0 and
        # the k x k block c1x J_k is singular), so a proximal term
        # tau_x ||Xt - Xt_prev||^2 regularises the split — standard
        # proximal ADMM, convergent, and exact in the sum direction.
        # K'K diagonals: M1/RSOC rows couple terms through X = sum Xt
        # (c1x); minor/XWH/RSOC/W>=0 slots are coefficient 1.0 on the
        # scaled variables (diagonal rescaling, see _forward_shor_k)
        tau_x = sX * sX
        ss2m = (sS_f * sS_f)[:, None, None]  # (B, 1, 1) for (B, n, m)
        D1x = ss2m * (2.0 * sb.cnt_minor + 2.0 * sb.is_coord) + tau_x
        c1x = 2.0 * sX * sX + ss2m * sb.is_soc
        D1w = ss2 * (1.0 + sb.is_soc.reshape(B, -1))  # (B, n*m)
        D1wt = ss2 * (sb.coord_minor_cnt + cdm + 1.0)  # (B, C)
        D1h = ss2 * jnp.maximum(2.0 * cdm, 1.0)  # (B, C)
        D1v1 = ss2 * jnp.maximum(sb.cnt_v1, 1.0)
        D1v2 = ss2 * jnp.maximum(sb.cnt_v2, 1.0)
        D1v3 = ss2 * jnp.maximum(sb.cnt_v3, 1.0)

        # --- link Woodbury (diagonal Schur; see module docstring) ---
        D1w_mat = D1w.reshape(B, n, m)
        # Theta-link column: coefficient 1 on Ths (D1th = sT^2 -> 1) and
        # -sW on the RAW-variable side of every Ws entry
        A_th = 2.0 + jnp.sum((sW * sW) / D1w_mat, axis=1)  # (B, m)
        D1w_c = jnp.take_along_axis(D1w, sb.coord_flat, axis=1)  # (B, C)
        # W-link column (sS-weighted row): +sS on Ws_c, -sS on Wts, -2sS
        D_c = 1.0 + cdm * ss2 * (
            1.0 / D1w_c + k / D1wt + kp * 4.0 / D1h
        )
        # Theta-link x W-link overlap through Ws_c: (-sW) * (+sS)
        B_jc = -cdm * sW2 * sS2 / D1w_c  # (B, C): entry (coord_j[c], c)
        bidx = jnp.arange(B)[:, None]
        S_th = A_th - jnp.zeros_like(A_th).at[bidx, sb.coord_j].add(
            B_jc * B_jc / D_c
        )

        def link_solve(p, q):
            """G2 [a; b] = [p; q] with the diagonal Schur structure."""
            q0 = q / D_c
            Bq = jnp.zeros_like(p).at[bidx, sb.coord_j].add(B_jc * q0)
            a = (p - Bq) / S_th
            b = (q - B_jc * jnp.take_along_axis(a, sb.coord_j, axis=1)) / D_c
            return a, b

        zeros4 = (jnp.zeros((B, n, m), dtype), jnp.zeros((B, n, n), dtype),
                  jnp.zeros((B, m, m), dtype), jnp.zeros((B, n, k), dtype))
        offs = _forward(batch, *zeros4, k, sX, sT)
        zsh = (jnp.zeros((B, k, n, m), dtype), jnp.zeros((B, n, m), dtype),
               jnp.zeros((B, k, C), dtype), jnp.zeros((B, kp, C), dtype),
               jnp.zeros_like(state.v1), jnp.zeros_like(state.v2),
               jnp.zeros_like(state.v3))
        offs5, offsx, offsr, _, _ = _forward_shor_k(
            sb, *zsh, k, m, sX_f, sW_f, sS_f
        )

        R_Xs4 = jnp.sqrt(2.0 * gamma * ub_bar).astype(dtype) / sX4

        def body(it, st: ShorKState):
            c0 = st.core
            rho_b = c0.rho
            r3 = rho_b[:, None, None]
            r4 = rho_b[:, None, None, None]
            r2 = rho_b[:, None]

            rX, rY, rTh, rU = _adjoint(
                batch,
                c0.w1 - c0.u1 - offs[0], c0.w2 - c0.u2 - offs[1],
                c0.w3 - c0.u3 - offs[2], c0.w4 - c0.u4 - offs[3],
                c0.wsoc - c0.usoc - offs[4], c0.wbox - c0.ubox - offs[5],
                (c0.wa - c0.ua - offs[6]) * cm[..., None],
                (c0.wb - c0.ub - offs[7]) * cm[..., None],
                (c0.wc - c0.uc - offs[8]) * cm,
                n, m, k, sX, sT,
            )
            gXt, gW, gWt, gH, gv1, gv2, gv3 = _adjoint_shor_k(
                sb,
                st.w5 - st.u5 - offs5, st.wx - st.ux - offsx,
                st.wr - st.ur - offsr, st.wl - st.ul, st.wwl - st.uwl,
                B, n, m, k, kp, sX_f, sW_f, sS_f,
            )
            # W >= 0 and Wt >= 0 identity slots (sS-weighted)
            gW = gW + sS3 * (st.wp - st.up)
            gWt = gWt + sS3 * (st.wq - st.uq)
            # Theta-link touches the Theta diagonal with coefficient sT
            yl = st.wl - st.ul
            rTh_l = sT * yl[:, None, :] * jnp.eye(m, dtype=dtype)

            # rhs = rho * K'(w - u - b) - c, then divide by rho * D1
            RXt = r4 * (rX[:, None] + gXt) - cXt[:, None]
            RY = r3 * rY
            RT = r3 * (rTh + rTh_l) - cTh
            RU = r3 * rU
            RW = r3 * gW - cW
            RWt = r4[..., 0] * gWt
            RH = r4[..., 0] * gH
            Rv1 = r4[..., 0] * gv1
            Rv2 = r4[..., 0] * gv2
            Rv3 = r4[..., 0] * gv3

            # X block: (D1x I + c1x J)^{-1} per entry (Sherman-Morrison),
            # with the proximal rhs term tau_x * Xt_prev
            rx = RXt / r4 + tau_x * st.Xt  # (B, k, n, m)
            rs = jnp.sum(rx, axis=1)  # (B, n, m)
            zXt = rx / D1x[:, None] - (
                c1x * rs / (D1x * (D1x + k * c1x))
            )[:, None]
            zY = RY / (3.0 * r3)
            zTh = RT / (r3 * sT * sT)
            zU = RU / (4.0 * r3)
            zW = (RW / r3).reshape(B, -1) / D1w
            zWt = (RWt / r2[..., None]) / D1wt[:, None, :]
            zH = (RH / r2[..., None]) / D1h[:, None, :]
            zv1 = (Rv1 / r2[..., None]) / D1v1[:, None, :]
            zv2 = (Rv2 / r2[..., None]) / D1v2[:, None, :]
            zv3 = (Rv3 / r2[..., None]) / D1v3[:, None, :]

            # base Woodbury on (Y, U)
            s = _Vt_apply(batch, zY, zU, k)
            t = rho_b[:, None] * jax.scipy.linalg.cho_solve(
                (G1c, True), s[..., None]
            )[..., 0]
            vY, vU = _V_apply(batch, t, n, k)
            zY = zY - vY / (3.0 * r3)
            zU = zU - vU / (4.0 * r3)

            # link Woodbury on (Theta, W, Wt, H)
            zW_mat = zW.reshape(B, n, m)
            p = sT2 * jnp.diagonal(zTh, axis1=-2, axis2=-1) - sW2 * jnp.sum(
                zW_mat, axis=1
            )
            q = cdm * sS2 * (
                jnp.take_along_axis(zW, sb.coord_flat, axis=1)
                - jnp.sum(zWt, axis=1)
                - 2.0 * jnp.sum(zH, axis=1)
            )
            a, bb = link_solve(p, q)
            # corrections: z -= D1^{-1} V2 [a; b]
            zTh = zTh - (a / sT2)[:, None, :] * jnp.eye(m, dtype=dtype)
            corr_W = (-sW) * a[:, None, :]  # Theta-link on every W_ij
            zW_mat = zW_mat - corr_W / D1w_mat
            # W-link corrections
            zW_flat = zW_mat.reshape(B, -1)
            zW_flat = zW_flat.at[bidx, sb.coord_flat].add(
                -(sS2 * bb * cdm) / D1w_c
            )
            zWt = zWt - (-(sS2 * bb) * cdm / D1wt)[:, None, :]
            zH = zH - (-(2.0 * sS2) * bb * cdm / D1h)[:, None, :]

            Y = 0.5 * (zY + jnp.swapaxes(zY, -1, -2))
            Ths = 0.5 * (zTh + jnp.swapaxes(zTh, -1, -2))
            Xt = jnp.clip(zXt, -R_Xs4, R_Xs4)
            W = zW_flat.reshape(B, n, m)
            U = zU

            # ---- w/u-steps ----
            Xsum = jnp.sum(Xt, axis=1)
            f = _forward(batch, Xsum, Y, Ths, U, k, sX, sT)
            f5, fx, fr, fw_col, fwl = _forward_shor_k(
                sb, Xt, W, zWt, zH, zv1, zv2, zv3, k, m, sX_f, sW_f, sS_f
            )
            f_link = sT2 * jnp.diagonal(Ths, axis1=-2, axis2=-1) - fw_col

            def relax_mix(fz, w):
                return alpha * fz + (1.0 - alpha) * w

            t1 = relax_mix(f[0], c0.w1) + c0.u1
            w1 = proj(t1)
            u1 = t1 - w1
            t2 = relax_mix(f[1], c0.w2) + c0.u2
            w2 = proj(t2)
            u2 = t2 - w2
            t3 = relax_mix(f[2], c0.w3) + c0.u3
            w3 = proj(t3)
            u3 = t3 - w3
            t4 = relax_mix(f[3], c0.w4) + c0.u4
            w4 = jnp.maximum(t4, 0.0)
            u4 = t4 - w4
            tsoc = relax_mix(f[4], c0.wsoc) + c0.usoc
            pt, pw = project_soc(tsoc[..., 0], tsoc[..., 1:])
            wsoc = jnp.concatenate([pt[..., None], pw], axis=-1)
            usoc = tsoc - wsoc
            tbox = relax_mix(f[5], c0.wbox) + c0.ubox
            wbox = jnp.clip(tbox, batch.U_lo, batch.U_hi)
            ubox = tbox - wbox
            ta = relax_mix(f[6], c0.wa) + c0.ua
            wa = jnp.maximum(ta, 0.0)
            ua = (ta - wa) * cm[..., None]
            tb = relax_mix(f[7], c0.wb) + c0.ub
            wb = jnp.maximum(tb, 0.0)
            ub = (tb - wb) * cm[..., None]
            tc = relax_mix(f[8], c0.wc) + c0.uc
            wc = jnp.maximum(tc, 0.0)
            uc = (tc - wc) * cm

            t5 = relax_mix(f5, st.w5) + st.u5
            w5 = proj_small(t5.reshape(B, M5 * k, 5, 5)).reshape(t5.shape)
            u5 = (t5 - w5) * m5m[..., None, None, None]
            tx = relax_mix(fx, st.wx) + st.ux
            wxn = proj_small(tx)
            uxn = (tx - wxn) * cdm[..., None, None]
            tr_ = relax_mix(fr, st.wr) + st.ur
            ru, rv, rx_ = project_rsoc(tr_[..., 0], tr_[..., 1], tr_[..., 2:])
            wr = jnp.concatenate([ru[..., None], rv[..., None], rx_], axis=-1)
            ur = (tr_ - wr) * socm[..., None]
            tl = alpha * f_link + st.ul
            wl = jnp.zeros_like(tl)
            ul = tl
            twl = alpha * fwl + st.uwl
            wwl = jnp.zeros_like(twl)
            uwl = twl * cdm
            tp = relax_mix(sS3 * W, st.wp) + st.up
            wp = jnp.maximum(tp, 0.0)
            up = tp - wp
            tq = relax_mix(sS3 * zWt, st.wq) + st.uq
            wq = jnp.maximum(tq, 0.0)
            uq = tq - wq

            core = ADMMStateCore(
                w1=w1, w2=w2, w3=w3, w4=w4, wsoc=wsoc, wbox=wbox,
                wa=wa, wb=wb, wc=wc,
                u1=u1, u2=u2, u3=u3, u4=u4, usoc=usoc, ubox=ubox,
                ua=ua, ub=ub, uc=uc,
                X=Xsum, Y=Y, Th=Ths, U=U, rho=rho_b,
                sX=c0.sX, sT=c0.sT, sS=c0.sS,
            )
            return ShorKState(
                core=core, Xt=Xt, W=W, Wt=zWt, Hh=zH, v1=zv1, v2=zv2, v3=zv3,
                w5=w5, u5=u5, wx=wxn, ux=uxn, wr=wr, ur=ur, wl=wl, ul=ul,
                wwl=wwl, uwl=uwl, wp=wp, up=up, wq=wq, uq=uq,
            )

        # chunked run with EMA-averaged duals, best-chunk tracking, and
        # estimator-based certification early exit — the same discipline
        # as the k = 1 solvers (omc.sdp.admm / omc.sdp.admm_shor)
        with_target = target is not None
        if group is None:
            group = jnp.arange(B, dtype=jnp.int32)
        # Under a mesh the solver body runs per-shard (shard_map) while the
        # driver's group ids are GLOBAL slot indices: the shard's slice of
        # a contiguous id block starts at a nonzero offset, so scatter
        # targets would land out of range (silently dropped) and the
        # ANY-replica-clears semantics degrade to per-slot clearing.
        # Re-basing by the shard's minimum id restores in-range local
        # indices for contiguous blocks (identity groups under mesh;
        # portfolio groups are single-shard only) — a no-op off-mesh.
        group = group - jnp.min(group)
        beta = jnp.asarray(1.0 / max(ema_iters, 1), dtype)

        def zero_acc():
            return (
                jnp.zeros_like(state.core.u1), jnp.zeros_like(state.core.u2),
                jnp.zeros_like(state.core.ua), jnp.zeros_like(state.core.ub),
                jnp.zeros_like(state.core.uc), jnp.zeros_like(state.u5),
                jnp.zeros_like(state.ux), jnp.zeros_like(state.ur),
                jnp.zeros_like(state.ul), jnp.zeros_like(state.uwl),
            )

        def outer_cond(carry):
            st, ema, best, it, done = carry
            return jnp.logical_and(it < ni, ~done)

        def outer_body(carry):
            st, ema, best, it, done = carry
            chunk = jnp.minimum(check_every, ni - it)

            def body_acc(i, inner):
                st_i, acc = inner
                st_i = body(it + i, st_i)
                rb = st_i.core.rho
                rb3 = rb[:, None, None]
                acc = (
                    acc[0] + beta * (rb3 * st_i.core.u1 - acc[0]),
                    acc[1] + beta * (rb3 * st_i.core.u2 - acc[1]),
                    acc[2] + beta * (rb3 * st_i.core.ua - acc[2]),
                    acc[3] + beta * (rb3 * st_i.core.ub - acc[3]),
                    acc[4] + beta * (rb[:, None] * st_i.core.uc - acc[4]),
                    acc[5] + beta * (
                        rb[:, None, None, None, None] * st_i.u5 - acc[5]
                    ),
                    acc[6] + beta * (
                        rb[:, None, None, None] * st_i.ux - acc[6]
                    ),
                    acc[7] + beta * (rb3 * st_i.ur - acc[7]),
                    acc[8] + beta * (rb[:, None] * st_i.ul - acc[8]),
                    acc[9] + beta * (rb[:, None] * st_i.uwl - acc[9]),
                )
                return st_i, acc

            st, ema = jax.lax.fori_loop(0, chunk, body_acc, (st, ema))
            corr = 1.0 - (1.0 - beta) ** (it + chunk).astype(dtype)
            inv = 1.0 / jnp.maximum(corr, beta)
            ybar = tuple(inv * a for a in ema)
            # full-f32 matmuls for the bound evaluation only (TPU default
            # bf16 passes degrade the bound; see omc.sdp.admm note)
            with jax.default_matmul_precision("float32"):
                lb, lb_est = safe_dual_bound_shor_k2(
                    jnp, A, mask, batch, sb, ybar[0], ybar[1], ybar[2],
                    ybar[3], ybar[4], ybar[5], ybar[6], ybar[7], ybar[8],
                    ybar[9], gamma, k, ub_bar,
                    sX=state.core.sX, sS=state.core.sS,
                )
            b_ybar, b_lb, b_est = best
            take = lb_est > b_est
            t2 = take[:, None]
            t3 = take[:, None, None]
            t4 = take[:, None, None, None]
            t5 = take[:, None, None, None, None]
            b_ybar = (
                jnp.where(t3, ybar[0], b_ybar[0]),
                jnp.where(t3, ybar[1], b_ybar[1]),
                jnp.where(t3, ybar[2], b_ybar[2]),
                jnp.where(t3, ybar[3], b_ybar[3]),
                jnp.where(t2, ybar[4], b_ybar[4]),
                jnp.where(t5, ybar[5], b_ybar[5]),
                jnp.where(t4, ybar[6], b_ybar[6]),
                jnp.where(t3, ybar[7], b_ybar[7]),
                jnp.where(t2, ybar[8], b_ybar[8]),
                jnp.where(t2, ybar[9], b_ybar[9]),
            )
            b_lb = jnp.where(take, lb, b_lb)
            b_est = jnp.where(take, lb_est, b_est)
            if with_target:
                cleared = b_est >= target
                gmax = jnp.zeros((B,), bool).at[group].max(cleared)
                done = jnp.all(gmax[group] | cleared)
            return st, ema, (b_ybar, b_lb, b_est), it + chunk, done

        lb0 = jnp.zeros_like(state.core.rho) - jnp.inf
        done0 = jnp.all(state.core.rho == jnp.inf)  # False, varying-typed
        carry0 = (
            state, zero_acc(), (zero_acc(), lb0, lb0),
            jnp.asarray(0, jnp.int32), done0,
        )
        state, _, (ybar, lb_dev, lb_est), iters_run, _ = jax.lax.while_loop(
            outer_cond, outer_body, carry0
        )

        c0 = state.core
        Msep = jnp.einsum("bik,bjk->bij", c0.U, c0.U) - c0.Y
        Msep = 0.5 * (Msep + jnp.swapaxes(Msep, -1, -2))
        sep_w, sep_V = jnp.linalg.eigh(Msep)
        out = {
            "X": sX * c0.X, "Xt": sX4 * state.Xt, "Y": c0.Y,
            "Th": sT * c0.Th, "U": c0.U, "W": sW * state.W,
            "sX": state.core.sX,  # slot rescale factor (certification)
            "sS": state.core.sS,  # Shor-row weight (certification)
            "y1": ybar[0], "y2": ybar[1],
            "ya": ybar[2], "yb": ybar[3], "yc": ybar[4],
            "y5": ybar[5], "yx": ybar[6], "yr": ybar[7],
            "yl": ybar[8], "ywl": ybar[9],
            "lb_dev": lb_dev, "lb_est": lb_est,
            "iters_run": jnp.zeros_like(
                state.core.rho, dtype=jnp.int32
            ) + iters_run,
            "sep_w": sep_w[..., :2], "sep_V": sep_V[..., :, :2],
        }
        return state, out

    return jax.jit(solve) if jit else solve


# ---------------------------------------------------------------------------
# Safe dual bound — backend-agnostic (numpy for certified f64 host
# evaluation, jnp for the on-device early-exit screen inside the compiled
# loop), mirroring omc.sdp.admm_shor.safe_dual_bound_shor.
# ---------------------------------------------------------------------------


def _scat_bk(xp, arr, idx_bM, val_bkM):
    """Scatter-add val (B, k, M) into arr (B, k, N) at idx (B, M)."""
    B, kk = arr.shape[0], arr.shape[1]
    M = idx_bM.shape[1]
    shape = (B, kk, M)
    if xp is np:
        bi = np.broadcast_to(np.arange(B)[:, None, None], shape)
        ki = np.broadcast_to(np.arange(kk)[None, :, None], shape)
        ii = np.broadcast_to(np.asarray(idx_bM)[:, None, :], shape)
        np.add.at(arr, (bi, ki, ii), val_bkM)
        return arr
    bi = jnp.arange(B)[:, None, None]
    ki = jnp.arange(kk)[None, :, None]
    ii = jnp.broadcast_to(idx_bM[:, None, :], shape)
    return arr.at[bi, ki, ii].add(val_bkM)


def _scat_b(xp, arr, idx_bM, val_bM):
    """Scatter-add val (B, M) into arr (B, N) at idx (B, M)."""
    if xp is np:
        np.add.at(arr, (np.arange(arr.shape[0])[:, None], idx_bM), val_bM)
        return arr
    return arr.at[jnp.arange(arr.shape[0])[:, None], idx_bM].add(val_bM)


def safe_dual_bound_shor_k(xp, A, mask, batch: NodeBatch, sb, y1, y2, ya,
                           yb, yc, y5, yx, yr, yl, ywl, gamma, k: int,
                           ub_bar, margin_rel=None, sX=1.0, sS=1.0):
    """Closed-form safe Lagrangian dual bound for the rank-k Shor
    relaxation — valid for ANY solver state (weak duality; multipliers
    are cone-projected here, in float64 when called from the host).

    Kept sets (all provably containing the node's master-feasible points
    with objective <= ub_bar; see module docstring): |Xt| <= R_X,
    W, Wt in [0, 2 gamma ub], |H| <= 2 gamma ub, |V*| <= 2 gamma ub,
    Y in the spectrahedron, U in the box, Theta PSD with trace bound.
    ``sb`` is any object with the ShorKBatch(Host) field layout."""
    from omc.sdp.admm_shor import _project_rsoc_xp, _psd_part

    n, m = A.shape[-2], A.shape[-1]
    B = y1.shape[0]
    kp = (k * (k - 1)) // 2
    T_th = 2.0 * gamma * ub_bar
    R_X = np.sqrt(T_th) if xp is np else xp.sqrt(xp.asarray(T_th, A.dtype))
    Wmax = T_th
    Vmax = T_th

    S1 = _psd_part(xp, -y1)
    S2 = _psd_part(xp, -y2)
    q, R1 = S1[:, :n, n:], S1[:, n:, n:]
    P1_ = S1[:, :n, :n]
    P2_, D, E = S2[:, :n, :n], S2[:, :n, n:], S2[:, n:, n:]

    cmask = batch.cut_mask
    alpha = xp.maximum(-ya, 0.0) * cmask[..., None]
    beta = xp.maximum(-yb, 0.0) * cmask[..., None]
    lam = xp.maximum(-yc, 0.0) * cmask
    cut_x = batch.cut_x
    lo, hi = batch.cut_lo, batch.cut_hi
    c = lo + hi
    bconst = xp.sum(-lo * hi, axis=-1)

    m5m = sb.minor_mask
    cdm = sb.coord_mask
    socm = sb.soc_mask
    S5 = _psd_part(xp, -y5) * m5m[..., None, None, None]  # (B,M5,k,5,5)
    Sx = _psd_part(xp, -yx) * cdm[..., None, None]  # (B,C,k+1,k+1)
    dr = -yr
    a_r, b_r, c_r = _project_rsoc_xp(xp, dr[..., 0], dr[..., 1], dr[..., 2:])
    c_r = c_r[..., 0]
    a_r, b_r, c_r = a_r * socm, b_r * socm, c_r * socm
    ywl = ywl * cdm  # free (W-link); yl free (Theta-link)
    # raw-constraint multipliers of the RESCALED slots (the solver's 5x5 /
    # XWH blocks are D M D with D = diag(1, 1/sX, ...), its RSOC rows use
    # scaled variables, and its W-link row is divided by sW = sX^2 — see
    # _forward_shor_k): X coefficients divide by sX, W/Wt/H/V by sX^2
    sX = xp.asarray(sX, A.dtype) if xp is not np else np.asarray(sX)
    sS = xp.asarray(sS, A.dtype) if xp is not np else np.asarray(sS)
    batched_scales = bool(sX.ndim) or bool(sS.ndim)
    if batched_scales:
        sX = xp.reshape(sX, (-1, 1)) if sX.ndim else sX
        sS = xp.reshape(sS, (-1, 1)) if sS.ndim else sS
    # the solver slot is sS * D M D: raw multiplier = sS * D S D
    inv_x2 = sS / sX
    inv_x3 = inv_x2[..., None] if batched_scales else inv_x2
    inv_w2 = sS / (sX * sX)
    inv_w3 = inv_w2[..., None] if batched_scales else inv_w2
    sS1 = sS[..., 0] if getattr(sS, "ndim", 0) else sS

    # ---- Y / U / cut terms ----
    G_Y = -(P1_ + P2_) + xp.einsum("bl,bln,blp->bnp", lam, cut_x, cut_x)
    G_Y = 0.5 * (G_Y + xp.swapaxes(G_Y, -1, -2))
    y_term = xp.sum(xp.minimum(xp.linalg.eigh(G_Y)[0][..., :k], 0.0), axis=-1)

    W_U = -2.0 * D - xp.einsum(
        "bln,blk->bnk", cut_x, alpha - beta + lam[..., None] * c
    )
    u_term = xp.sum(
        xp.minimum(W_U * batch.U_lo, W_U * batch.U_hi), axis=(-2, -1)
    )
    cut_const = (
        xp.sum(alpha * lo, axis=(-2, -1))
        - xp.sum(beta * hi, axis=(-2, -1))
        - xp.sum(lam * bconst, axis=-1)
    )

    # ---- Theta: (1/2g) I - R1 + yl on the diagonal ----
    eye_m = np.eye(m) if xp is np else jnp.eye(m, dtype=A.dtype)
    G_Th = (0.5 / gamma) * eye_m[None] - R1 + yl[:, None, :] * eye_m[None]
    G_Th = 0.5 * (G_Th + xp.swapaxes(G_Th, -1, -2))
    th_term = T_th * xp.minimum(xp.linalg.eigh(G_Th)[0][..., 0], 0.0)

    # ---- coefficient assembly (Lagrangian adds <y, slot> per slot) ----
    corner_flat = xp.take_along_axis(
        sb.coord_flat, sb.mc.reshape(B, -1), axis=1
    ).reshape(B, -1, 4)  # (B, M5, 4)

    # Xt coefficients (B, k, n*m)
    coef_Xt = xp.broadcast_to(
        (-mask * A).reshape(1, 1, n * m), (B, k, n * m)
    ) - 2.0 * xp.broadcast_to(q.reshape(B, 1, n * m), (B, k, n * m))
    if xp is np:
        coef_Xt = np.ascontiguousarray(coef_Xt)
    S5k = xp.moveaxis(S5, 2, 1)  # (B, k, M5, 5, 5)
    for corner in range(4):
        coef_Xt = _scat_bk(
            xp, coef_Xt, corner_flat[..., corner],
            -2.0 * inv_x3 * S5k[..., 0, corner + 1],
        )
    # XWH X coefficients
    coef_Xt = _scat_bk(
        xp, coef_Xt, sb.coord_flat,
        -2.0 * inv_x3 * xp.moveaxis(Sx[..., 0, 1:], 2, 1),
    )
    # RSOC X coefficients (the row's X slot is sum_t Xt -> every term)
    coef_Xt = _scat_bk(
        xp, coef_Xt, sb.soc_flat,
        xp.broadcast_to((-inv_x2 * c_r)[:, None, :], (B, k, c_r.shape[1])),
    )

    # W coefficients (B, n*m)
    coef_W = (
        xp.broadcast_to((0.5 * mask)[None], (B, n, m)) - yl[:, None, :]
    ).reshape(B, -1)
    if xp is np:
        coef_W = np.ascontiguousarray(coef_W)
    coef_W = _scat_b(xp, coef_W, sb.soc_flat, -inv_w2 * b_r)
    coef_W = _scat_b(xp, coef_W, sb.coord_flat, inv_w2 * ywl)

    # Wt coefficients (B, k, C)
    C = cdm.shape[1]
    zz = (lambda s: np.zeros(s)) if xp is np else (
        lambda s: jnp.zeros(s, dtype=A.dtype)
    )
    coef_Wt = zz((B, k, C))
    for corner in range(4):
        coef_Wt = _scat_bk(
            xp, coef_Wt, sb.mc[..., corner],
            -inv_w3 * S5k[..., corner + 1, corner + 1],
        )
    tt = np.arange(k)
    coef_Wt = coef_Wt - inv_w3 * xp.moveaxis(Sx[..., tt + 1, tt + 1], 2, 1)
    coef_Wt = coef_Wt - (inv_w2 * ywl)[:, None, :]

    # H coefficients (B, kp, C)
    coef_H = zz((B, kp, C))
    if kp:
        t1s, t2s = _pair_indices(k)
        t1a = np.asarray(t1s)
        t2a = np.asarray(t2s)
        coef_H = coef_H - inv_w3 * xp.moveaxis(
            Sx[..., t1a + 1, t2a + 1] + Sx[..., t2a + 1, t1a + 1], 2, 1
        )
        coef_H = coef_H - 2.0 * (inv_w2 * ywl)[:, None, :]

    # shared V coefficients (B, k, P*)
    coef_v1 = zz((B, k, sb.cnt_v1.shape[1]))
    coef_v2 = zz((B, k, sb.cnt_v2.shape[1]))
    coef_v3 = zz((B, k, sb.cnt_v3.shape[1]))
    coef_v1 = _scat_bk(xp, coef_v1, sb.iv1a, -2.0 * inv_w3 * S5k[..., 1, 2])
    coef_v1 = _scat_bk(xp, coef_v1, sb.iv1b, -2.0 * inv_w3 * S5k[..., 3, 4])
    coef_v2 = _scat_bk(xp, coef_v2, sb.iv2a, -2.0 * inv_w3 * S5k[..., 1, 3])
    coef_v2 = _scat_bk(xp, coef_v2, sb.iv2b, -2.0 * inv_w3 * S5k[..., 2, 4])
    coef_v3 = _scat_bk(
        xp, coef_v3, sb.iv3,
        -2.0 * inv_w3 * (S5k[..., 1, 4] + S5k[..., 2, 3]),
    )

    x_term = -R_X * xp.sum(xp.abs(coef_Xt), axis=(-2, -1))
    w_term = Wmax * xp.sum(xp.minimum(coef_W, 0.0), axis=-1)
    wt_term = Wmax * xp.sum(xp.minimum(coef_Wt, 0.0), axis=(-2, -1))
    h_term = -Wmax * xp.sum(xp.abs(coef_H), axis=(-2, -1))
    v_term = -Vmax * (
        xp.sum(xp.abs(coef_v1), axis=(-2, -1))
        + xp.sum(xp.abs(coef_v2), axis=(-2, -1))
        + xp.sum(xp.abs(coef_v3), axis=(-2, -1))
    )

    const = (
        0.5 * xp.sum(mask * A * A)
        - sS1 * xp.sum(S5[..., 0, 0], axis=(-2, -1))
        - sS1 * xp.sum(Sx[..., 0, 0], axis=-1)
        - 0.5 * sS1 * xp.sum(a_r, axis=-1)
        - xp.trace(E, axis1=-2, axis2=-1)
        + cut_const
    )

    lb = (y_term + u_term + th_term + x_term + w_term + wt_term + h_term
          + v_term + const)
    if margin_rel is None:
        margin_rel = margin_rel_default(xp, A.dtype)
    scale = (
        1.0 + xp.abs(lb) + ub_bar
        + xp.sqrt(xp.sum(S1 * S1, axis=(-2, -1)))
        + xp.sqrt(xp.sum(S2 * S2, axis=(-2, -1)))
        + xp.sqrt(xp.sum(S5 * S5, axis=(-4, -3, -2, -1)))
        + xp.sqrt(xp.sum(Sx * Sx, axis=(-3, -2, -1)))
    )
    return lb - margin_rel * scale


def safe_dual_bound_shor_k2(xp, A, mask, batch, sb, y1, y2, ya, yb, yc, y5,
                            yx, yr, yl, ywl, gamma, k, ub_bar, sX=1.0,
                            sS=1.0):
    """``(lb_valid, lb_est)``: the margined safe bound plus the unmargined
    value as a float64-tracking exit estimator (same contract as
    ``omc.sdp.admm_shor.safe_dual_bound_shor2`` — the driver re-certifies
    in float64 before acting, so estimator optimism costs a requeue,
    never soundness)."""
    lb = safe_dual_bound_shor_k(
        xp, A, mask, batch, sb, y1, y2, ya, yb, yc, y5, yx, yr, yl, ywl,
        gamma, k, ub_bar, margin_rel=0.0, sX=sX, sS=sS,
    )
    margin_rel = margin_rel_default(xp, A.dtype)
    # conservative proxy scale from the raw duals (||proj(-y)||_F <=
    # ||y||_F), matching the k = 1 sibling's margin discipline
    scale = (
        1.0 + xp.abs(lb) + ub_bar
        + xp.sqrt(xp.sum(y1 * y1, axis=(-2, -1)))
        + xp.sqrt(xp.sum(y2 * y2, axis=(-2, -1)))
        + xp.sqrt(xp.sum(y5 * y5, axis=(-4, -3, -2, -1)))
        + xp.sqrt(xp.sum(yx * yx, axis=(-3, -2, -1)))
    )
    return lb - margin_rel * scale, lb


def host_certified_bound_shor_k(A, mask, batch: NodeBatch,
                                sbh: ShorKBatchHost, out: dict, gamma,
                                k: int, ub_bar, margin_rel=1e-10):
    """Float64 safe Lagrangian dual bound for the rank-k Shor relaxation
    (host entry point; see ``safe_dual_bound_shor_k``)."""
    f = lambda a: np.asarray(a, dtype=np.float64)
    hb = NodeBatch(
        cut_x=f(batch.cut_x), cut_lo=f(batch.cut_lo), cut_hi=f(batch.cut_hi),
        cut_mask=f(batch.cut_mask), U_lo=f(batch.U_lo), U_hi=f(batch.U_hi),
    )
    sbf = ShorKBatchHost(
        minor_idx=np.asarray(sbh.minor_idx), minor_mask=f(sbh.minor_mask),
        mc=np.asarray(sbh.mc), coord_flat=np.asarray(sbh.coord_flat),
        coord_j=np.asarray(sbh.coord_j), coord_mask=f(sbh.coord_mask),
        coord_minor_cnt=f(sbh.coord_minor_cnt),
        iv1a=np.asarray(sbh.iv1a), iv1b=np.asarray(sbh.iv1b),
        iv2a=np.asarray(sbh.iv2a), iv2b=np.asarray(sbh.iv2b),
        iv3=np.asarray(sbh.iv3), soc_flat=np.asarray(sbh.soc_flat),
        soc_mask=f(sbh.soc_mask), cnt_minor=f(sbh.cnt_minor),
        is_coord=f(sbh.is_coord), is_soc=f(sbh.is_soc),
        cnt_v1=f(sbh.cnt_v1), cnt_v2=f(sbh.cnt_v2), cnt_v3=f(sbh.cnt_v3),
    )
    return safe_dual_bound_shor_k(
        np, f(A), f(mask), hb, sbf, f(out["y1"]), f(out["y2"]), f(out["ya"]),
        f(out["yb"]), f(out["yc"]), f(out["y5"]), f(out["yx"]), f(out["yr"]),
        f(out["yl"]), f(out["ywl"]), float(gamma), k, float(ub_bar),
        margin_rel=margin_rel, sX=f(out.get("sX", 1.0)),
        sS=f(out.get("sS", 1.0)),
    )
