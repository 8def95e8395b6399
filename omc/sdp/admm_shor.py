"""Batched ADMM node relaxation with Shor valid inequalities (rank-1 path).

Extends ``omc.sdp.admm`` with the reference's Shor strengthening
(`/root/reference/src/OptimalMatrixCompletion.jl:1755-1779` for k = 1):

- lifted variables ``W`` (n, m) >= 0 with the W-linearised objective
  ``1/2 sum_Omega (A^2 - 2 A X + W) + tr(Theta)/(2 gamma)`` (lines
  1837-1846), and pair-indexed ``V1 / V2 / V3`` *shared across minors*
  exactly as in the JuMP model (stored as per-node flat arrays with gather
  tables, see ``omc.sdp.shor_encode``),
- per active minor (i1, i2, j1, j2) a 5x5 PSD block on
  ``[1, X11, X12, X21, X22]`` against ``W``/``V`` entries (line 1771),
- rotated SOC rows ``W_ij >= X_ij^2`` on the uncovered coordinates
  (line 1757),
- linkage rows ``Theta_jj = sum_i W_ij`` (line 1763) — these join the
  Woodbury low-rank part of K'K as m extra columns whose Gram block is
  *diagonal* (they touch disjoint variables), so the z-step stays one
  batched Cholesky.

Certification: ``safe_dual_bound_shor`` extends the kept-set Lagrangian
bound — X/W/V blocks are linear in the objective/Lagrangian, minimised
in closed form over valid boxes (|X| <= R_X, 0 <= W <= 2 gamma ub,
|V| <= R_X^2).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

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
)
from omc.sdp.relax import NodeBatch, margin_rel_default
from omc.sdp.shor_encode import ShorBatchHost


class ShorBatch(NamedTuple):
    """Device-side Shor constraint tables (see ShorBatchHost)."""

    minor_idx: jnp.ndarray  # (B, M5, 4) int32
    minor_mask: jnp.ndarray  # (B, M5)
    iv1a: jnp.ndarray
    iv1b: jnp.ndarray
    iv2a: jnp.ndarray
    iv2b: jnp.ndarray
    iv3: jnp.ndarray
    soc_idx: jnp.ndarray  # (B, Ms, 2)
    soc_mask: jnp.ndarray  # (B, Ms)
    cnt_X: jnp.ndarray  # (B, n, m)
    cnt_W: jnp.ndarray
    cnt_v1: jnp.ndarray  # (B, P1)
    cnt_v2: jnp.ndarray
    cnt_v3: jnp.ndarray


def shor_batch_to_device(h: ShorBatchHost, dtype) -> ShorBatch:
    f = lambda a: jnp.asarray(a, dtype=dtype)
    i = lambda a: jnp.asarray(a, dtype=jnp.int32)
    return ShorBatch(
        minor_idx=i(h.minor_idx), minor_mask=f(h.minor_mask),
        iv1a=i(h.iv1a), iv1b=i(h.iv1b), iv2a=i(h.iv2a), iv2b=i(h.iv2b),
        iv3=i(h.iv3), soc_idx=i(h.soc_idx), soc_mask=f(h.soc_mask),
        cnt_X=f(h.cnt_X), cnt_W=f(h.cnt_W),
        cnt_v1=f(h.cnt_v1), cnt_v2=f(h.cnt_v2), cnt_v3=f(h.cnt_v3),
    )


class ShorADMMState(NamedTuple):
    core: "ADMMStateCore"  # the base ADMMState from omc.sdp.admm
    W: jnp.ndarray  # (B, n, m) scaled
    v1: jnp.ndarray  # (B, P1) scaled
    v2: jnp.ndarray
    v3: jnp.ndarray
    w5: jnp.ndarray  # (B, M5, 5, 5)
    u5: jnp.ndarray
    wr: jnp.ndarray  # (B, Ms, 3)
    ur: jnp.ndarray
    wl: jnp.ndarray  # (B, m) Theta-link rows
    ul: jnp.ndarray
    wp: jnp.ndarray  # (B, n, m) W >= 0 slot
    up: jnp.ndarray


from omc.sdp.admm import ADMMState as ADMMStateCore  # noqa: E402
from omc.sdp.admm import init_admm_state  # noqa: E402


def init_shor_state(B, n, m, k, L, M5, Ms, dtype=jnp.float32, *, sX=1.0,
                    sT=1.0, rho=0.02, **kw) -> ShorADMMState:
    P1 = P2 = 2 * M5
    P3 = M5
    z = lambda *s: jnp.zeros(s, dtype=dtype)
    core = init_admm_state(B, n, m, k, L, dtype, sX=sX, sT=sT, rho=rho, **kw)
    return ShorADMMState(
        core=core, W=z(B, n, m), v1=z(B, P1), v2=z(B, P2), v3=z(B, P3),
        w5=z(B, M5, 5, 5), u5=z(B, M5, 5, 5),
        wr=z(B, Ms, 3), ur=z(B, Ms, 3), wl=z(B, m), ul=z(B, m),
        wp=z(B, n, m), up=z(B, n, m),
    )


def _flat_idx(minor_idx, m):
    """Flat (n*m) indices of the four X/W coordinates of each minor."""
    i1, i2, j1, j2 = (minor_idx[..., t] for t in range(4))
    return (i1 * m + j1, i1 * m + j2, i2 * m + j1, i2 * m + j2)


def _gather(flat, idx):
    """flat (B, N), idx (B, M) -> (B, M)."""
    return jnp.take_along_axis(flat, idx, axis=1)


def _scatter_add(shape_ref, idx, val):
    """Accumulate val (B, M) into zeros_like-shaped (B, N) at idx."""
    out = jnp.zeros_like(shape_ref)
    return out.at[jnp.arange(out.shape[0])[:, None], idx].add(val)


def _forward_shor(sb: ShorBatch, Xs, Ws, v1s, v2s, v3s, m, sX, sW, sS=1.0):
    """Shor slot values: 5x5 minors, RSOC rows, and the link residual part
    involving W (the Theta part is added by the caller).  ``sX``/``sW``
    are per-slot (B,) runtime scales (or python scalars in tests);
    ``sS`` is the uniform Shor-row weight (see ADMMState.sS)."""
    B = Xs.shape[0]
    sW = jnp.reshape(jnp.asarray(sW, Xs.dtype), (-1,))
    s3w = sW[:, None, None]
    sS = jnp.reshape(jnp.asarray(sS, Xs.dtype), (-1,))
    sS2 = sS[:, None]
    # DIAGONAL RESCALING of the Shor blocks (round-4 verdict item 1): the
    # 5x5 minor slot is D M D with D = diag(1, 1/sX, 1/sX, 1/sX, 1/sX)
    # (PSD-equivalent), i.e. built directly from the SCALED variables
    # Xs = X/sX, Ws = W/sX^2, vs = V/sX^2 — every entry is O(1), so the
    # f32 matrix-sign PSD projection no longer sees the ~1e2 entry spread
    # that stalled the 100x100 Shor bound.  The RSOC rows use
    # (0.5, Ws, Xs), the SAME cone since W >= X^2 <=> W/s^2 >= (X/s)^2.
    Xf = Xs.reshape(B, -1)
    Wf = Ws.reshape(B, -1)
    f11, f12, f21, f22 = _flat_idx(sb.minor_idx, m)
    x11, x12, x21, x22 = (_gather(Xf, f) for f in (f11, f12, f21, f22))
    w11, w12, w21, w22 = (_gather(Wf, f) for f in (f11, f12, f21, f22))
    V1a = _gather(v1s, sb.iv1a)
    V1b = _gather(v1s, sb.iv1b)
    V2a = _gather(v2s, sb.iv2a)
    V2b = _gather(v2s, sb.iv2b)
    V3 = _gather(v3s, sb.iv3)
    one = jnp.ones_like(x11)
    rows = [
        [one, x11, x12, x21, x22],
        [x11, w11, V1a, V2a, V3],
        [x12, V1a, w12, V3, V2b],
        [x21, V2a, V3, w21, V1b],
        [x22, V3, V2b, V1b, w22],
    ]
    w5 = sS[:, None, None, None] * jnp.stack(
        [jnp.stack(r, axis=-1) for r in rows], axis=-2
    )  # (B, M5, 5, 5)

    # canonical SOC layout (shor_encode): slot s <-> flat coordinate s,
    # so the RSOC slot values are plain reshapes — no gather
    wr = sS2[..., None] * jnp.stack(
        [0.5 * jnp.ones_like(Wf), Wf, Xf], axis=-1
    )  # (B, Ms, 3)
    wcol = jnp.sum((s3w * Ws), axis=-2)  # (B, m): sum_i W_ij
    return w5, wr, wcol


def _adjoint_shor(sb: ShorBatch, y5, yr, yl, B, n, m, sX, sW, sS=1.0):
    """Adjoint of the Shor slots -> gradients on (Xs, Ws, v1s, v2s, v3s,
    Th-diag contribution handled by caller).  ``sX``/``sW`` are per-slot
    (B,) runtime scales (or python scalars in tests); ``sS`` the uniform
    Shor-row weight (the minor/RSOC slot coefficients)."""
    sW = jnp.reshape(jnp.asarray(sW, y5.dtype), (-1,))
    s2w = sW[:, None]
    sS = jnp.reshape(jnp.asarray(sS, y5.dtype), (-1,))
    y5 = sS[:, None, None, None] * y5
    yr = sS[:, None, None] * yr
    f11, f12, f21, f22 = _flat_idx(sb.minor_idx, m)
    cm = sb.minor_mask
    y5 = y5 * cm[..., None, None]
    gXf = jnp.zeros((B, n * m), dtype=y5.dtype)
    gWf = jnp.zeros((B, n * m), dtype=y5.dtype)
    barange = jnp.arange(B)[:, None]
    # minor/RSOC slots are built on the SCALED variables (coefficient 1.0
    # — see _forward_shor's diagonal-rescaling note)
    # X rows/cols of the 5x5 (symmetric dual): coefficient 2*y5[0, c]
    for f, c in ((f11, 1), (f12, 2), (f21, 3), (f22, 4)):
        gXf = gXf.at[barange, f].add(2.0 * y5[..., 0, c])
    for f, c in ((f11, 1), (f12, 2), (f21, 3), (f22, 4)):
        gWf = gWf.at[barange, f].add(y5[..., c, c])
    gv1 = jnp.zeros_like(sb.cnt_v1)
    gv2 = jnp.zeros_like(sb.cnt_v2)
    gv3 = jnp.zeros_like(sb.cnt_v3)
    gv1 = gv1.at[barange, sb.iv1a].add(2.0 * y5[..., 1, 2])
    gv1 = gv1.at[barange, sb.iv1b].add(2.0 * y5[..., 3, 4])
    gv2 = gv2.at[barange, sb.iv2a].add(2.0 * y5[..., 1, 3])
    gv2 = gv2.at[barange, sb.iv2b].add(2.0 * y5[..., 2, 4])
    gv3 = gv3.at[barange, sb.iv3].add(
        2.0 * (y5[..., 1, 4] + y5[..., 2, 3])
    )
    # RSOC rows (0.5, Ws, Xs) — canonical layout: elementwise adds
    yr = yr * sb.soc_mask[..., None]
    gWf = gWf + yr[..., 1]
    gXf = gXf + yr[..., 2]
    # link rows: r_j = Theta_jj - sum_i W_ij -> dW_ij -= sW * yl_j
    # (the link row stays on the RAW variables)
    gW = gWf.reshape(B, n, m) - s2w[..., None] * yl[:, None, :]
    return gXf.reshape(B, n, m), gW, gv1, gv2, gv3


def make_shor_solver(n: int, m: int, L: int, M5: int, Ms: int, gamma: float,
                     *, iters: int = 400, dtype=jnp.float32,
                     alpha: float = 1.6,
                     psd_method: str = "auto", jit: bool = True,
                     check_every: int = 2000, ema_iters: int = 1500):
    """Batched ADMM solver for the rank-1 relaxation with Shor valid
    inequalities.  Interface mirrors ``make_admm_solver`` with the extra
    per-batch ``ShorBatch`` argument; returns (state, out) where ``out``
    additionally carries W and the Shor dual blocks for certification.
    ``check_every``/``target``/``group`` give the same on-device
    certification early exit as the base ADMM solver."""
    k = 1
    if psd_method == "auto":
        psd_method = "eigh" if dtype == jnp.float64 else "ns"
    proj = project_psd_ns if psd_method == "ns" else project_psd
    # tiny 5x5 minor slots: lane-major VPU projection (project_psd_ns on
    # a (B, M5, 5, 5) batch costs ~39 ms/iteration at M5=1024 — the MXU
    # pads every 5x5 matmul to a 128-lane tile; the small variant runs
    # ~2.8 ms, same schedule)
    proj_small = project_psd_ns_small if psd_method == "ns" else project_psd

    def solve(A, mask, batch: NodeBatch, sb: ShorBatch, ub_bar,
              state: ShorADMMState, n_iters=None, target=None, group=None):
        """``n_iters`` (optional, traced): runtime iteration budget, same
        contract as ``make_admm_solver`` — one compiled program serves any
        budget."""
        ni = jnp.asarray(iters if n_iters is None else n_iters, jnp.int32)
        A = A.astype(dtype)
        mask = mask.astype(dtype)
        B = batch.cut_mask.shape[0]
        cm = batch.cut_mask
        m5m = sb.minor_mask
        socm = sb.soc_mask
        # per-slot runtime block scales (see omc.sdp.admm.ADMMState.sX)
        sX_f = state.core.sX  # (B,)
        sW_f = sX_f * sX_f
        sX = sX_f[:, None, None]
        sT = state.core.sT[:, None, None]
        sW = sX * sX
        sW2 = sW_f[:, None]  # (B, 1) view for flat arrays
        sS_f = state.core.sS  # (B,) uniform Shor-row weight
        sS2 = sS_f[:, None]
        sS3 = sS_f[:, None, None]

        G1 = _gram1(batch, k, dtype)
        G1c = jax.lax.linalg.cholesky(G1)
        # link-row Gram block is diagonal (disjoint variables per column).
        # The link row stays on the RAW variables (coefficient sW on W),
        # while W's K'K diagonal is sS^2 * cnt_W (the sS-weighted
        # minor/RSOC/W>=0 rows — see _forward_shor), so the W contribution
        # per entry is sW^2 / (sS^2 cnt_W).
        g_link = 2.0 + ((sW_f * sW_f) / (sS_f * sS_f))[:, None] * jnp.sum(
            1.0 / jnp.maximum(sb.cnt_W, 1e-30), axis=1
        )  # (B, m)

        # objective (all linear under the W form): c'z with
        # F = 1/2 sum A^2 - sum_Omega A X + 1/2 sum_Omega W + tr(Theta)/2g
        cX = -sX * (mask * A)[None]
        cW = 0.5 * sW * mask[None]
        cTh = (sT * 0.5 / gamma) * jnp.eye(m, dtype=dtype)[None]
        const_obj = 0.5 * jnp.sum(mask * A * A)

        # K'K diagonals (D = rho * d*): the M1/M2 slots keep coefficient
        # sX on Xs; minor/RSOC/W>=0 slots are coefficient 1.0 on the
        # scaled variables (diagonal rescaling, see _forward_shor)
        ss2 = sS3 * sS3
        ss2f = sS2 * sS2
        dX1 = 2.0 * sX * sX + ss2 * sb.cnt_X
        dW1 = ss2 * jnp.maximum(sb.cnt_W, 1.0)
        dv1 = ss2f * jnp.maximum(sb.cnt_v1, 1.0)
        dv2 = ss2f * jnp.maximum(sb.cnt_v2, 1.0)
        dv3 = ss2f * jnp.maximum(sb.cnt_v3, 1.0)

        zeros4 = (jnp.zeros((B, n, m), dtype), jnp.zeros((B, n, n), dtype),
                  jnp.zeros((B, m, m), dtype), jnp.zeros((B, n, k), dtype))
        offs = _forward(batch, *zeros4, k, sX, sT)
        zshor = (jnp.zeros((B, n, m), dtype), jnp.zeros((B, n, m), dtype),
                 jnp.zeros_like(state.v1), jnp.zeros_like(state.v2),
                 jnp.zeros_like(state.v3))
        offs5, offsr, offsl_w = _forward_shor(sb, zshor[0], zshor[1],
                                              zshor[2], zshor[3], zshor[4],
                                              m, sX_f, sW_f, sS_f)

        # valid primal box for stability (master-feasible range)
        R_Xs = jnp.sqrt(2.0 * gamma * ub_bar).astype(dtype) / sX

        def body(it, st: ShorADMMState):
            c0 = st.core
            rho_b = c0.rho
            r3 = rho_b[:, None, None]
            r2 = rho_b[:, None]
            # ---- z-step rhs: rho * K'(w - u - b) - c ----
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
            gX5, gW5, gv1, gv2, gv3 = _adjoint_shor(
                sb,
                (st.w5 - st.u5 - offs5) * m5m[..., None, None],
                (st.wr - st.ur - offsr) * socm[..., None],
                (st.wl - st.ul),  # link offset is zero
                B, n, m, sX_f, sW_f, sS_f,
            )
            # W >= 0 slot adjoint (sS-weighted identity row on Ws)
            gW5 = gW5 + sS3 * (st.wp - st.up)
            # link rows touch Theta diagonal with coefficient sT
            yl = st.wl - st.ul
            rTh_l = sT * yl[:, None, :] * jnp.eye(m, dtype=dtype)

            RX = r3 * (rX + gX5) - cX
            RY = r3 * rY
            RT = r3 * (rTh + rTh_l) - cTh
            RU = r3 * rU
            RW = r3 * gW5 - cW
            Rv1 = r2 * gv1
            Rv2 = r2 * gv2
            Rv3 = r2 * gv3

            # ---- diagonal solve ----
            zX = RX / (r3 * dX1)
            zY = RY / (3.0 * r3)
            zTh = RT / (r3 * sT * sT)
            zU = RU / (4.0 * r3)
            zW = RW / (r3 * dW1)
            zv1 = Rv1 / (r2 * dv1)
            zv2 = Rv2 / (r2 * dv2)
            zv3 = Rv3 / (r2 * dv3)

            # ---- Woodbury corrections ----
            s = _Vt_apply(batch, zY, zU, k)
            t = rho_b[:, None] * jax.scipy.linalg.cho_solve(
                (G1c, True), s[..., None]
            )[..., 0]
            vY, vU = _V_apply(batch, t, n, k)
            zY = zY - vY / (3.0 * r3)
            zU = zU - vU / (4.0 * r3)
            # link columns: s_j = sT z_Theta[j,j] - sW sum_i zW[i,j]
            s_l = sT[..., 0] * jnp.diagonal(zTh, axis1=-2, axis2=-1) - sW[
                ..., 0
            ] * jnp.sum(zW, axis=1)
            t_l = rho_b[:, None] * s_l / g_link
            zTh = zTh - (t_l / (rho_b[:, None] * sT[..., 0]))[
                :, None, :
            ] * jnp.eye(m, dtype=dtype)
            zW = zW + sW * t_l[:, None, :] / (r3 * dW1)
            # note: D_W = rho * dW1 with dW1 = cnt_W; the link column entry
            # on W is -sW, so the correction is -(-sW) t_l / D_W
            Y = 0.5 * (zY + jnp.swapaxes(zY, -1, -2))
            Ths = 0.5 * (zTh + jnp.swapaxes(zTh, -1, -2))
            Xs = jnp.clip(zX, -R_Xs, R_Xs)
            Ws, v1, v2, v3 = zW, zv1, zv2, zv3
            U = zU

            # ---- w/u-steps ----
            f = _forward(batch, Xs, Y, Ths, U, k, sX, sT)
            f5, fr, fw_col = _forward_shor(sb, Xs, Ws, v1, v2, v3, m,
                                           sX_f, sW_f, sS_f)
            f_link = sT[..., 0] * jnp.diagonal(
                Ths, axis1=-2, axis2=-1
            ) - fw_col

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
            w5 = proj_small(t5)
            u5 = (t5 - w5) * m5m[..., None, None]
            tr_ = relax_mix(fr, st.wr) + st.ur
            ru, rv, rx = project_rsoc(tr_[..., 0], tr_[..., 1],
                                      tr_[..., 2:])
            wr = jnp.concatenate([ru[..., None], rv[..., None], rx], axis=-1)
            ur = (tr_ - wr) * socm[..., None]
            # link rows: zero cone — w = 0, dual accumulates
            tl = alpha * f_link + st.ul
            wl = jnp.zeros_like(tl)
            ul = tl
            # W >= 0 slot (sS-weighted scaled Ws; same cone)
            tp = relax_mix(sS3 * Ws, st.wp) + st.up
            wp = jnp.maximum(tp, 0.0)
            up = tp - wp

            core = ADMMStateCore(
                w1=w1, w2=w2, w3=w3, w4=w4, wsoc=wsoc, wbox=wbox,
                wa=wa, wb=wb, wc=wc,
                u1=u1, u2=u2, u3=u3, u4=u4, usoc=usoc, ubox=ubox,
                ua=ua, ub=ub, uc=uc,
                X=Xs, Y=Y, Th=Ths, U=U, rho=rho_b,
                sX=c0.sX, sT=c0.sT, sS=c0.sS,
            )
            return ShorADMMState(core=core, W=Ws, v1=v1, v2=v2, v3=v3,
                                 w5=w5, u5=u5, wr=wr, ur=ur, wl=wl, ul=ul,
                                 wp=wp, up=up)

        # chunked run with EMA-averaged duals, best-chunk tracking, and
        # estimator-based certification early exit (see omc.sdp.admm)
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
                jnp.zeros_like(state.ur), jnp.zeros_like(state.ul),
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
                    acc[5] + beta * (rb[:, None, None, None] * st_i.u5 - acc[5]),
                    acc[6] + beta * (rb3 * st_i.ur - acc[6]),
                    acc[7] + beta * (rb[:, None] * st_i.ul - acc[7]),
                )
                return st_i, acc

            st, ema = jax.lax.fori_loop(0, chunk, body_acc, (st, ema))
            corr = 1.0 - (1.0 - beta) ** (it + chunk).astype(dtype)
            inv = 1.0 / jnp.maximum(corr, beta)
            ybar = tuple(inv * a for a in ema)
            # full-f32 matmuls for the bound evaluation only (TPU default
            # bf16 passes degrade the bound; see omc.sdp.admm note)
            with jax.default_matmul_precision("float32"):
                lb, lb_est = safe_dual_bound_shor2(
                    jnp, A, mask, batch, sb, ybar[0], ybar[1], ybar[2],
                    ybar[3], ybar[4], ybar[5], ybar[6], ybar[7], gamma,
                    ub_bar, sX=state.core.sX, sS=state.core.sS,
                )
            b_ybar, b_lb, b_est = best
            take = lb_est > b_est
            t2 = take[:, None]
            t3 = take[:, None, None]
            t4 = take[:, None, None, None]
            b_ybar = (
                jnp.where(t3, ybar[0], b_ybar[0]),
                jnp.where(t3, ybar[1], b_ybar[1]),
                jnp.where(t3, ybar[2], b_ybar[2]),
                jnp.where(t3, ybar[3], b_ybar[3]),
                jnp.where(t2, ybar[4], b_ybar[4]),
                jnp.where(t4, ybar[5], b_ybar[5]),
                jnp.where(t3, ybar[6], b_ybar[6]),
                jnp.where(t2, ybar[7], b_ybar[7]),
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
            "X": sX * c0.X, "Y": c0.Y, "Th": sT * c0.Th, "U": c0.U,
            "W": sW * state.W,
            "sX": state.core.sX,  # minor-slot rescale factor (certification)
            "sS": state.core.sS,  # Shor-row weight (certification)
            "y1": ybar[0], "y2": ybar[1],
            "ya": ybar[2], "yb": ybar[3], "yc": ybar[4],
            "y5": ybar[5], "yr": ybar[6], "yl": ybar[7],
            "lb_dev": lb_dev, "lb_est": lb_est,
            "iters_run": jnp.zeros_like(state.core.rho, dtype=jnp.int32) + iters_run,
            "sep_w": sep_w[..., :2], "sep_V": sep_V[..., :, :2],
        }
        return state, out

    return jax.jit(solve) if jit else solve


# ---------------------------------------------------------------------------
# Host-side certified bound for the Shor-strengthened relaxation
# ---------------------------------------------------------------------------


def _np_psd(M):
    M = 0.5 * (M + np.swapaxes(M, -1, -2))
    w, V = np.linalg.eigh(M)
    return np.einsum("...ik,...k,...jk->...ij", V, np.maximum(w, 0.0), V)


def _np_project_rsoc(u, v, x):
    s2 = np.sqrt(2.0)
    t = (u + v) / s2
    s = (u - v) / s2
    z = np.concatenate([s[..., None], x], axis=-1)
    nz = np.linalg.norm(z, axis=-1)
    inside = nz <= t
    polar = nz <= -t
    scale = np.where(nz > 0, 0.5 * (1.0 + t / np.where(nz > 0, nz, 1.0)), 0.0)
    t_p = np.where(inside, t, np.where(polar, 0.0, 0.5 * (t + nz)))
    z_p = np.where(inside[..., None], z,
                   np.where(polar[..., None], 0.0, scale[..., None] * z))
    u_p = (t_p + z_p[..., 0]) / s2
    v_p = (t_p - z_p[..., 0]) / s2
    return u_p, v_p, z_p[..., 1:]


def _psd_part(xp, M):
    M = 0.5 * (M + xp.swapaxes(M, -1, -2))
    w, V = xp.linalg.eigh(M)
    return xp.einsum("...ik,...k,...jk->...ij", V, xp.maximum(w, 0.0), V)


def _project_rsoc_xp(xp, u, v, x):
    s2 = xp.sqrt(xp.asarray(2.0, u.dtype)) if xp is not np else np.sqrt(2.0)
    t = (u + v) / s2
    s = (u - v) / s2
    z = xp.concatenate([s[..., None], x], axis=-1)
    nz = xp.linalg.norm(z, axis=-1)
    inside = nz <= t
    polar = nz <= -t
    scale = xp.where(nz > 0, 0.5 * (1.0 + t / xp.where(nz > 0, nz, 1.0)), 0.0)
    t_p = xp.where(inside, t, xp.where(polar, 0.0, 0.5 * (t + nz)))
    z_p = xp.where(inside[..., None], z,
                   xp.where(polar[..., None], 0.0, scale[..., None] * z))
    u_p = (t_p + z_p[..., 0]) / s2
    v_p = (t_p - z_p[..., 0]) / s2
    return u_p, v_p, z_p[..., 1:]


def _scatter_add(xp, arr, bidx, idx, val):
    if xp is np:
        np.add.at(arr, (bidx, idx), val)
        return arr
    return arr.at[bidx, idx].add(val)


def safe_dual_bound_shor(xp, A, mask, batch: NodeBatch, sb, y1, y2, ya, yb,
                         yc, y5, yr, yl, gamma, ub_bar, margin_rel=None,
                         sX=1.0, sS=1.0):
    """Closed-form safe Lagrangian dual bound for the rank-1 Shor
    relaxation — valid for ANY solver state (see the host docstring).
    Backend-agnostic: numpy for certified f64 host evaluation, jnp for the
    on-device early-exit screen inside the compiled loop.  ``sb`` is any
    object with the ShorBatch(Host) field layout.

    ``sX`` is the minor-slot diagonal-rescaling factor (see
    ``_forward_shor``): the solver's 5x5 slots are D M D with
    D = diag(1, 1/sX, .., 1/sX) and its RSOC rows are (0.5, W/sX^2,
    X/sX); the multiplier on the RAW constraint M >= 0 is therefore
    D S5 D, i.e. the X/W/V scatter coefficients below divide by
    sX / sX^2."""
    n, m = A.shape[-2], A.shape[-1]
    B = y1.shape[0]
    k = 1
    T_th = 2.0 * gamma * ub_bar
    R_X = xp.sqrt(T_th) if xp is np else xp.sqrt(xp.asarray(T_th, A.dtype))
    Wmax = T_th
    Vmax = T_th

    S1 = _psd_part(xp, -y1)
    S2 = _psd_part(xp, -y2)
    P1, q, R1 = S1[:, :n, :n], S1[:, :n, n:], S1[:, n:, n:]
    P2, D, E = S2[:, :n, :n], S2[:, :n, n:], S2[:, n:, n:]

    cmask = batch.cut_mask
    alpha = xp.maximum(-ya, 0.0) * cmask[..., None]
    beta = xp.maximum(-yb, 0.0) * cmask[..., None]
    lam = xp.maximum(-yc, 0.0) * cmask
    cut_x = batch.cut_x
    lo, hi = batch.cut_lo, batch.cut_hi
    c = lo + hi
    bconst = xp.sum(-lo * hi, axis=-1)

    m5m = sb.minor_mask
    S5 = _psd_part(xp, -y5) * m5m[..., None, None]
    socm = sb.soc_mask
    dr = -yr
    a_r, b_r, c_r = _project_rsoc_xp(xp, dr[..., 0], dr[..., 1], dr[..., 2:])
    c_r = c_r[..., 0]
    a_r, b_r, c_r = a_r * socm, b_r * socm, c_r * socm
    mu = -yl  # (B, m), free
    # raw-constraint multipliers of the RESCALED minor/RSOC slots (see
    # the sX docstring note): divide X coefficients by sX, W/V by sX^2
    sX = xp.asarray(sX, A.dtype) if xp is not np else np.asarray(sX)
    sX = xp.reshape(sX, (-1, 1)) if sX.ndim else sX
    sS = xp.asarray(sS, A.dtype) if xp is not np else np.asarray(sS)
    sS = xp.reshape(sS, (-1, 1)) if sS.ndim else sS
    # the solver slot is sS * D M D: raw multiplier = sS * D S5 D
    inv_x = sS / sX
    inv_w = sS / (sX * sX)

    # ---- Y / U / cut terms (as in the base bound) ----
    G_Y = -(P1 + P2) + xp.einsum("bl,bln,blp->bnp", lam, cut_x, cut_x)
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

    # ---- Theta ----
    eye_m = (np.eye(m) if xp is np
             else jnp.eye(m, dtype=A.dtype))
    G_Th = (0.5 / gamma) * eye_m[None] - R1 - mu[:, None, :] * eye_m[None]
    G_Th = 0.5 * (G_Th + xp.swapaxes(G_Th, -1, -2))
    th_term = T_th * xp.minimum(xp.linalg.eigh(G_Th)[0][..., 0], 0.0)

    # ---- X / W / V coefficient assembly (scatter the minor duals) ----
    mi = sb.minor_idx
    i1, i2, j1, j2 = mi[..., 0], mi[..., 1], mi[..., 2], mi[..., 3]
    fl = (i1 * m + j1, i1 * m + j2, i2 * m + j1, i2 * m + j2)
    coef_X = (
        xp.broadcast_to((-mask * A)[None], (B, n, m)).reshape(B, -1)
        - 2.0 * q.reshape(B, -1)
    )
    coef_W = xp.broadcast_to((0.5 * mask)[None], (B, n, m))
    if xp is np:
        coef_X = coef_X.copy()
        coef_W = coef_W.copy()
    coef_W = (coef_W + mu[:, None, :]).reshape(B, -1)
    bidx = (np.arange(B)[:, None] if xp is np
            else jnp.arange(B)[:, None])
    for fi, col in zip(fl, (1, 2, 3, 4)):
        coef_X = _scatter_add(xp, coef_X, bidx, fi,
                              -2.0 * inv_x * S5[..., 0, col])
        coef_W = _scatter_add(xp, coef_W, bidx, fi,
                              -inv_w * S5[..., col, col])
    sflat = sb.soc_idx[..., 0] * m + sb.soc_idx[..., 1]
    coef_X = _scatter_add(xp, coef_X, bidx, sflat, -inv_x * c_r)
    coef_W = _scatter_add(xp, coef_W, bidx, sflat, -inv_w * b_r)

    zz = (np.zeros if xp is np else
          (lambda s: jnp.zeros(s, dtype=A.dtype)))
    coef_v1 = zz((B, sb.cnt_v1.shape[1]))
    coef_v2 = zz((B, sb.cnt_v2.shape[1]))
    coef_v3 = zz((B, sb.cnt_v3.shape[1]))
    coef_v1 = _scatter_add(xp, coef_v1, bidx, sb.iv1a,
                           -2.0 * inv_w * S5[..., 1, 2])
    coef_v1 = _scatter_add(xp, coef_v1, bidx, sb.iv1b,
                           -2.0 * inv_w * S5[..., 3, 4])
    coef_v2 = _scatter_add(xp, coef_v2, bidx, sb.iv2a,
                           -2.0 * inv_w * S5[..., 1, 3])
    coef_v2 = _scatter_add(xp, coef_v2, bidx, sb.iv2b,
                           -2.0 * inv_w * S5[..., 2, 4])
    coef_v3 = _scatter_add(xp, coef_v3, bidx, sb.iv3,
                           -2.0 * inv_w * (S5[..., 1, 4] + S5[..., 2, 3]))

    # Joint per-coordinate infimum over the kept set
    #   {(X, W): |X| <= R_X, X^2 <= W <= Wmax}
    # of  coef_W * W + coef_X * X.  The model enforces W >= X^2 at EVERY
    # coordinate (RSOC rows on the complement, the [1 X; X W] principal
    # minor of the 5x5 blocks on minor coordinates), and master points
    # have W = X^2 <= 2 gamma ub, so the set is valid.  coef_W > 0 pulls
    # W down to X^2, leaving an exact clamped quadratic in X — the same
    # tightness as the base bound's X-block — instead of the decoupled
    # -R_X * |coef_X| penalty, which amplifies any dual noise by R_X
    # (~1e2 at production scales) on every one of n*m coordinates.
    aW = coef_W
    bX = coef_X
    denom = xp.maximum(aW, 1e-30)
    Xstar = xp.clip(-bX / (2.0 * denom), -R_X, R_X)
    val_pos = aW * Xstar * Xstar + bX * Xstar
    val_neg = aW * Wmax - xp.abs(bX) * R_X
    xw_term = xp.sum(xp.where(aW > 0, val_pos, val_neg), axis=-1)
    v_term = -Vmax * (
        xp.sum(xp.abs(coef_v1), axis=-1)
        + xp.sum(xp.abs(coef_v2), axis=-1)
        + xp.sum(xp.abs(coef_v3), axis=-1)
    )

    sS1 = sS[..., 0] if getattr(sS, "ndim", 0) else sS
    const = (
        0.5 * xp.sum(mask * A * A)
        - sS1 * xp.sum(S5[..., 0, 0], axis=-1)
        - 0.5 * sS1 * xp.sum(a_r, axis=-1)
        - xp.trace(E, axis1=-2, axis2=-1)
        + cut_const
    )

    lb = y_term + u_term + th_term + xw_term + v_term + const
    if margin_rel is None:
        margin_rel = margin_rel_default(xp, A.dtype)
    scale = (
        1.0 + xp.abs(lb) + ub_bar
        + xp.sqrt(xp.sum(S1 * S1, axis=(-2, -1)))
        + xp.sqrt(xp.sum(S2 * S2, axis=(-2, -1)))
        + xp.sqrt(xp.sum(S5 * S5, axis=(-3, -2, -1)))
    )
    return lb - margin_rel * scale


def safe_dual_bound_shor2(xp, A, mask, batch, sb, y1, y2, ya, yb, yc, y5,
                          yr, yl, gamma, ub_bar, sX=1.0, sS=1.0):
    """``(lb_valid, lb_est)``: the margined safe bound plus the unmargined
    value as a float64-tracking exit estimator (measured within ~1e-4
    relative of the host float64 bound on rank-1 Shor instances; the
    driver re-certifies in float64 before acting, so estimator optimism
    costs a requeue, never soundness)."""
    lb = safe_dual_bound_shor(
        xp, A, mask, batch, sb, y1, y2, ya, yb, yc, y5, yr, yl, gamma,
        ub_bar, margin_rel=0.0, sX=sX, sS=sS,
    )
    margin_rel = margin_rel_default(xp, A.dtype)
    # scale recomputation would need the projected multipliers again; a
    # cheap conservative proxy from the raw duals suffices for the margin
    # (||proj_PSD(-y)||_F <= ||y||_F, so the proxy scale >= the true one)
    scale = (
        1.0 + xp.abs(lb) + ub_bar
        + xp.sqrt(xp.sum(y1 * y1, axis=(-2, -1)))
        + xp.sqrt(xp.sum(y2 * y2, axis=(-2, -1)))
        + xp.sqrt(xp.sum(y5 * y5, axis=(-3, -2, -1)))
    )
    return lb - margin_rel * scale, lb


def host_certified_bound_shor(A, mask, batch: NodeBatch, sbh: ShorBatchHost,
                              out: dict, gamma, ub_bar, margin_rel=1e-10):
    """Float64 safe Lagrangian dual bound for the rank-1 Shor relaxation.

    Kept sets (all provably containing the node's master-feasible points
    with objective <= ub_bar): |X| <= R_X, W in [0, 2 gamma ub],
    |V*| <= 2 gamma ub, Y in the spectrahedron, U in the box, Theta PSD
    with trace <= 2 gamma ub.  Multipliers are cone-projected here, so the
    result is valid for any solver state.
    """
    f = lambda a: np.asarray(a, dtype=np.float64)
    hb = NodeBatch(
        cut_x=f(batch.cut_x), cut_lo=f(batch.cut_lo), cut_hi=f(batch.cut_hi),
        cut_mask=f(batch.cut_mask), U_lo=f(batch.U_lo), U_hi=f(batch.U_hi),
    )
    sbf = ShorBatchHost(
        minor_idx=np.asarray(sbh.minor_idx), minor_mask=f(sbh.minor_mask),
        iv1a=np.asarray(sbh.iv1a), iv1b=np.asarray(sbh.iv1b),
        iv2a=np.asarray(sbh.iv2a), iv2b=np.asarray(sbh.iv2b),
        iv3=np.asarray(sbh.iv3), soc_idx=np.asarray(sbh.soc_idx),
        soc_mask=f(sbh.soc_mask), cnt_X=f(sbh.cnt_X), cnt_W=f(sbh.cnt_W),
        cnt_v1=f(sbh.cnt_v1), cnt_v2=f(sbh.cnt_v2), cnt_v3=f(sbh.cnt_v3),
    )
    return safe_dual_bound_shor(
        np, f(A), f(mask), hb, sbf, f(out["y1"]), f(out["y2"]), f(out["ya"]),
        f(out["yb"]), f(out["yc"]), f(out["y5"]), f(out["yr"]), f(out["yl"]),
        float(gamma), float(ub_bar), margin_rel=margin_rel,
        sX=f(out.get("sX", 1.0)), sS=f(out.get("sS", 1.0)),
    )
