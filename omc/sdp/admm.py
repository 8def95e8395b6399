"""Batched ADMM node-relaxation solver — the production bound engine.

Same conic formulation as ``omc.sdp.relax`` (see that module's docstring for
the constraint list and certification theory) but solved with ADMM /
Douglas-Rachford splitting instead of PDHG: per iteration one structured
linear solve plus one projection onto the cone product.  ADMM's implicit
steps give far better tail convergence than PDHG on these ill-conditioned
lifted SDPs — the accuracy regime branch-and-bound pruning needs.

The z-step solves  (Q + rho K'K) z = rhs.  The key structural fact — the
TPU analogue of the reference's Mosek KKT factorisation
(`/root/reference/src/OptimalMatrixCompletion.jl:1859`) — is

    K'K = D + V V'

with D *constant per variable block* (X: 2 sX^2, Y: 3, Theta: sT^2, U: 4)
and V containing only p = 1 + L + L*k structured columns:

    - the trace row           vec(I_n)            in the Y block
    - per cut l: the chord row  -vec(x_l x_l')|Y + (x_l c_l')|U
    - per cut l, coord j: the interval direction sqrt(2) (x_l e_j')|U
      (the lower and upper interval rows share a direction)

so the solve is a Woodbury identity whose p x p Gram matrix has closed-form
entries built from cut-vector inner products — one batched p x p Cholesky
per node batch, reused across all iterations.  Everything is fixed-shape
and vmapped over the node batch.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from omc.ops.cones import project_psd, project_soc
from omc.ops.polar import project_psd_ns, project_psd_ns_merged
from omc.sdp.relax import NodeBatch, safe_dual_bound2

_HI = jax.lax.Precision.HIGHEST


class ADMMState(NamedTuple):
    # w: cone-slot variables; u: scaled duals (y = rho * u in the polar cone)
    w1: jnp.ndarray  # (B, n+m, n+m)
    w2: jnp.ndarray  # (B, n+k, n+k)
    w3: jnp.ndarray  # (B, n, n)
    w4: jnp.ndarray  # (B,)
    wsoc: jnp.ndarray  # (B, k, 1+n)
    wbox: jnp.ndarray  # (B, n, k)
    wa: jnp.ndarray  # (B, L, k)
    wb: jnp.ndarray  # (B, L, k)
    wc: jnp.ndarray  # (B, L)
    u1: jnp.ndarray
    u2: jnp.ndarray
    u3: jnp.ndarray
    u4: jnp.ndarray
    usoc: jnp.ndarray
    ubox: jnp.ndarray
    ua: jnp.ndarray
    ub: jnp.ndarray
    uc: jnp.ndarray
    X: jnp.ndarray  # last primal iterate (scaled), for outputs/warm starts
    Y: jnp.ndarray
    Th: jnp.ndarray
    U: jnp.ndarray
    rho: jnp.ndarray  # (B,) per-node ADMM penalty (adapted in-flight)
    # block variable scales (X = sX * Xs, Theta = sT * Ths), carried as
    # per-slot RUNTIME data rather than trace-time constants so ONE
    # compiled program per (n, m, k, L, B) serves EVERY instance — the
    # persistent compile cache hits across problems (round-4 verdict:
    # instance-baked scales made every program instance-specific)
    sX: jnp.ndarray  # (B,)
    sT: jnp.ndarray  # (B,)
    # uniform weight of the (rescaled) Shor constraint rows — the ADMM
    # coupling strength of the 5x5/XWH/RSOC slots relative to the core
    # cones (scaling a constraint row by b is equivalent to giving it
    # penalty rho*b^2; a UNIFORM b keeps the slot entries equilibrated,
    # unlike the pre-r5 implicit diag(1, sX, .., sX^2) weighting).  Unused
    # by the base solver; read by the Shor solver families.
    sS: jnp.ndarray  # (B,)


def init_admm_state(B, n, m, k, L, dtype=jnp.float32, *, sX=1.0, sT=1.0,
                    sS=1.0, X0=None, Y0=None, Th0=None, U0=None,
                    rho: float = 0.02) -> ADMMState:
    z = lambda *s: jnp.zeros(s, dtype=dtype)

    def prim(val, shape, scale):
        if val is None:
            return z(*shape)
        s = jnp.asarray(scale, dtype)
        if s.ndim:  # (B,) per-slot scales -> (B, 1, ..., 1)
            s = s.reshape(s.shape + (1,) * (len(shape) - s.ndim))
        return jnp.broadcast_to(jnp.asarray(val, dtype=dtype) / s, shape)

    return ADMMState(
        w1=z(B, n + m, n + m), w2=z(B, n + k, n + k), w3=z(B, n, n), w4=z(B),
        wsoc=z(B, k, 1 + n), wbox=z(B, n, k), wa=z(B, L, k), wb=z(B, L, k),
        wc=z(B, L),
        u1=z(B, n + m, n + m), u2=z(B, n + k, n + k), u3=z(B, n, n), u4=z(B),
        usoc=z(B, k, 1 + n), ubox=z(B, n, k), ua=z(B, L, k), ub=z(B, L, k),
        uc=z(B, L),
        X=prim(X0, (B, n, m), sX), Y=prim(Y0, (B, n, n), 1.0),
        Th=prim(Th0, (B, m, m), sT), U=prim(U0, (B, n, k), 1.0),
        rho=jnp.full((B,), rho, dtype=dtype),
        sX=jnp.broadcast_to(jnp.asarray(sX, dtype), (B,)),
        sT=jnp.broadcast_to(jnp.asarray(sT, dtype), (B,)),
        sS=jnp.broadcast_to(jnp.asarray(sS, dtype), (B,)),
    )


def set_slot_rho(state: ADMMState, rho_new) -> ADMMState:
    """Re-target per-slot penalties (the rho-portfolio driver path).

    The state stores *scaled* duals u = y / rho; changing a slot's rho
    while preserving the underlying duals y requires u *= rho_old/rho_new.
    The Woodbury z-step is rho-free (see ``_gram1``), so no refactorisation
    happens — this is a pure elementwise rescale."""
    rho_new = jnp.asarray(rho_new, state.rho.dtype)
    r = state.rho / rho_new
    r3 = r[:, None, None]
    return state._replace(
        u1=state.u1 * r3, u2=state.u2 * r3, u3=state.u3 * r3,
        u4=state.u4 * r, usoc=state.usoc * r3, ubox=state.ubox * r3,
        ua=state.ua * r3, ub=state.ub * r3, uc=state.uc * r[:, None],
        rho=jnp.broadcast_to(rho_new, state.rho.shape),
    )


def _forward(batch: NodeBatch, Xs, Y, Ths, U, k, sX, sT):
    """Affine slot map (with constants), including the U box slot."""
    X = sX * Xs
    Th = sT * Ths
    Xt = jnp.swapaxes(X, -1, -2)
    Ut = jnp.swapaxes(U, -1, -2)
    n = Y.shape[-1]
    w1 = jnp.concatenate(
        [jnp.concatenate([Y, X], axis=-1), jnp.concatenate([Xt, Th], axis=-1)],
        axis=-2,
    )
    eye_k = jnp.eye(k, dtype=U.dtype)
    w2 = jnp.concatenate(
        [
            jnp.concatenate([Y, U], axis=-1),
            jnp.concatenate(
                [Ut, jnp.broadcast_to(eye_k, Ut.shape[:-2] + (k, k))], axis=-1
            ),
        ],
        axis=-2,
    )
    w3 = jnp.eye(n, dtype=Y.dtype) - Y
    w4 = k - jnp.trace(Y, axis1=-2, axis2=-1)
    ones = jnp.ones(U.shape[:-2] + (k, 1), dtype=U.dtype)
    wsoc = jnp.concatenate([ones, Ut], axis=-1)
    wbox = U
    v = jnp.einsum("bln,bnk->blk", batch.cut_x, U, precision=_HI)
    wa = v - batch.cut_lo
    wb = batch.cut_hi - v
    c = batch.cut_lo + batch.cut_hi
    bconst = jnp.sum(-batch.cut_lo * batch.cut_hi, axis=-1)
    xYx = jnp.einsum("bln,bnp,blp->bl", batch.cut_x, Y, batch.cut_x, precision=_HI)
    wc = jnp.sum(c * v, axis=-1) + bconst - xYx
    return w1, w2, w3, w4, wsoc, wbox, wa, wb, wc


def _adjoint(batch: NodeBatch, y1, y2, y3, y4, ysoc, ybox, ya, yb, yc,
             n, m, k, sX, sT):
    gX = sX * 2.0 * y1[..., :n, n:]
    gY = (
        y1[..., :n, :n]
        + y2[..., :n, :n]
        - y3
        - y4[..., None, None] * jnp.eye(n, dtype=y3.dtype)
        - jnp.einsum("bl,bln,blp->bnp", yc, batch.cut_x, batch.cut_x, precision=_HI)
    )
    gTh = sT * y1[..., n:, n:]
    c = batch.cut_lo + batch.cut_hi
    coef = ya - yb + yc[..., None] * c
    gU = (
        2.0 * y2[..., :n, n:]
        + jnp.swapaxes(ysoc[..., 1:], -1, -2)
        + ybox
        + jnp.einsum("bln,blk->bnk", batch.cut_x, coef, precision=_HI)
    )
    return gX, gY, gTh, gU


def _gram1(batch: NodeBatch, k, dtype):
    """rho-independent Woodbury Gram G1 = I + V' D1^-1 V, (B, p, p) with
    p = 1 + L + L*k and D1 the per-block K'K diagonal (Y: 3, U: 4).
    Column order: [trace | chord rows l=1..L | interval directions (l, j)
    row-major].

    Since the objective Hessian Q is zero on the Y and U blocks,
    D = rho * D1 there, so (I/rho + V' D^-1 V)^{-1} = rho * G1^{-1}:
    one Cholesky of G1 serves every per-node penalty rho — adaptive
    (residual-balancing) rho needs NO refactorisation."""
    B, L = batch.cut_mask.shape
    n = batch.cut_x.shape[-1]
    cm = batch.cut_mask
    x = batch.cut_x * cm[..., None]  # zero padded cuts
    c = (batch.cut_lo + batch.cut_hi) * cm[..., None]
    XX = jnp.einsum("bln,bpn->blp", x, x)  # (B, L, L) x_l . x_p
    CC = jnp.einsum("blk,bpk->blp", c, c)
    p = 1 + L + L * k
    G = jnp.zeros((B, p, p), dtype=dtype)
    iY = 1.0 / 3.0
    iU = 1.0 / 4.0
    # trace-trace: <I, I> = n in Y-block
    G = G.at[:, 0, 0].set(n * iY)
    # trace-chord: <I, -x x'> = -|x|^2
    tc = -jnp.einsum("bll->bl", XX) * iY
    G = G.at[:, 0, 1 : 1 + L].set(tc)
    G = G.at[:, 1 : 1 + L, 0].set(tc)
    # chord-chord: (x_l.x_p)^2 / dY + (x_l.x_p)(c_l.c_p) / dU
    G = G.at[:, 1 : 1 + L, 1 : 1 + L].set(XX * XX * iY + XX * CC * iU)
    # chord-direction: <x_l c_l', sqrt2 x_p e_j'> = sqrt2 (x_l.x_p) c_l[j]
    cd = jnp.sqrt(2.0) * jnp.einsum("blp,blk->blpk", XX, c) * iU
    G = G.at[:, 1 : 1 + L, 1 + L :].set(cd.reshape(B, L, L * k))
    G = G.at[:, 1 + L :, 1 : 1 + L].set(
        jnp.swapaxes(cd.reshape(B, L, L * k), -1, -2)
    )
    # direction-direction: 2 (x_l.x_p) delta_jj' / dU
    eye_k = jnp.eye(k, dtype=dtype)
    dd = 2.0 * jnp.einsum("blp,jk->bljpk", XX, eye_k) * iU
    G = G.at[:, 1 + L :, 1 + L :].set(dd.reshape(B, L * k, L * k))
    G = G + jnp.eye(p, dtype=dtype)
    return G


def _Vt_apply(batch: NodeBatch, rY, rU, k):
    """V' r for the structured columns; rY (B,n,n), rU (B,n,k) -> (B,p)."""
    cm = batch.cut_mask
    x = batch.cut_x * cm[..., None]
    c = (batch.cut_lo + batch.cut_hi) * cm[..., None]
    B, L = cm.shape
    t0 = jnp.trace(rY, axis1=-2, axis2=-1)[:, None]  # (B,1)
    xrx = jnp.einsum("bln,bnp,blp->bl", x, rY, x)
    xru = jnp.einsum("bln,bnk->blk", x, rU)  # (B, L, k)
    chord = -xrx + jnp.einsum("blk,blk->bl", c, xru)
    dirs = jnp.sqrt(2.0) * xru.reshape(B, L * k)
    return jnp.concatenate([t0, chord, dirs], axis=-1)


def _V_apply(batch: NodeBatch, s, n, k):
    """V s: (B,p) -> (rY (B,n,n), rU (B,n,k))."""
    cm = batch.cut_mask
    x = batch.cut_x * cm[..., None]
    c = (batch.cut_lo + batch.cut_hi) * cm[..., None]
    B, L = cm.shape
    s0 = s[:, 0]
    sch = s[:, 1 : 1 + L]  # (B, L)
    sdir = s[:, 1 + L :].reshape(B, L, k)
    rY = s0[:, None, None] * jnp.eye(n, dtype=s.dtype) - jnp.einsum(
        "bl,bln,blp->bnp", sch, x, x
    )
    rU = jnp.einsum("bl,bln,blk->bnk", sch, x, c) + jnp.sqrt(2.0) * jnp.einsum(
        "bln,blk->bnk", x, sdir
    )
    return rY, rU


def make_admm_solver(n: int, m: int, k: int, L: int, gamma: float, *,
                     iters: int = 400, dtype=jnp.float32, rho: float = 1.0,
                     alpha: float = 1.6,
                     psd_method: str = "auto", jit: bool = True,
                     adapt_rho: bool = False, check_every: int = 2000,
                     halpern: bool = False, ema_iters: int = 1500):
    """Build the jitted batched ADMM solver with the same interface as
    ``omc.sdp.relax.make_solver`` (state type differs).

    ``psd_method``: "ns" (Newton-Schulz polar, matmul-only — the fast TPU
    path), "eigh" (exact), or "auto" (ns for float32, eigh for float64).

    ``check_every``: on-device certification cadence — when the caller
    passes per-slot bound targets, the safe Lagrangian dual bound is
    evaluated on device every ``check_every`` iterations and the loop
    exits as soon as every live node's target is cleared (no host round
    trip, no wasted tail iterations)."""
    if psd_method == "auto":
        psd_method = "eigh" if dtype == jnp.float64 else "ns"
    proj = project_psd_ns if psd_method == "ns" else project_psd

    def solve(A, mask, batch: NodeBatch, ub_bar, state: ADMMState,
              n_iters=None, target=None, group=None):
        """``n_iters`` (optional, traced): runtime iteration budget — the
        loop bound is dynamic, so one compiled program serves any budget
        (the driver raises it when the frontier underfills the batch,
        concentrating device time on the live nodes).

        ``target`` (optional, (B,)): per-slot certified-bound target; the
        loop stops early once every group's best on-device safe bound
        clears its target (-inf slots are treated as already cleared).
        ``group`` ((B,) int32): slot -> node grouping for the rho
        portfolio — a node is done when ANY of its replica slots clears."""
        ni = jnp.asarray(iters if n_iters is None else n_iters, jnp.int32)
        A = A.astype(dtype)
        mask = mask.astype(dtype)
        B = batch.cut_mask.shape[0]
        cm = batch.cut_mask
        # block variable scales: per-slot runtime data from the state (see
        # ADMMState.sX) — every use below broadcasts over the batch axis
        sX = state.sX[:, None, None]
        sT = state.sT[:, None, None]
        # static merge decision (see the w-step): latency-bound iff the
        # per-matmul work is below ~the launch-latency x MXU-rate product
        merge_psd = psd_method == "ns" and B * (n + m) ** 3 <= int(1e8)

        G1 = _gram1(batch, k, dtype)
        G1c = jax.lax.linalg.cholesky(G1)

        # linear objective coefficients (per-slot through the scales)
        cX = -sX * (mask * A)[None]  # (B, n, m)
        cTh = (sT * 0.5 / gamma) * jnp.eye(m, dtype=dtype)[None]

        # constant slot offsets b (affine part of the forward map)
        zeros = (jnp.zeros((B, n, m), dtype), jnp.zeros((B, n, n), dtype),
                 jnp.zeros((B, m, m), dtype), jnp.zeros((B, n, k), dtype))
        offs = _forward(batch, *zeros, k, sX, sT)

        def solve_z(rho_b, rY_rhs, rX_rhs, rTh_rhs, rU_rhs):
            """(Q + rho K'K)^{-1} rhs via the rho-free Woodbury identity
            (see _gram1); rho_b is the per-node penalty (B,)."""
            r3 = rho_b[:, None, None]
            dX = mask[None] * (sX * sX) + r3 * 2.0 * sX * sX
            zX = rX_rhs / dX
            zY = rY_rhs / (3.0 * r3)
            zTh = rTh_rhs / (r3 * sT * sT)
            zU = rU_rhs / (4.0 * r3)
            s = _Vt_apply(batch, zY, zU, k)  # (B, p)
            t = rho_b[:, None] * jax.scipy.linalg.cho_solve(
                (G1c, True), s[..., None]
            )[..., 0]
            vY, vU = _V_apply(batch, t, n, k)
            zY = zY - vY / (3.0 * r3)
            zU = zU - vU / (4.0 * r3)
            return zX, zY, zTh, zU

        if halpern:
            # Halpern anchor: the fixed-point variable s = w + u of the
            # relaxed DR map at the warm start.  The iteration becomes
            # s_{k+1} = b_k s_0 + (1 - b_k) T(s_k), b_k = 1/(k+2) — the
            # anchored (HPR-style) scheme with an O(1/k) residual rate;
            # the (w, u) pair stays the proj-split of s, so per-iteration
            # cost is unchanged.
            anchors = (
                state.w1 + state.u1, state.w2 + state.u2,
                state.w3 + state.u3, state.w4 + state.u4,
                state.wsoc + state.usoc, state.wbox + state.ubox,
                state.wa + state.ua, state.wb + state.ub,
                state.wc + state.uc,
            )

        def body(it, st: ADMMState):
            rho_b = st.rho
            r3 = rho_b[:, None, None]
            # ---- z-step ----
            rX, rY, rTh, rU = _adjoint(
                batch,
                st.w1 - st.u1 - offs[0], st.w2 - st.u2 - offs[1],
                st.w3 - st.u3 - offs[2], st.w4 - st.u4 - offs[3],
                st.wsoc - st.usoc - offs[4], st.wbox - st.ubox - offs[5],
                (st.wa - st.ua - offs[6]) * cm[..., None],
                (st.wb - st.ub - offs[7]) * cm[..., None],
                (st.wc - st.uc - offs[8]) * cm,
                n, m, k, sX, sT,
            )
            Xs, Y, Ths, U = solve_z(
                rho_b, r3 * rY, r3 * rX - cX, r3 * rTh - cTh,
                r3 * rU,
            )
            Y = 0.5 * (Y + jnp.swapaxes(Y, -1, -2))
            Ths = 0.5 * (Ths + jnp.swapaxes(Ths, -1, -2))

            # ---- w-step (over-relaxed) + u-step ----
            f = _forward(batch, Xs, Y, Ths, U, k, sX, sT)

            def relax_mix(fz, w):
                return alpha * fz + (1.0 - alpha) * w

            if halpern:
                beta = 1.0 / (it.astype(dtype) + 2.0)

                def hal(t, a):
                    return beta * a + (1.0 - beta) * t
            else:
                def hal(t, a):
                    return t

            t1 = hal(relax_mix(f[0], st.w1) + st.u1, anchors[0] if halpern else None)
            t2 = hal(relax_mix(f[1], st.w2) + st.u2, anchors[1] if halpern else None)
            t3 = hal(relax_mix(f[2], st.w3) + st.u3, anchors[2] if halpern else None)
            if merge_psd:
                # one merged sign-schedule run for all three PSD blocks: a
                # third of the serial matmul chain for ~2x padded flops.
                # Wins when the iteration is LATENCY-bound (small batch x
                # block size); at large B*(n+m)^3 the matmuls are
                # flop-bound and padding to the largest block wastes
                # real throughput, so the blocks project separately
                w1, w2, w3 = project_psd_ns_merged([t1, t2, t3])
            else:
                w1, w2, w3 = proj(t1), proj(t2), proj(t3)
            u1 = t1 - w1
            u2 = t2 - w2
            u3 = t3 - w3
            t4 = hal(relax_mix(f[3], st.w4) + st.u4, anchors[3] if halpern else None)
            w4 = jnp.maximum(t4, 0.0)
            u4 = t4 - w4
            tsoc = hal(relax_mix(f[4], st.wsoc) + st.usoc, anchors[4] if halpern else None)
            pt, pw = project_soc(tsoc[..., 0], tsoc[..., 1:])
            wsoc = jnp.concatenate([pt[..., None], pw], axis=-1)
            usoc = tsoc - wsoc
            tbox = hal(relax_mix(f[5], st.wbox) + st.ubox, anchors[5] if halpern else None)
            wbox = jnp.clip(tbox, batch.U_lo, batch.U_hi)
            ubox = tbox - wbox
            ta = hal(relax_mix(f[6], st.wa) + st.ua, anchors[6] if halpern else None)
            wa = jnp.maximum(ta, 0.0)
            ua = (ta - wa) * cm[..., None]
            tb = hal(relax_mix(f[7], st.wb) + st.ub, anchors[7] if halpern else None)
            wb = jnp.maximum(tb, 0.0)
            ub = (tb - wb) * cm[..., None]
            tc = hal(relax_mix(f[8], st.wc) + st.uc, anchors[8] if halpern else None)
            wc = jnp.maximum(tc, 0.0)
            uc = (tc - wc) * cm

            # ---- per-node adaptive penalty (residual balancing) ----
            # Opt-in: on these lifted relaxations the standard balancing
            # rule (raise rho on large primal residual) was measured to
            # hurt — they converge best with small, size-scaled rho — so
            # the default keeps rho fixed per node (still carried in the
            # state so warm-started visits keep their penalty).
            if adapt_rho:
                def sq(a):
                    return jnp.sum(a * a, axis=tuple(range(1, a.ndim)))

                news = (w1, w2, w3, w4, wsoc, wbox, wa, wb, wc)
                olds = (st.w1, st.w2, st.w3, st.w4, st.wsoc, st.wbox,
                        st.wa, st.wb, st.wc)
                rp = jnp.sqrt(sum(sq(fc - wn) for fc, wn in zip(f, news)))
                rd = rho_b * jnp.sqrt(
                    sum(sq(wn - wo) for wn, wo in zip(news, olds))
                )
                factor = jnp.where(rp > 5.0 * rd, 2.0,
                                   jnp.where(rd > 5.0 * rp, 0.5, 1.0))
                factor = jnp.where((it + 1) % 50 == 0, factor, 1.0)
                rho_new = jnp.clip(rho_b * factor, 1e-4, 100.0)
            else:
                rho_new = rho_b
            resc = (rho_b / rho_new)
            r3n = resc[:, None, None]

            return ADMMState(
                w1=w1, w2=w2, w3=w3, w4=w4, wsoc=wsoc, wbox=wbox,
                wa=wa, wb=wb, wc=wc,
                u1=u1 * r3n, u2=u2 * r3n, u3=u3 * r3n, u4=u4 * resc,
                usoc=usoc * r3n, ubox=ubox * r3n,
                ua=ua * r3n, ub=ub * r3n, uc=uc * resc[:, None],
                X=Xs, Y=Y, Th=Ths, U=U, rho=rho_new,
                sX=st.sX, sT=st.sT, sS=st.sS,
            )

        # EMA-averaged dual output with best-chunk tracking: low-precision
        # ADMM iterates wander around the fixed point with a
        # multi-thousand-iteration oscillation period (measured ~1e-3 bound
        # swing on the 50x50 root even past 30k iterations), so (a) duals
        # are tail-averaged with a bias-corrected EMA over ~ema_iters
        # iterations — decoupling the averaging length from the exit
        # cadence ``check_every`` — and (b) the duals of the BEST chunk so
        # far (by the float64-tracking estimator) are carried as the
        # output, so the returned bound is the trajectory's peak rather
        # than luck-of-the-stop-point.  The average of dual iterates is
        # itself a perfectly valid input to the safe bound.  When per-slot
        # ``target`` bounds are given, the loop exits as soon as every
        # live node group's best estimate clears its target.
        B = batch.cut_mask.shape[0]
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

        # derive the accumulators from state fields so they inherit any
        # manual (shard_map) axis annotations
        def zero_acc():
            return (
                jnp.zeros_like(state.u1), jnp.zeros_like(state.u2),
                jnp.zeros_like(state.ua), jnp.zeros_like(state.ub),
                jnp.zeros_like(state.uc),
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
                rb3 = st_i.rho[:, None, None]
                acc = (
                    acc[0] + beta * (rb3 * st_i.u1 - acc[0]),
                    acc[1] + beta * (rb3 * st_i.u2 - acc[1]),
                    acc[2] + beta * (rb3 * st_i.ua - acc[2]),
                    acc[3] + beta * (rb3 * st_i.ub - acc[3]),
                    acc[4] + beta * (st_i.rho[:, None] * st_i.uc - acc[4]),
                )
                return st_i, acc

            st, ema = jax.lax.fori_loop(0, chunk, body_acc, (st, ema))
            # bias correction (the EMA starts from zero duals)
            corr = 1.0 - (1.0 - beta) ** (it + chunk).astype(dtype)
            inv = 1.0 / jnp.maximum(corr, beta)
            ybar = tuple(inv * a for a in ema)
            # full-f32 matmuls for the bound evaluation only: TPU default
            # (bf16 passes) costs ~84 absolute on a 250x250 frontier bound
            # of ~400 — measured against a host recompute from the SAME
            # duals, where honest f32 agrees with f64 to ~1.5.  The check
            # runs once per chunk (every check_every iterations), so the
            # 3x matmul cost here is invisible next to the ADMM body.
            with jax.default_matmul_precision("float32"):
                lb, lb_est = safe_dual_bound2(
                    jnp, A, mask, batch, ybar[0], ybar[1], ybar[2], ybar[3],
                    ybar[4], gamma, k, ub_bar,
                )
            # per-slot best-chunk tracking by the estimator (early-exit
            # decisions use the ESTIMATOR: it tracks the host float64
            # bound to ~1e-2 where the margined float32 bound sits ~1e-1
            # low and never fires; the driver re-certifies in float64
            # before closing a node, so a rare optimistic fire costs one
            # requeue, never soundness)
            b_ybar, b_lb, b_est = best
            take = lb_est > b_est
            t3 = take[:, None, None]
            b_ybar = (
                jnp.where(t3, ybar[0], b_ybar[0]),
                jnp.where(t3, ybar[1], b_ybar[1]),
                jnp.where(t3, ybar[2], b_ybar[2]),
                jnp.where(t3, ybar[3], b_ybar[3]),
                jnp.where(take[:, None], ybar[4], b_ybar[4]),
            )
            b_lb = jnp.where(take, lb, b_lb)
            b_est = jnp.where(take, lb_est, b_est)
            if with_target:
                cleared = b_est >= target
                gmax = jnp.zeros((B,), bool).at[group].max(cleared)
                done = jnp.all(gmax[group] | cleared)
            return st, ema, (b_ybar, b_lb, b_est), it + chunk, done

        # derive lb/done inits from state leaves so they inherit the
        # shard_map "varying over nodes" annotation (a literal jnp.full /
        # jnp.asarray is replicated and trips the while_loop carry check)
        lb0 = jnp.zeros_like(state.rho) - jnp.inf
        done0 = jnp.all(state.rho == jnp.inf)  # False, but varying-typed
        carry0 = (
            state, zero_acc(), (zero_acc(), lb0, lb0),
            jnp.asarray(0, jnp.int32), done0,
        )
        state, _, (ybar, lb_dev, lb_est), iters_run, _ = jax.lax.while_loop(
            outer_cond, outer_body, carry0
        )

        Msep = jnp.einsum("bik,bjk->bij", state.U, state.U) - state.Y
        Msep = 0.5 * (Msep + jnp.swapaxes(Msep, -1, -2))
        sep_w, sep_V = jnp.linalg.eigh(Msep)
        out = {
            "X": sX * state.X, "Y": state.Y, "Th": sT * state.Th, "U": state.U,
            "y1": ybar[0], "y2": ybar[1],
            "ya": ybar[2], "yb": ybar[3], "yc": ybar[4],
            # the last chunk's on-device safe bound (compute-dtype, with
            # the dtype-scaled safety margin) — the driver's screening
            # bound at large batch sizes
            "lb_dev": lb_dev,
            # float64-tracking estimator (NOT a sound bound; see
            # safe_dual_bound2) — binding-slot selection + exit telemetry
            "lb_est": lb_est,
            "iters_run": jnp.zeros_like(state.rho if hasattr(state, "rho") else state.core.rho, dtype=jnp.int32) + iters_run,
            "sep_w": sep_w[..., :2], "sep_V": sep_V[..., :, :2],
        }
        return state, out

    return jax.jit(solve) if jit else solve
