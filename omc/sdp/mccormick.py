"""Batched ADMM solver for the McCormick-path node relaxation.

TPU-native replacement for the reference's McCormick (``use_disjunctive_cuts
= false``) variant of the node SDP relaxation
(`/root/reference/src/OptimalMatrixCompletion.jl:1686-1753`) and its
box-feasibility pre-check (`1294-1429`).  The relaxation is the core conic
model (M1 = [Y X; X' Th] PSD, M2 = [Y U; U' I] PSD, I - Y PSD, tr(Y) <= k,
U box, column SOCs) plus lifted bilinear variables ``t[i, p]`` ~
``U[i, j1] * U[i, j2]`` for the q = k(k+1)/2 upper-triangular pairs
p = (j1 <= j2), with

    - four McCormick envelope inequalities per (i, p) built from the node's
      U box (reference lines 1688-1723),
    - orthogonality rows  sum_i t[i, p] = delta_{j1 j2}  (lines 1726-1748;
      ``orthogonality_tolerance`` = 0, the reference default).

Unlike the disjunctive-cuts path there is no ragged cut dimension: one
compiled program serves the entire B&B run.

z-step structure (the Woodbury analogue of ``omc.sdp.admm``): K'K is block
separable across X / Y / Theta / (U, t).  On (U, t) it is block diagonal
over the n rows — each row couples (U[i, :], t[i, :]) through the four
McCormick directions — plus a rank-q correction from the orthogonality
rows (the all-ones direction over i per pair p).  So the solve is a batched
(B, n) Cholesky of (k+q) x (k+q) row blocks + a batched q x q Woodbury,
both rho-free (factor once per node batch, reuse every iteration).

Certification follows ``omc.sdp.relax.safe_dual_bound``: the partial
Lagrangian dual is evaluated in closed form over kept sets.  The new ``t``
block is minimised over the valid box [min corner product, max corner
product] — a bilinear form on a rectangle attains its extremes at corners,
so every master-feasible point of the node (which extends to t = U_j1 U_j2,
satisfying all McCormick rows and, with U'U = I, the orthogonality rows
exactly) lies inside the kept set, making the bound sound at any solver
accuracy.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from omc.ops.cones import project_psd, project_soc
from omc.ops.polar import project_psd_ns

_HI = jax.lax.Precision.HIGHEST


def pair_indices(k: int):
    """Upper-triangular pair index arrays (J1, J2), each (q,)."""
    pairs = [(j1, j2) for j1 in range(k) for j2 in range(j1, k)]
    J1 = np.asarray([p[0] for p in pairs], dtype=np.int32)
    J2 = np.asarray([p[1] for p in pairs], dtype=np.int32)
    return J1, J2


def mccormick_coeffs(U_lo, U_hi, J1, J2, xp=jnp):
    """Per-row envelope coefficients.

    Returns (s, c1, c2, d), each (..., 4, n, q): the four rows expressed as
        w_r = s_r * t + c1_r * U[:, j1] + c2_r * U[:, j2] + d_r  >= 0
    matching reference rows at lines 1688-1723:
        r0: t - lo2 U1 - lo1 U2 + lo1 lo2 >= 0
        r1: t - hi2 U1 - hi1 U2 + hi1 hi2 >= 0
        r2: -t + hi2 U1 + lo1 U2 - lo1 hi2 >= 0
        r3: -t + lo2 U1 + hi1 U2 - hi1 lo2 >= 0
    """
    lo1 = U_lo[..., :, J1]  # (..., n, q)
    lo2 = U_lo[..., :, J2]
    hi1 = U_hi[..., :, J1]
    hi2 = U_hi[..., :, J2]
    s = xp.stack(
        [xp.ones_like(lo1), xp.ones_like(lo1), -xp.ones_like(lo1), -xp.ones_like(lo1)],
        axis=-3,
    )
    c1 = xp.stack([-lo2, -hi2, hi2, lo2], axis=-3)
    c2 = xp.stack([-lo1, -hi1, lo1, hi1], axis=-3)
    d = xp.stack([lo1 * lo2, hi1 * hi2, -lo1 * hi2, -hi1 * lo2], axis=-3)
    return s, c1, c2, d


def t_corner_box(U_lo, U_hi, J1, J2, xp=jnp):
    """Valid kept-set box for t: corner products of the U box."""
    cands = xp.stack(
        [
            U_lo[..., :, J1] * U_lo[..., :, J2],
            U_lo[..., :, J1] * U_hi[..., :, J2],
            U_hi[..., :, J1] * U_lo[..., :, J2],
            U_hi[..., :, J1] * U_hi[..., :, J2],
        ],
        axis=0,
    )
    return cands.min(axis=0), cands.max(axis=0)


def mccormick_box_feasible(U_lower: np.ndarray, U_upper: np.ndarray,
                           tol: float = 0.0) -> bool:
    """Sound interval-arithmetic necessary condition for the reference's
    relaxation-feasibility model (lines 1294-1429): each orthogonality row
    sum_i t[i, p] = delta_p must be attainable with every t[i, p] inside
    its McCormick envelope's implied interval (which equals the corner
    box).  Also checks the column SOC |U_j| <= 1 against the box's minimum
    norm.  Returns False only when the node is certainly infeasible."""
    n, k = U_lower.shape
    J1, J2 = pair_indices(k)
    t_lo, t_hi = t_corner_box(U_lower, U_upper, J1, J2, xp=np)
    delta = (J1 == J2).astype(np.float64)
    lo_sum = t_lo.sum(axis=0)
    hi_sum = t_hi.sum(axis=0)
    if np.any(lo_sum > delta + tol + 1e-12) or np.any(hi_sum < delta - tol - 1e-12):
        return False
    # column SOC: min ||U_j||^2 over the box must be <= 1
    closest = np.clip(0.0, U_lower, U_upper)
    if np.any(np.sum(closest**2, axis=0) > 1.0 + 1e-12):
        return False
    return True


def mccormick_lp_feasible(U_lower: np.ndarray, U_upper: np.ndarray,
                          max_soc_rounds: int = 6) -> bool:
    """Exact feasibility of the reference's relaxation-feasibility model
    (`/root/reference/src/OptimalMatrixCompletion.jl:1294-1429`) including
    the column-SOC rows ``|U_j| <= 1`` (reference lines 1406-1413) via
    Kelley outer-approximation: the base LP is solved, every violated
    column norm generates the supporting cut ``(U_j*/|U_j*|)' U_j <= 1``
    (valid for the SOC, so an infeasible cut-extended LP is a sound
    infeasibility certificate for the full conic model), and the LP is
    re-solved — up to ``max_soc_rounds`` rounds.  A surviving feasible
    point within norm tolerance (or round exhaustion) returns True, the
    sound direction.

    Variables: U (n*k, box bounds) and t (n*q, free); constraints: the four
    McCormick envelope rows per (i, j1 <= j2) linking t to the SHARED U
    entries, the orthogonality equalities sum_i t[i, p] = delta_p, and the
    accumulated SOC cuts.  Solved with scipy's HiGHS (the host-native
    analogue of the reference's Mosek feasibility model)."""
    from scipy.optimize import linprog
    from scipy.sparse import coo_matrix

    U_lower = np.asarray(U_lower, np.float64)
    U_upper = np.asarray(U_upper, np.float64)
    n, k = U_lower.shape
    J1, J2 = pair_indices(k)
    q = len(J1)
    s, c1, c2, d = mccormick_coeffs(U_lower, U_upper, J1, J2, xp=np)
    # variable layout: [U (n*k) | t (n*q)]
    nv = n * k + n * q
    rows, cols, vals = [], [], []
    rhs = []
    r = 0
    for rr in range(4):  # four envelope rows, as -w_r <= 0
        for p in range(q):
            for i in range(n):
                rows += [r, r, r]
                cols += [n * k + p * n + i, i * k + int(J1[p]),
                         i * k + int(J2[p])]
                vals += [-s[rr, i, p], -c1[rr, i, p], -c2[rr, i, p]]
                rhs.append(d[rr, i, p])
                r += 1
    b_ub = list(rhs)
    # orthogonality equalities
    rows_e, cols_e, vals_e = [], [], []
    for p in range(q):
        for i in range(n):
            rows_e.append(p)
            cols_e.append(n * k + p * n + i)
            vals_e.append(1.0)
    A_eq = coo_matrix((vals_e, (rows_e, cols_e)), shape=(q, nv))
    b_eq = (J1 == J2).astype(np.float64)
    t_lo, t_hi = t_corner_box(U_lower, U_upper, J1, J2, xp=np)
    bounds = [
        (U_lower[i, j], U_upper[i, j]) for i in range(n) for j in range(k)
    ] + [
        (t_lo[i, p] - 1e-9, t_hi[i, p] + 1e-9)
        for p in range(q) for i in range(n)
    ]
    cost = np.zeros(nv)
    for _ in range(max(0, max_soc_rounds) + 1):
        A_ub = coo_matrix((vals, (rows, cols)), shape=(r, nv))
        res = linprog(
            cost, A_ub=A_ub, b_ub=np.asarray(b_ub), A_eq=A_eq, b_eq=b_eq,
            bounds=bounds, method="highs",
        )
        if res.status == 2:  # infeasible — sound certificate
            return False
        if res.x is None:
            return True  # solver trouble: fail open (sound direction)
        U_star = np.asarray(res.x[: n * k]).reshape(n, k)
        norms = np.sqrt(np.sum(U_star * U_star, axis=0))
        viol = np.where(norms > 1.0 + 1e-7)[0]
        if viol.size == 0:
            return True  # feasible for the SOC-coupled model
        for j in viol:  # supporting-hyperplane cut g' U_j <= 1
            g = U_star[:, j] / norms[j]
            for i in range(n):
                rows.append(r)
                cols.append(i * k + int(j))
                vals.append(g[i])
            b_ub.append(1.0)
            r += 1
    return True  # rounds exhausted without a certificate: fail open


def master_feasible_mccormick(Y, U, X, Th, *, orthogonality_tolerance=0.0,
                              projection_tolerance=1e-6,
                              lifted_variable_tolerance=1e-6) -> bool:
    """Host float64 master-feasibility check, McCormick branch of the
    reference's ``matrix_completion_master_feasible`` (lines 1278-1291)."""
    Y = np.asarray(Y, np.float64)
    U = np.asarray(U, np.float64)
    X = np.asarray(X, np.float64)
    Th = np.asarray(Th, np.float64)
    k = U.shape[1]
    if not np.all(np.abs(U.T @ U - np.eye(k)) <= orthogonality_tolerance + 1e-12):
        return False
    if np.trace(Y) > k + 1e-12:
        return False
    M = 0.5 * ((Y - U @ U.T) + (Y - U @ U.T).T)
    if np.linalg.eigvalsh(M)[0] < -projection_tolerance:
        return False
    M1 = np.block([[Y, X], [X.T, Th]])
    M1 = 0.5 * (M1 + M1.T)
    if np.linalg.eigvalsh(M1)[0] < -lifted_variable_tolerance:
        return False
    return True


class MCBatch(NamedTuple):
    """Per-node data for the McCormick relaxation (box bounds only)."""

    U_lo: jnp.ndarray  # (B, n, k)
    U_hi: jnp.ndarray  # (B, n, k)


class MCState(NamedTuple):
    # cone-slot variables w, scaled duals u, last primal iterate
    w1: jnp.ndarray  # (B, n+m, n+m)
    w2: jnp.ndarray  # (B, n+k, n+k)
    w3: jnp.ndarray  # (B, n, n)
    w4: jnp.ndarray  # (B,)
    wsoc: jnp.ndarray  # (B, k, 1+n)
    wbox: jnp.ndarray  # (B, n, k)
    wmc: jnp.ndarray  # (B, 4, n, q)
    worth: jnp.ndarray  # (B, q)
    u1: jnp.ndarray
    u2: jnp.ndarray
    u3: jnp.ndarray
    u4: jnp.ndarray
    usoc: jnp.ndarray
    ubox: jnp.ndarray
    umc: jnp.ndarray
    uorth: jnp.ndarray
    X: jnp.ndarray  # (B, n, m) scaled
    Y: jnp.ndarray  # (B, n, n)
    Th: jnp.ndarray  # (B, m, m) scaled
    U: jnp.ndarray  # (B, n, k)
    t: jnp.ndarray  # (B, n, q)
    rho: jnp.ndarray  # (B,)
    # per-slot runtime block scales (see omc.sdp.admm.ADMMState.sX): one
    # compiled program per shape serves every instance
    sX: jnp.ndarray  # (B,)
    sT: jnp.ndarray  # (B,)


def init_mc_state(B, n, m, k, dtype=jnp.float32, *, sX=1.0, sT=1.0,
                  X0=None, Y0=None, Th0=None, U0=None,
                  rho: float = 0.02) -> MCState:
    q = k * (k + 1) // 2
    z = lambda *s: jnp.zeros(s, dtype=dtype)

    def prim(val, shape, scale):
        if val is None:
            return z(*shape)
        s = jnp.asarray(scale, dtype)
        if s.ndim:  # (B,) per-slot scales -> (B, 1, ..., 1)
            s = s.reshape(s.shape + (1,) * (len(shape) - s.ndim))
        return jnp.broadcast_to(jnp.asarray(val, dtype=dtype) / s, shape)

    return MCState(
        w1=z(B, n + m, n + m), w2=z(B, n + k, n + k), w3=z(B, n, n), w4=z(B),
        wsoc=z(B, k, 1 + n), wbox=z(B, n, k), wmc=z(B, 4, n, q), worth=z(B, q),
        u1=z(B, n + m, n + m), u2=z(B, n + k, n + k), u3=z(B, n, n), u4=z(B),
        usoc=z(B, k, 1 + n), ubox=z(B, n, k), umc=z(B, 4, n, q), uorth=z(B, q),
        X=prim(X0, (B, n, m), sX), Y=prim(Y0, (B, n, n), 1.0),
        Th=prim(Th0, (B, m, m), sT), U=prim(U0, (B, n, k), 1.0),
        t=z(B, n, q), rho=jnp.full((B,), rho, dtype=dtype),
        sX=jnp.broadcast_to(jnp.asarray(sX, dtype), (B,)),
        sT=jnp.broadcast_to(jnp.asarray(sT, dtype), (B,)),
    )


def _mc_forward(coef, JJ, delta, Xs, Y, Ths, U, t, k, sX, sT):
    s, c1, c2, d = coef
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
    J1, J2 = JJ
    U1 = U[..., :, J1]  # (B, n, q)
    U2 = U[..., :, J2]
    wmc = s * t[..., None, :, :] + c1 * U1[..., None, :, :] + c2 * U2[..., None, :, :] + d
    worth = jnp.sum(t, axis=-2) - delta  # (B, q); equality slot value is 0
    return w1, w2, w3, w4, wsoc, wbox, wmc, worth


def _mc_adjoint(coef, y1, y2, y3, y4, ysoc, ybox, ymc, yorth, n, m, k, sX, sT,
                seg_j1, seg_j2):
    """Adjoint: duals -> gradients on (Xs, Y, Ths, U, t)."""
    s, c1, c2, d = coef
    gX = sX * 2.0 * y1[..., :n, n:]
    gY = (
        y1[..., :n, :n]
        + y2[..., :n, :n]
        - y3
        - y4[..., None, None] * jnp.eye(n, dtype=y3.dtype)
    )
    gTh = sT * y1[..., n:, n:]
    # U: fixed parts + McCormick parts scattered from pairs to coordinates
    gU = 2.0 * y2[..., :n, n:] + jnp.swapaxes(ysoc[..., 1:], -1, -2) + ybox
    mc1 = jnp.sum(ymc * c1, axis=-3)  # (B, n, q) coefficient on U[:, J1]
    mc2 = jnp.sum(ymc * c2, axis=-3)
    gU = gU + jnp.einsum("bnq,qk->bnk", mc1, seg_j1, precision=_HI)
    gU = gU + jnp.einsum("bnq,qk->bnk", mc2, seg_j2, precision=_HI)
    gt = jnp.sum(ymc * s, axis=-3) + yorth[..., None, :]
    return gX, gY, gTh, gU, gt


def make_mccormick_solver(n: int, m: int, k: int, gamma: float, *,
                          iters: int = 400, dtype=jnp.float32,
                          rho: float = 1.0, alpha: float = 1.6,
                          psd_method: str = "auto", jit: bool = True):
    """Build the jitted batched McCormick-relaxation ADMM solver.

    solve(A, mask, batch: MCBatch, ub_bar, state: MCState) -> (state, out)
    with ``out`` carrying unscaled primal blocks, averaged duals for
    host-side certification, and separation eigenpairs (used only for
    reporting; branching in this mode bisects the U box)."""
    if psd_method == "auto":
        psd_method = "eigh" if dtype == jnp.float64 else "ns"
    proj = project_psd_ns if psd_method == "ns" else project_psd

    q = k * (k + 1) // 2
    J1np, J2np = pair_indices(k)
    J1 = jnp.asarray(J1np)
    J2 = jnp.asarray(J2np)
    JJ = (J1, J2)
    delta = jnp.asarray((J1np == J2np).astype(np.float64), dtype=dtype)
    # scatter matrices pair -> coordinate, (q, k)
    seg_j1 = jnp.asarray(np.eye(k)[J1np], dtype=dtype)
    seg_j2 = jnp.asarray(np.eye(k)[J2np], dtype=dtype)

    def solve(A, mask, batch: MCBatch, ub_bar, state: MCState, n_iters=None):
        """``n_iters`` (optional, traced): runtime iteration budget (see
        ``omc.sdp.admm.make_admm_solver``)."""
        ni = jnp.asarray(iters if n_iters is None else n_iters, jnp.int32)
        A = A.astype(dtype)
        mask = mask.astype(dtype)
        B = batch.U_lo.shape[0]
        # per-slot runtime block scales (see omc.sdp.admm.ADMMState.sX)
        sX = state.sX[:, None, None]
        sT = state.sT[:, None, None]
        coef = mccormick_coeffs(batch.U_lo, batch.U_hi, J1, J2)
        s, c1, c2, d = coef

        # ---- rho-free factorisations (once per batch) ----
        # Per-row (U, t) blocks: M_i = diag(4 I_k, 0_q) + sum_rows a a'
        # with a = c1 e_{J1} + c2 e_{J2} (U part) ++ s e_p (t part).
        # Rows tensor R: (B, n, 4q, k+q)
        aU = (
            c1[..., None] * seg_j1[None, None, None]
            + c2[..., None] * seg_j2[None, None, None]
        )  # (B, 4, n, q, k)
        at = s[..., None] * jnp.eye(q, dtype=dtype)[None, None, None]  # (B,4,n,q,q)
        R = jnp.concatenate([aU, at], axis=-1)  # (B, 4, n, q, k+q)
        R = jnp.swapaxes(R, 1, 2).reshape(B, n, 4 * q, k + q)
        Mblk = jnp.einsum("bnrc,bnrd->bncd", R, R, precision=_HI)
        fixed = jnp.concatenate(
            [4.0 * jnp.ones((k,), dtype), jnp.zeros((q,), dtype)]
        )
        Mblk = Mblk + jnp.diag(fixed)[None, None]
        # tiny Tikhonov keeps the t block invertible when an envelope row
        # degenerates (lo = hi); the z-step stays exact in the limit sense
        # and ADMM tolerates a slightly inexact inner solve.
        Mblk = Mblk + 1e-9 * jnp.eye(k + q, dtype=dtype)
        Mc = jax.lax.linalg.cholesky(Mblk)  # (B, n, k+q, k+q)
        # Orthogonality Woodbury: G = I_q + sum_i (M_i^{-1})_{tt}
        Et = jnp.concatenate(
            [jnp.zeros((k, q), dtype), jnp.eye(q, dtype=dtype)], axis=0
        )  # (k+q, q)
        Si = jax.scipy.linalg.cho_solve(
            (Mc, True), jnp.broadcast_to(Et, (B, n, k + q, q))
        )
        G = jnp.eye(q, dtype=dtype) + jnp.sum(Si[..., k:, :], axis=1)  # (B, q, q)
        Gc = jax.lax.linalg.cholesky(G)

        def solve_ut(rU, rt, rho_b):
            """rho^-1 (blockdiag M_i + W W')^{-1} applied to (rU, rt)."""
            r = jnp.concatenate([rU, rt], axis=-1)  # (B, n, k+q)
            z0 = jax.scipy.linalg.cho_solve((Mc, True), r[..., None])[..., 0]
            wz = jnp.sum(z0[..., k:], axis=-2)  # (B, q) = W' z0
            tcorr = jax.scipy.linalg.cho_solve((Gc, True), wz[..., None])[..., 0]
            # z = z0 - B^-1 W tcorr; W tcorr has t-part tcorr per row i
            corr = jnp.concatenate(
                [
                    jnp.zeros(rU.shape, dtype),
                    jnp.broadcast_to(tcorr[..., None, :], rt.shape),
                ],
                axis=-1,
            )
            z = z0 - jax.scipy.linalg.cho_solve((Mc, True), corr[..., None])[..., 0]
            zU = z[..., :k] / rho_b[:, None, None]
            zt = z[..., k:] / rho_b[:, None, None]
            return zU, zt

        cX = -sX * (mask * A)[None]
        cTh = (sT * 0.5 / gamma) * jnp.eye(m, dtype=dtype)[None]

        zero5 = (jnp.zeros((B, n, m), dtype), jnp.zeros((B, n, n), dtype),
                 jnp.zeros((B, m, m), dtype), jnp.zeros((B, n, k), dtype),
                 jnp.zeros((B, n, q), dtype))
        offs = _mc_forward(coef, JJ, delta, *zero5, k, sX, sT)

        def solve_z(rho_b, rX, rY, rTh, rU, rt):
            r3 = rho_b[:, None, None]
            dX = mask[None] * (sX * sX) + r3 * 2.0 * sX * sX
            zX = rX / dX
            # Y: (3 I + vecI vecI') per rho
            zY = rY / 3.0
            trz = jnp.trace(zY, axis1=-2, axis2=-1)
            zY = zY - (trz / (3.0 + n))[:, None, None] * jnp.eye(n, dtype=dtype)
            zY = zY / r3
            zTh = rTh / (r3 * sT * sT)
            zU, zt = solve_ut(rU, rt, rho_b)
            return zX, zY, zTh, zU, zt

        def body(it, st: MCState):
            rho_b = st.rho
            r3 = rho_b[:, None, None]
            gX, gY, gTh, gU, gt = _mc_adjoint(
                coef,
                st.w1 - st.u1 - offs[0], st.w2 - st.u2 - offs[1],
                st.w3 - st.u3 - offs[2], st.w4 - st.u4 - offs[3],
                st.wsoc - st.usoc - offs[4], st.wbox - st.ubox - offs[5],
                st.wmc - st.umc - offs[6], st.worth - st.uorth - offs[7],
                n, m, k, sX, sT, seg_j1, seg_j2,
            )
            Xs, Y, Ths, U, t = solve_z(
                rho_b, r3 * gX - cX, r3 * gY, r3 * gTh - cTh,
                r3 * gU, r3 * gt,
            )
            Y = 0.5 * (Y + jnp.swapaxes(Y, -1, -2))
            Ths = 0.5 * (Ths + jnp.swapaxes(Ths, -1, -2))

            f = _mc_forward(coef, JJ, delta, Xs, Y, Ths, U, t, k, sX, sT)

            def relax_mix(fz, w):
                return alpha * fz + (1.0 - alpha) * w

            t1 = relax_mix(f[0], st.w1) + st.u1
            w1 = proj(t1)
            u1 = t1 - w1
            t2 = relax_mix(f[1], st.w2) + st.u2
            w2 = proj(t2)
            u2 = t2 - w2
            t3 = relax_mix(f[2], st.w3) + st.u3
            w3 = proj(t3)
            u3 = t3 - w3
            t4 = relax_mix(f[3], st.w4) + st.u4
            w4 = jnp.maximum(t4, 0.0)
            u4 = t4 - w4
            tsoc = relax_mix(f[4], st.wsoc) + st.usoc
            pt, pw = project_soc(tsoc[..., 0], tsoc[..., 1:])
            wsoc = jnp.concatenate([pt[..., None], pw], axis=-1)
            usoc = tsoc - wsoc
            tbox = relax_mix(f[5], st.wbox) + st.ubox
            wbox = jnp.clip(tbox, batch.U_lo, batch.U_hi)
            ubox = tbox - wbox
            tmc = relax_mix(f[6], st.wmc) + st.umc
            wmc = jnp.maximum(tmc, 0.0)
            umc = tmc - wmc
            tor = relax_mix(f[7], st.worth) + st.uorth
            worth = jnp.zeros_like(tor)  # equality slot: projection onto {0}
            uorth = tor

            return MCState(
                w1=w1, w2=w2, w3=w3, w4=w4, wsoc=wsoc, wbox=wbox,
                wmc=wmc, worth=worth,
                u1=u1, u2=u2, u3=u3, u4=u4, usoc=usoc, ubox=ubox,
                umc=umc, uorth=uorth,
                X=Xs, Y=Y, Th=Ths, U=U, t=t, rho=rho_b,
                sX=st.sX, sT=st.sT,
            )

        navg = jnp.maximum(1, ni // 4)

        def body_acc(it, carry):
            st, acc = carry
            st = body(it, st)
            take = (it >= ni - navg)
            w = jnp.where(take, 1.0, 0.0).astype(st.u1.dtype)
            rb3 = st.rho[:, None, None]
            acc = (
                acc[0] + w * rb3 * st.u1, acc[1] + w * rb3 * st.u2,
                acc[2] + w * st.rho[:, None, None, None] * st.umc,
                acc[3] + w * st.rho[:, None] * st.uorth,
            )
            return st, acc

        acc0 = (
            jnp.zeros_like(state.u1), jnp.zeros_like(state.u2),
            jnp.zeros_like(state.umc), jnp.zeros_like(state.uorth),
        )
        state, acc = jax.lax.fori_loop(0, ni, body_acc, (state, acc0))

        Msep = jnp.einsum("bik,bjk->bij", state.U, state.U) - state.Y
        Msep = 0.5 * (Msep + jnp.swapaxes(Msep, -1, -2))
        sep_w, sep_V = jnp.linalg.eigh(Msep)
        inv = (1.0 / navg).astype(state.u1.dtype)
        out = {
            "X": sX * state.X, "Y": state.Y, "Th": sT * state.Th, "U": state.U,
            "t": state.t,
            "y1": inv * acc[0], "y2": inv * acc[1],
            "ymc": inv * acc[2], "yorth": inv * acc[3],
            "sep_w": sep_w[..., :2], "sep_V": sep_V[..., :, :2],
        }
        return state, out

    return jax.jit(solve) if jit else solve


def mccormick_safe_dual_bound(xp, A, mask, U_lo, U_hi, y1, y2, ymc, yorth,
                              gamma, k, ub_bar, margin_rel=None):
    """Closed-form partial Lagrangian dual — a valid node lower bound for
    the McCormick relaxation (see module docstring for the kept-set
    argument).  ``ymc`` (B, 4, n, q) are the envelope-row duals (the slot
    convention makes -ymc the >=0 multipliers, as in
    ``omc.sdp.relax.safe_dual_bound``), ``yorth`` (B, q) the free equality
    multipliers."""
    n, m = A.shape[-2], A.shape[-1]
    J1, J2 = pair_indices(k)
    delta = (J1 == J2).astype(A.dtype)

    def _psd(Mat):
        Mat = 0.5 * (Mat + xp.swapaxes(Mat, -1, -2))
        w, V = xp.linalg.eigh(Mat)
        return xp.einsum("...ik,...k,...jk->...ij", V, xp.maximum(w, 0.0), V)

    S1in = -y1
    obs = mask > 0
    S1in = xp.concatenate(
        [
            xp.concatenate(
                [S1in[..., :n, :n], xp.where(obs, S1in[..., :n, n:], 0.0)], axis=-1
            ),
            xp.concatenate(
                [
                    xp.where(
                        xp.swapaxes(obs, -1, -2) if obs.ndim > 2 else obs.T,
                        S1in[..., n:, :n],
                        0.0,
                    ),
                    S1in[..., n:, n:],
                ],
                axis=-1,
            ),
        ],
        axis=-2,
    )
    S1 = _psd(S1in)
    # structural off-support zeroing + delta-shift compensation (see
    # omc.sdp.relax.safe_dual_bound2): kills the R_X-amplified noise
    # channel on unobserved entries at any compute precision
    q_off = xp.where(obs, 0.0, S1[..., :n, n:])
    dshift = xp.sqrt(xp.sum(q_off * q_off, axis=(-2, -1)))
    lmaxR1 = xp.linalg.eigvalsh(S1[..., n:, n:])[..., -1] + dshift
    c_scale = xp.minimum(1.0, (0.5 / gamma) / xp.maximum(lmaxR1, 1e-30))
    S1 = S1 * c_scale[..., None, None]
    dshift = dshift * c_scale
    S2 = _psd(-y2)
    P1, qblk, R1 = S1[..., :n, :n], S1[..., :n, n:], S1[..., n:, n:]
    qblk = xp.where(obs, qblk, 0.0)
    P2, E = S2[..., :n, :n], S2[..., n:, n:]
    D = S2[..., :n, n:]

    lam = xp.maximum(-ymc, 0.0)  # (B, 4, n, q), >= 0 multipliers
    mu = -yorth  # (B, q), free

    s, c1, c2, d = mccormick_coeffs(U_lo, U_hi, J1, J2, xp=xp)

    # Y block (delta I shift on P1 moves eigenvalues down by delta)
    G_Y = -(P1 + P2)
    G_Y = 0.5 * (G_Y + xp.swapaxes(G_Y, -1, -2))
    wY = xp.linalg.eigh(G_Y)[0]
    y_term = xp.sum(
        xp.minimum(wY[..., :k] - dshift[..., None], 0.0), axis=-1
    )

    # Theta block (R1 + delta I <= I/(2 gamma) by the rescale)
    T_th = 2.0 * gamma * ub_bar
    G_Th = (0.5 / gamma) * xp.eye(m, dtype=A.dtype) - R1
    G_Th = 0.5 * (G_Th + xp.swapaxes(G_Th, -1, -2))
    wT = xp.linalg.eigh(G_Th)[0]
    th_term = T_th * xp.minimum(wT[..., 0] - dshift, 0.0)

    # X block: q structurally zero off-support
    R_X = xp.sqrt(2.0 * gamma * ub_bar)
    x_star = xp.clip(A + 2.0 * qblk, -R_X, R_X)
    obs_t = 0.5 * (x_star - A) ** 2 - 2.0 * qblk * x_star
    x_term = xp.sum(xp.where(mask > 0, obs_t, 0.0), axis=(-2, -1))

    # U block: -2 D - sum over envelope rows of lam * (c1 -> J1, c2 -> J2)
    mc1 = xp.sum(lam * c1, axis=-3)  # (B, n, q)
    mc2 = xp.sum(lam * c2, axis=-3)
    seg1 = xp.eye(k, dtype=A.dtype)[J1]  # (q, k)
    seg2 = xp.eye(k, dtype=A.dtype)[J2]
    W_U = -2.0 * D - xp.einsum("bnq,qk->bnk", mc1, seg1) - xp.einsum(
        "bnq,qk->bnk", mc2, seg2
    )
    u_term = xp.sum(xp.minimum(W_U * U_lo, W_U * U_hi), axis=(-2, -1))

    # t block over the corner box
    zeta = -xp.sum(lam * s, axis=-3) - mu[..., None, :]  # (B, n, q)
    t_lo, t_hi = t_corner_box(U_lo, U_hi, J1, J2, xp=xp)
    t_term = xp.sum(xp.minimum(zeta * t_lo, zeta * t_hi), axis=(-2, -1))

    const = (
        -xp.sum(lam * d, axis=(-3, -2, -1))
        + xp.sum(mu * delta, axis=-1)
        - xp.trace(E, axis1=-2, axis2=-1)
    )

    lb = y_term + th_term + x_term + u_term + t_term + const

    if margin_rel is None:
        margin_rel = 1e-10 if A.dtype == xp.float64 else 3e-5
    scale = (
        1.0
        + xp.abs(lb)
        + ub_bar
        + xp.sqrt(xp.sum(S1 * S1, axis=(-2, -1)))
        + xp.sqrt(xp.sum(S2 * S2, axis=(-2, -1)))
        + xp.sum(xp.abs(lam), axis=(-3, -2, -1))
        + xp.sum(xp.abs(mu), axis=-1)
    )
    return lb - margin_rel * scale


def host_certified_bound_mc(A, mask, U_lo, U_hi, out: dict, gamma, k, ub_bar):
    """Float64 host recertification of the device duals."""
    f = lambda a: np.asarray(a, dtype=np.float64)
    return mccormick_safe_dual_bound(
        np, f(A), f(mask), f(U_lo), f(U_hi), f(out["y1"]), f(out["y2"]),
        f(out["ymc"]), f(out["yorth"]), float(gamma), k, float(ub_bar),
        margin_rel=1e-10,
    )
