"""Batched alternating minimisation — upper-bound heuristic.

The reference's altmin (`/root/reference/src/OptimalMatrixCompletion.jl:
1979-2279`) solves two Mosek models per iteration.  Both subproblems are
(masked) ridge least-squares; on TPU each step is a closed-form batched
k x k solve (see ``omc.ops.linalg``), vmapped over many altmin runs
(multi-restart at the root, probability-gated runs across B&B nodes).

The U-step is the unconstrained ridge solution followed by a projection:
column-norm cap only when no cuts are given, or cyclic projections onto
box ∩ per-cut v-intervals ∩ column balls when the caller passes the
node's cut tensors (the reference solves a cut-constrained SOCP instead,
lines 2048-2092).  Upper-bound *validity* is unaffected either way — any
rank-<=k iterate gives a valid incumbent via the exact objective
(reference evaluates objectives the same way at lines 920-927) — the cut
projection restores the reference's search *locality* at tree nodes.

Convergence mirrors the reference (lines 2231-2245): relative objective
change < eps (1e-5), or the last 5 objectives all exceeding the value 5
steps earlier (oscillation), capped at 100 iterations.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from omc.ops.linalg import v_step, u_step_unconstrained


class AltminResult(NamedTuple):
    U: jnp.ndarray  # (B, n, k)
    V: jnp.ndarray  # (B, k, m)
    objective: jnp.ndarray  # (B,)
    converged: jnp.ndarray  # (B,) bool
    n_iters: jnp.ndarray  # (B,) int32
    # per-iteration objective history, padded with +inf past n_iters — the
    # reference returns the full objective list (lines 2249-2278) and its
    # printout shows first/last values (lines 2281-2328)
    obj_trace: jnp.ndarray  # (B, max_iters)


def _objective(U, V, A, mask, gamma):
    X = U @ V
    fit = 0.5 * jnp.sum(jnp.where(mask > 0, (X - A) ** 2, 0.0), axis=(-2, -1))
    reg = (0.5 / gamma) * jnp.sum(X * X, axis=(-2, -1))
    return fit + reg


def _project_pairs(U):
    """Project onto the pairwise SOC rows ``||U_j1 +- U_j2|| <= sqrt(2)``
    (j1 < j2) — the reference's SOC relaxation of the 2x2 minors of
    ``U'U <= I`` in its disjunctive-path altmin U-model
    (`/root/reference/src/OptimalMatrixCompletion.jl:2029-2045`).  In the
    rotated frame p = (a+b)/sqrt(2), q = (a-b)/sqrt(2) the two constraints
    decouple into ||p|| <= 1 and ||q|| <= 1, so the joint projection for
    one pair is two independent norm clips.  No-op for k < 2."""
    k = U.shape[-1]
    if k < 2:
        return U
    s2 = jnp.sqrt(jnp.asarray(2.0, U.dtype))
    for j1 in range(k):
        for j2 in range(j1 + 1, k):
            a = U[..., j1]
            b = U[..., j2]
            p = (a + b) / s2
            q = (a - b) / s2
            np_ = jnp.linalg.norm(p, axis=-1, keepdims=True)
            nq_ = jnp.linalg.norm(q, axis=-1, keepdims=True)
            p = p * jnp.minimum(1.0, 1.0 / jnp.maximum(np_, 1e-30))
            q = q * jnp.minimum(1.0, 1.0 / jnp.maximum(nq_, 1e-30))
            U = U.at[..., j1].set((p + q) / s2)
            U = U.at[..., j2].set((p - q) / s2)
    return U


def _project_U(U, U_lo, U_hi):
    """Cap column norms at 1 (the V-step re-balances scales, so this never
    degrades the objective in the scale-invariant (U, V) parametrisation).

    Deviation from the reference: the box (and cut-interval) constraints in
    the reference's altmin model keep the search inside the node's region —
    a locality heuristic.  Clipping to the symmetry-breaking box here can
    destroy solutions whose natural sign pattern is mirrored (U -> -U is
    objective-invariant but the clip is not), so we deliberately drop the
    box; upper-bound *validity* needs only rank(UV) <= k, and incumbents
    are re-orthonormalised by SVD exactly as the reference does
    (reference lines 920-927)."""
    del U_lo, U_hi
    nrm = jnp.linalg.norm(U, axis=-2, keepdims=True)
    U = U * jnp.minimum(1.0, 1.0 / jnp.maximum(nrm, 1e-30))
    # pairwise SOC rows of the disjunctive-path U-model (ref :2029-2045)
    return _project_pairs(U)


def _project_box(U, U_lo, U_hi, sweeps: int = 4):
    """Cyclic projections onto box ∩ column balls — the McCormick-path
    node-local projection (the reference's McCormick altmin U-model
    enforces the node box and the column SOCs jointly,
    `/root/reference/src/OptimalMatrixCompletion.jl:2095-2171`).  Unlike
    the root's cut-free path, a McCormick tree node's box IS its branching
    region (interval bisection on U entries), so the box must bind for the
    heuristic to search locally.  Ends on the box clip — locality wins the
    tie; residual ball violation only affects conditioning, never
    upper-bound validity."""
    for _ in range(sweeps):
        U = jnp.clip(U, U_lo, U_hi)
        nrm = jnp.linalg.norm(U, axis=-2, keepdims=True)
        U = U * jnp.minimum(1.0, 1.0 / jnp.maximum(nrm, 1e-30))
    return jnp.clip(U, U_lo, U_hi)


def _project_cuts(U, U_lo, U_hi, cut_x, cut_lo, cut_hi, cut_mask, sweeps=8):
    """Cyclic projections onto box ∩ per-cut v-intervals ∩ column balls.

    The reference's cut-constrained altmin U-model imposes, per cut with
    breakpoint vector x, interval bounds on v = U^T x determined by the
    node's direction labels (`/root/reference/src/OptimalMatrixCompletion.jl:
    2048-2092`) plus the U box and column-norm SOCs.  Here the unconstrained
    ridge U-step is followed by a POCS sweep over the same sets — every set
    projection is a clip / rank-1 update / column rescale, so the whole
    thing is batched elementwise work.  Unlike the cut-free path, the cut
    region pins the sign orientation, so the box IS enforced here.

    U (B, n, k); cut_x (B, L, n); cut_lo/cut_hi (B, L, k); cut_mask (B, L).
    """
    L = cut_x.shape[1]
    xx = jnp.sum(cut_x * cut_x, axis=-1)  # (B, L); breakpoint vecs are ~unit

    def sweep(U, _):
        U = jnp.clip(U, U_lo, U_hi)

        def slab(Uc, l):
            x = cut_x[:, l]  # (B, n)
            v = jnp.einsum("bn,bnk->bk", x, Uc)  # (B, k)
            v_c = jnp.clip(v, cut_lo[:, l], cut_hi[:, l])
            dv = (v_c - v) * cut_mask[:, l][:, None]
            step = dv / jnp.maximum(xx[:, l], 1e-30)[:, None]  # (B, k)
            return Uc + x[:, :, None] * step[:, None, :], None

        U, _ = jax.lax.scan(slab, U, jnp.arange(L))
        nrm = jnp.linalg.norm(U, axis=-2, keepdims=True)
        U = U * jnp.minimum(1.0, 1.0 / jnp.maximum(nrm, 1e-30))
        # pairwise SOC rows (ref :2029-2045) join the cut-path POCS sweep
        U = _project_pairs(U)
        return U, None

    U, _ = jax.lax.scan(sweep, U, None, length=sweeps)
    return U


def make_altmin(n: int, m: int, k: int, gamma: float, *, max_iters: int = 100,
                tol: float = 1e-5, dtype=jnp.float32):
    """Build a jitted batched altmin: (A, mask, U_init, U_lo, U_hi) -> AltminResult."""

    vstep_b = jax.vmap(v_step, in_axes=(0, None, None, None))
    ustep_b = jax.vmap(u_step_unconstrained, in_axes=(0, None, None, None))

    def run(A, mask, U_init, U_lo, U_hi, cut_x=None, cut_lo=None,
            cut_hi=None, cut_mask=None, box_on=None):
        """``box_on`` (optional, (B,)): per-slot switch — slots with
        box_on > 0 project each U iterate onto the node box ∩ column
        balls (the McCormick-path tree-node locality mode, reference
        :2095-2171); other slots keep the norm-cap-only projection (the
        root multi-restart mode, where box clipping can destroy
        mirrored-sign solutions; see _project_U).  Per-slot so the driver
        can run box-local and global replicas of the same node in ONE
        batch and keep the better incumbent."""
        with_cuts = cut_x is not None
        A = A.astype(dtype)
        mask = mask.astype(dtype)
        U0 = U_init.astype(dtype)
        B = U0.shape[0]

        class Carry(NamedTuple):
            U: jnp.ndarray
            V: jnp.ndarray
            obj_hist: jnp.ndarray  # (B, 6) ring of recent objectives
            obj_trace: jnp.ndarray  # (B, max_iters) full objective history
            obj_cur: jnp.ndarray  # (B,)
            done: jnp.ndarray  # (B,) bool
            conv: jnp.ndarray  # (B,) bool
            iters: jnp.ndarray  # (B,) int32
            t: jnp.ndarray  # scalar int32

        def cond(c: Carry):
            return jnp.logical_and(c.t < max_iters, ~jnp.all(c.done))

        def step(c: Carry):
            V_new = vstep_b(c.U, A, mask, gamma)
            U_new = ustep_b(V_new, A, mask, gamma)
            if with_cuts:
                U_new = _project_cuts(
                    U_new, U_lo, U_hi, cut_x, cut_lo, cut_hi, cut_mask
                )
            elif box_on is not None:
                U_new = jnp.where(
                    box_on[:, None, None] > 0,
                    _project_box(U_new, U_lo, U_hi),
                    _project_U(U_new, U_lo, U_hi),
                )
            else:
                U_new = _project_U(U_new, U_lo, U_hi)
            obj_new = _objective(U_new, V_new, A, mask, gamma)
            rel = jnp.abs((obj_new - c.obj_cur) / jnp.where(c.obj_cur == 0, 1.0, c.obj_cur))
            hist = jnp.concatenate([c.obj_hist[:, 1:], obj_new[:, None]], axis=1)
            oscillating = jnp.logical_and(
                c.t >= 5, jnp.all(hist[:, 1:] > hist[:, 0:1], axis=1)
            )
            newly_conv = jnp.logical_and(~c.done, jnp.logical_or(rel < tol, oscillating))
            done = jnp.logical_or(c.done, newly_conv)
            upd = ~c.done  # items still running take the step
            sel = lambda new, old: jnp.where(
                upd.reshape((B,) + (1,) * (new.ndim - 1)), new, old
            )
            trace = c.obj_trace.at[:, c.t].set(
                jnp.where(upd, obj_new, jnp.inf)
            )
            return Carry(
                U=sel(U_new, c.U), V=sel(V_new, c.V),
                obj_hist=jnp.where(upd[:, None], hist, c.obj_hist),
                obj_trace=trace,
                obj_cur=jnp.where(upd, obj_new, c.obj_cur),
                done=done, conv=jnp.logical_or(c.conv, newly_conv),
                iters=c.iters + upd.astype(jnp.int32), t=c.t + 1,
            )

        init = Carry(
            U=U0, V=jnp.zeros((B, k, m), dtype),
            obj_hist=jnp.full((B, 6), jnp.inf, dtype),
            obj_trace=jnp.full((B, max_iters), jnp.inf, dtype),
            obj_cur=jnp.full((B,), 1e10, dtype),
            done=jnp.zeros((B,), bool), conv=jnp.zeros((B,), bool),
            iters=jnp.zeros((B,), jnp.int32), t=jnp.asarray(0, jnp.int32),
        )
        c = jax.lax.while_loop(cond, step, init)
        obj = _objective(c.U, c.V, A, mask, gamma)
        return AltminResult(U=c.U, V=c.V, objective=obj, converged=c.conv,
                            n_iters=c.iters, obj_trace=c.obj_trace)

    return jax.jit(run)
