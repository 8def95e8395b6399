"""Correctness tests for the batched relaxation solvers and the certified
safe dual bound (the make-or-break component, SURVEY.md section 7)."""

import numpy as np
import pytest

import jax.numpy as jnp

from omc.data import generate_matrix_completion_data
from omc.problem import evaluate_objective
from omc.sdp.admm import ADMMState, init_admm_state, make_admm_solver
from omc.sdp.cuts import region_bounds
from omc.sdp.relax import (
    NodeBatch,
    apply_warm_slices,
    host_certified_bound,
    init_state,
    make_solver,
)
from omc.tree import root_box


def state_slice_to_host(state, i, compress=np.float32):
    """Test-local helper: node ``i``'s slice of a batch solver state as
    compressed host arrays (the production driver slices whole batches via
    ``state_to_host`` + ``host_state_slice`` instead — one transfer per
    leaf, not per node)."""
    import jax

    return [np.asarray(x[i]).astype(compress) for x in jax.tree.leaves(state)]


def assemble_warm_state(template, slices):
    """Test-local helper: build a batch solver state from per-node host
    slice lists via ``apply_warm_slices`` (the production driver instead
    keeps host template leaves and ships one packed transfer)."""
    import jax

    leaves, treedef = jax.tree.flatten(template)
    base = [np.asarray(leaf).copy() for leaf in leaves]
    apply_warm_slices(base, slices)
    return jax.tree.unflatten(treedef, [jnp.asarray(b) for b in base])


def _instance(n=8, m=8, k=1, gamma=40.0, frac=0.6, seed=0):
    A, idx = generate_matrix_completion_data(k, n, m, int(round(frac * n * m)), seed)
    return A, idx.astype(np.float64)


def _empty_batch(n, k, L=4, B=1):
    lo, hi = root_box(n, k)
    return NodeBatch(
        cut_x=jnp.zeros((B, L, n)), cut_lo=jnp.zeros((B, L, k)),
        cut_hi=jnp.zeros((B, L, k)), cut_mask=jnp.zeros((B, L)),
        U_lo=jnp.asarray(np.broadcast_to(lo, (B,) + lo.shape)),
        U_hi=jnp.asarray(np.broadcast_to(hi, (B,) + hi.shape)),
    )


def _master_point(A, mask, gamma, k, seed=1):
    """A master-feasible (X, Y, Theta, U) with U orthonormal, in the root
    box (k=1: sign chosen for the symmetry-breaking row)."""
    n, m = A.shape
    rng = np.random.default_rng(seed)
    u = rng.standard_normal(n)
    u /= np.linalg.norm(u)
    if u[-1] < 0:
        u = -u
    U = u[:, None]
    # ridge-optimal V given U
    G = np.einsum("nk,nm,nl->mkl", U, mask, U) + (1 / gamma) * (U.T @ U)[None]
    V = np.linalg.solve(G, ((U.T @ (mask * A)).T)[..., None])[..., 0].T
    X = U @ V
    Th = V.T @ V
    Y = U @ U.T
    obj = float(evaluate_objective(X, A, mask, U, gamma))
    return X, Y, Th, U, obj


@pytest.mark.parametrize("method", ["admm", "pdhg"])
def test_weak_duality_root(method):
    """The certified bound from any solver state must lower-bound every
    master-feasible objective <= ub_bar."""
    A, mask = _instance()
    n, m, k, gamma = 8, 8, 1, 40.0
    X, Y, Th, U, obj = _master_point(A, mask, gamma, k)
    ub_bar = obj * (1 + 1e-9)
    batch = _empty_batch(n, k)
    if method == "admm":
        solver = make_admm_solver(n, m, k, 4, gamma, iters=300, dtype=jnp.float64,
                                  rho=0.05)
        st = init_admm_state(1, n, m, k, 4, jnp.float64)
    else:
        solver = make_solver(n, m, k, 4, gamma, iters=300, dtype=jnp.float64,
                             omega=3.0)
        st = init_state(1, n, m, k, 4, jnp.float64)
    _, out = solver(jnp.asarray(A), jnp.asarray(mask), batch, ub_bar, st)
    out = {kk: np.asarray(v) for kk, v in out.items()}
    lb = float(host_certified_bound(A, mask, batch, out, gamma, k, ub_bar)[0])
    assert lb <= obj + 1e-9
    assert lb > -np.inf


def test_weak_duality_with_cuts():
    """Same with a disjunctive cut whose region contains the master point."""
    A, mask = _instance()
    n, m, k, gamma = 8, 8, 1, 40.0
    X, Y, Th, U, obj = _master_point(A, mask, gamma, k)
    ub_bar = obj * (1 + 1e-9)
    rng = np.random.default_rng(3)
    L, B = 4, 1
    cut_x = np.zeros((B, L, n))
    cut_lo = np.zeros((B, L, k))
    cut_hi = np.zeros((B, L, k))
    cmask = np.zeros((B, L))
    for l in range(2):
        x = rng.standard_normal(n)
        x /= np.linalg.norm(x)
        vhat = rng.uniform(-1, 1, size=(k,))
        v = U.T @ x
        code = np.where(v <= vhat, 0, 1)  # region containing the point
        lo_, hi_ = region_bounds("linear", code, vhat)
        assert np.all(lo_ - 1e-12 <= v) and np.all(v <= hi_ + 1e-12)
        cut_x[0, l] = x
        cut_lo[0, l] = lo_
        cut_hi[0, l] = hi_
        cmask[0, l] = 1.0
    lo, hi = root_box(n, k)
    batch = NodeBatch(
        *[jnp.asarray(a) for a in (cut_x, cut_lo, cut_hi, cmask)],
        jnp.asarray(lo[None]), jnp.asarray(hi[None]),
    )
    solver = make_admm_solver(n, m, k, L, gamma, iters=400, dtype=jnp.float64,
                              rho=0.05)
    st = init_admm_state(B, n, m, k, L, jnp.float64)
    _, out = solver(jnp.asarray(A), jnp.asarray(mask), batch, ub_bar, st)
    out = {kk: np.asarray(v) for kk, v in out.items()}
    lb = float(host_certified_bound(A, mask, batch, out, gamma, k, ub_bar)[0])
    # master point satisfies chord >= sum v^2 = x'Yx, so it remains feasible
    assert lb <= obj + 1e-9


def test_admm_converges_to_relaxation_optimum():
    """LB and (feasible-side) primal objective must coincide at convergence."""
    A, mask = _instance(gamma=40.0)
    n, m, k, gamma = 8, 8, 1, 40.0
    X, Y, Th, U, obj = _master_point(A, mask, gamma, k)
    ub_bar = obj * (1 + 1e-9)
    batch = _empty_batch(n, k)
    solver = make_admm_solver(n, m, k, 4, gamma, iters=8000, dtype=jnp.float64,
                              rho=0.05)
    st = init_admm_state(1, n, m, k, 4, jnp.float64)
    _, out = solver(jnp.asarray(A), jnp.asarray(mask), batch, ub_bar, st)
    out = {kk: np.asarray(v) for kk, v in out.items()}
    lb = float(host_certified_bound(A, mask, batch, out, gamma, k, ub_bar)[0])
    Xp, Thp = out["X"][0], out["Th"][0]
    pobj = 0.5 * np.sum(mask * (Xp - A) ** 2) + 0.5 / gamma * np.trace(Thp)
    # primal near-feasible and duality gap small
    M1 = np.block([[out["Y"][0], Xp], [Xp.T, Thp]])
    assert np.linalg.eigvalsh(M1).min() > -1e-4
    assert lb <= obj + 1e-9
    assert abs(pobj - lb) < 2e-3 * max(1.0, abs(pobj))


def test_warm_state_roundtrip_and_padding():
    n, m, k = 6, 7, 2
    st = init_admm_state(3, n, m, k, 4, jnp.float64)
    # fill with recognizable values
    st = st._replace(wa=jnp.ones((3, 4, k)) * 2.5, Y=jnp.ones((3, n, n)) * 1.5)
    sl = state_slice_to_host(st, 1)
    assert isinstance(sl, list) and all(isinstance(a, np.ndarray) for a in sl)
    template = init_admm_state(2, n, m, k, 8, jnp.float64)  # larger L
    asm = assemble_warm_state(template, [sl, None])
    assert np.allclose(np.asarray(asm.Y[0]), 1.5)
    assert np.allclose(np.asarray(asm.wa[0][:4]), 2.5)
    assert np.allclose(np.asarray(asm.wa[0][4:]), 0.0)
    assert np.allclose(np.asarray(asm.Y[1]), 0.0)


def test_f32_bound_tracks_f64_with_structural_offsupport_zero():
    """The margin-guarded float32 safe bound must track the float64 host
    bound closely: the off-support q channel is structurally zero (delta-
    shift restructure, round-4 verdict item 3), so casting the SAME duals
    to float32 may no longer cost O(R_X * #unobserved * eps) bound value."""
    from omc.sdp.relax import safe_dual_bound2

    n = m = 24
    k, gamma = 1, 40.0
    A, idx = generate_matrix_completion_data(k, n, m, int(0.3 * n * m), seed=2)
    mask = idx.astype(np.float64)
    ub_bar = 0.5 * float(np.sum(mask * A * A))
    L = 4
    batch = NodeBatch(
        cut_x=jnp.zeros((1, L, n)), cut_lo=jnp.zeros((1, L, k)),
        cut_hi=jnp.zeros((1, L, k)), cut_mask=jnp.zeros((1, L)),
        U_lo=jnp.asarray(root_box(n, k)[0][None]),
        U_hi=jnp.asarray(root_box(n, k)[1][None]),
    )
    solver = make_admm_solver(n, m, k, L, gamma, iters=4000,
                              dtype=jnp.float64, rho=0.03)
    st = init_admm_state(1, n, m, k, L, jnp.float64,
                         sX=max(1.0, float(np.abs(A).max())), rho=0.03)
    _, out = solver(jnp.asarray(A), jnp.asarray(mask), batch, ub_bar, st)
    out = {kk: np.asarray(v) for kk, v in out.items()}

    lb64 = float(host_certified_bound(A, mask, batch, out, gamma, k, ub_bar)[0])

    f32 = lambda a: np.asarray(a, np.float32)
    b32 = NodeBatch(*[f32(x) for x in batch])
    lb32, est32 = safe_dual_bound2(
        np, f32(A), f32(mask), b32, f32(out["y1"]), f32(out["y2"]),
        f32(out["ya"]), f32(out["yb"]), f32(out["yc"]),
        np.float32(gamma), k, np.float32(ub_bar),
    )
    lb32 = float(lb32[0])
    # soundness ordering preserved under f32 (margin covers rounding)
    assert lb32 <= lb64 + 1e-4 * max(1.0, abs(lb64))
    # tracking: the old off-support channel cost O(1) bound value here
    # (R_X ~ 50 with hundreds of unobserved entries); the restructured
    # bound stays within a few percent of float64
    assert lb64 - lb32 <= 0.05 * max(1.0, abs(lb64)), (lb32, lb64)
