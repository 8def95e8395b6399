"""Independent tightness oracle for the node SDP relaxation.

The test suite's soundness checks (weak duality vs feasible points) can
never catch a *silently weakened* relaxation: dropping a constraint, or a
systematically loose dual, still yields valid-looking lower bounds.  This
module cross-checks the ADMM solver's certified bound against an
INDEPENDENT solution of the same node SDP
(`/root/reference/src/OptimalMatrixCompletion.jl:1431-1857`, no-Shor path):

    min  1/2 sum_Omega (X - A)^2 + 1/(2 gamma) tr(Theta)
    s.t. [Y X; X' Theta] >= 0,  [Y U; U' I_k] >= 0,  I - Y >= 0,
         tr(Y) <= k,  U in [lo, hi],  ||U_j|| <= 1,
         per cut: lo <= U'x <= hi,  sum_j((lo+hi)_j v_j - (lo hi)_j) >= x'Yx

solved here by a log-barrier interior-point path-following method written
directly from the constraint list (damped Newton on jax float64 autodiff
gradients/Hessians — a different algorithm AND a different formulation
from the production ADMM/Woodbury code, sharing no solver code with it).
The barrier solution brackets the true SDP optimum:
``obj(mu) - mu * nu <= opt <= obj(mu)`` (nu = total barrier parameter),
so asserting ``|admm_bound - obj(mu)| <= tol + mu * nu`` fails whenever
the ADMM relaxation silently weakens OR its dual bound stops converging
to the SDP optimum.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from omc.data import generate_matrix_completion_data
from omc.tree import root_box


# ---------------------------------------------------------------------------
# Independent interior-point solver (test oracle; small-n only)
# ---------------------------------------------------------------------------


def _make_barrier(A, mask, gamma, n, m, k, lo_box, hi_box, cuts):
    """Return f(z, mu) = objective + mu * barrier, plus packing helpers.

    ``cuts`` is a list of (x (n,), lo (k,), hi (k,)) triples.
    z packs (X, Y, Theta, U) as flat float64.
    """
    szs = [n * m, n * n, m * m, n * k]
    offs = np.cumsum([0] + szs)

    def unpack(z):
        X = z[offs[0] : offs[1]].reshape(n, m)
        Y = z[offs[1] : offs[2]].reshape(n, n)
        Th = z[offs[2] : offs[3]].reshape(m, m)
        U = z[offs[3] : offs[4]].reshape(n, k)
        Y = 0.5 * (Y + Y.T)
        Th = 0.5 * (Th + Th.T)
        return X, Y, Th, U

    A_j = jnp.asarray(A)
    mask_j = jnp.asarray(mask)
    lo_j = jnp.asarray(lo_box)
    hi_j = jnp.asarray(hi_box)

    def logdet(M):
        # Cholesky-based log det: NaN outside the PSD cone (slogdet's
        # det > 0 test would accept matrices with an even number of
        # negative eigenvalues, letting the line search escape the cone)
        C = jnp.linalg.cholesky(M)
        return 2.0 * jnp.sum(jnp.log(jnp.diagonal(C)))

    def f(z, mu):
        X, Y, Th, U = unpack(z)
        obj = 0.5 * jnp.sum(mask_j * (X - A_j) ** 2) + (0.5 / gamma) * jnp.trace(Th)
        M1 = jnp.block([[Y, X], [X.T, Th]])
        M2 = jnp.block([[Y, U], [U.T, jnp.eye(k)]])
        bar = logdet(M1) + logdet(M2) + logdet(jnp.eye(n) - Y)
        bar = bar + jnp.log(k - jnp.trace(Y))
        bar = bar + jnp.sum(jnp.log(U - lo_j)) + jnp.sum(jnp.log(hi_j - U))
        bar = bar + jnp.sum(jnp.log(1.0 - jnp.sum(U * U, axis=0)))
        for (cx, clo, chi) in cuts:
            v = jnp.asarray(cx) @ U  # (k,)
            bar = bar + jnp.sum(jnp.log(v - jnp.asarray(clo)))
            bar = bar + jnp.sum(jnp.log(jnp.asarray(chi) - v))
            s = jnp.sum((jnp.asarray(clo) + jnp.asarray(chi)) * v
                        - jnp.asarray(clo) * jnp.asarray(chi))
            s = s - jnp.asarray(cx) @ Y @ jnp.asarray(cx)
            bar = bar + jnp.log(s)
        return obj - mu * bar

    # total barrier parameter nu: logdet(d) counts d, log() counts 1
    nu = (n + m) + (n + k) + n + 1 + 2 * n * k + k + sum(3 * k + 1 - 2 * k for _ in cuts)
    # per cut: 2k interval logs + 1 chord log -> 2k + 1
    nu = (n + m) + (n + k) + n + 1 + 2 * n * k + k + len(cuts) * (2 * k + 1)
    dim = offs[-1]
    return f, unpack, nu, dim, offs


def _feasible_start(n, m, k, lo_box, hi_box, dim, offs):
    Y0 = (0.5 * k / n) * np.eye(n)
    Th0 = 1.0 * np.eye(m)
    U0 = np.zeros((n, k))
    # symmetry-breaking rows have lo = 0: nudge strictly inside
    U0 = np.clip(U0, lo_box + 1e-3 * (hi_box - lo_box), hi_box - 1e-3 * (hi_box - lo_box))
    z = np.zeros(dim)
    z[offs[1] : offs[2]] = Y0.ravel()
    z[offs[2] : offs[3]] = Th0.ravel()
    z[offs[3] : offs[4]] = U0.ravel()
    return jnp.asarray(z)


def solve_sdp_interior_point(A, mask, gamma, k, lo_box, hi_box, cuts=(),
                             mu0=1.0, mu_final=1e-7, theta=0.15,
                             newton_tol=1e-8, max_newton=60):
    """Path-following barrier method; returns (objective, gap_bound) where
    the true SDP optimum lies in [objective - gap_bound, objective]."""
    n, m = A.shape
    f, unpack, nu, dim, offs = _make_barrier(
        A, mask, gamma, n, m, k, lo_box, hi_box, list(cuts)
    )
    grad = jax.jit(jax.grad(f))
    hess = jax.jit(jax.hessian(f))
    val = jax.jit(f)

    z = _feasible_start(n, m, k, lo_box, hi_box, dim, offs)
    assert np.isfinite(float(val(z, mu0))), "interior start infeasible"

    mu = mu0
    while True:
        for _ in range(max_newton):
            g = np.asarray(grad(z, mu))
            H = np.asarray(hess(z, mu))
            # symmetrization of Y/Theta leaves antisymmetric null
            # directions; Tikhonov damping keeps Newton well-posed
            lam = 1e-10 * (1.0 + np.abs(H).max())
            try:
                step = np.linalg.solve(H + lam * np.eye(dim), g)
            except np.linalg.LinAlgError:
                step = np.linalg.lstsq(H, g, rcond=None)[0]
            dec = float(g @ step)
            if dec < newton_tol:
                break
            # backtracking line search keeping strict feasibility
            t = 1.0
            f0 = float(val(z, mu))
            while t > 1e-12:
                z_new = z - t * jnp.asarray(step)
                f1 = float(val(z_new, mu))
                if np.isfinite(f1) and f1 < f0 - 1e-4 * t * dec:
                    break
                t *= 0.5
            if t <= 1e-12:
                break
            z = z - t * jnp.asarray(step)
        if mu <= mu_final:
            break
        mu = max(mu * theta, mu_final)

    X, Y, Th, U = unpack(z)
    obj = 0.5 * float(np.sum(mask * (np.asarray(X) - A) ** 2))
    obj += (0.5 / gamma) * float(np.trace(np.asarray(Th)))
    return obj, mu * nu


# ---------------------------------------------------------------------------
# The tightness assertions
# ---------------------------------------------------------------------------


def _admm_bound_and_primal(A, mask, gamma, k, cuts, iters=60000):
    """Run the production f64 ADMM on the same node and return
    (certified_lb, primal_objective_of_its_iterate)."""
    from omc.sdp.admm import init_admm_state, make_admm_solver
    from omc.sdp.relax import NodeBatch, host_certified_bound

    n, m = A.shape
    lo_box, hi_box = root_box(n, k)
    L = max(1, len(cuts))
    cut_x = np.zeros((1, L, n))
    cut_lo = np.zeros((1, L, k))
    cut_hi = np.zeros((1, L, k))
    cut_mask = np.zeros((1, L))
    for l, (cx, clo, chi) in enumerate(cuts):
        cut_x[0, l] = cx
        cut_lo[0, l] = clo
        cut_hi[0, l] = chi
        cut_mask[0, l] = 1.0
    dt = jnp.float64
    batch = NodeBatch(
        cut_x=jnp.asarray(cut_x, dt), cut_lo=jnp.asarray(cut_lo, dt),
        cut_hi=jnp.asarray(cut_hi, dt), cut_mask=jnp.asarray(cut_mask, dt),
        U_lo=jnp.asarray(lo_box[None], dt), U_hi=jnp.asarray(hi_box[None], dt),
    )
    ub_bar = 0.5 * float(np.sum(mask * A * A))
    sX = max(1.0, float(np.abs(A).max()))
    solver = make_admm_solver(
        n, m, k, L, gamma, iters=iters, dtype=dt, rho=0.05,
        check_every=iters, ema_iters=4000,
    )
    state = init_admm_state(1, n, m, k, L, dtype=dt, sX=sX, sT=1.0, rho=0.05)
    _, out = solver(jnp.asarray(A, dt), jnp.asarray(mask, dt), batch,
                    ub_bar, state)
    out = {key: np.asarray(val) for key, val in out.items()}
    lb = float(host_certified_bound(A, mask, batch, out, gamma, k, ub_bar)[0])
    X = out["X"][0]
    Th = out["Th"][0]
    primal = 0.5 * float(np.sum(mask * (X - A) ** 2)) + (0.5 / gamma) * float(
        np.trace(Th)
    )
    return lb, primal


@pytest.mark.slow
def test_admm_bound_matches_interior_point_no_cuts():
    n = m = 6
    k, gamma = 1, 10.0
    A, idx = generate_matrix_completion_data(k, n, m, 24, seed=0)
    mask = idx.astype(np.float64)
    lo_box, hi_box = root_box(n, k)

    ip_obj, ip_gap = solve_sdp_interior_point(A, mask, gamma, k, lo_box, hi_box)
    lb, primal = _admm_bound_and_primal(A, mask, gamma, k, cuts=[])

    scale = max(1.0, abs(ip_obj))
    # soundness vs the oracle: the certified bound never exceeds the true
    # optimum (which is <= ip_obj)
    assert lb <= ip_obj + 1e-6 * scale
    # tightness: the bound reaches the optimum (catches silent weakening)
    assert lb >= ip_obj - ip_gap - 2e-3 * scale, (
        f"ADMM bound {lb} loose vs interior-point optimum {ip_obj} "
        f"(bracket {ip_gap})"
    )
    # the ADMM primal objective agrees with the optimum too
    assert abs(primal - ip_obj) <= 5e-3 * scale


def _make_barrier_shor(A, mask, gamma, n, m, lo_box, hi_box, minors, soc):
    """Barrier for the k=1 SHOR-strengthened node SDP — the reference's
    model at `/root/reference/src/OptimalMatrixCompletion.jl:1755-1779`
    with the W-linearised objective (:1837-1846):

        min  1/2 sum_Omega (A^2 - 2 A X + W) + tr(Theta)/(2 gamma)
        s.t. core cones + U box + column SOC (as in _make_barrier),
             Theta_jj = sum_i W_ij            (eliminated: Theta diagonal
                                               is BUILT from W),
             per minor (i1,i2,j1,j2): the 5x5 PSD block on
               [1, X_i1j1, X_i1j2, X_i2j1, X_i2j2] against W and the
               pair variables [v1a, v1b, v2a, v2b, v3],
             per SOC coord (i,j): W_ij >= X_ij^2.

    ``minors`` must be pairwise disjoint in row pairs AND column pairs so
    the reference's shared V1/V2/V3 tables degenerate to 5 scalars per
    minor (the production encoder handles sharing; the oracle sidesteps
    it without weakening any constraint family).
    z packs (X, Y, Theta_offdiag, U, W, v5) as flat float64; k = 1.
    """
    k = 1
    M5 = len(minors)
    n_off = m * (m - 1) // 2
    szs = [n * m, n * n, n_off, n * k, n * m, 5 * M5]
    offs = np.cumsum([0] + szs)
    iu = np.triu_indices(m, 1)

    A_j = jnp.asarray(A)
    mask_j = jnp.asarray(mask)
    lo_j = jnp.asarray(lo_box)
    hi_j = jnp.asarray(hi_box)

    def unpack(z):
        X = z[offs[0]: offs[1]].reshape(n, m)
        Y = z[offs[1]: offs[2]].reshape(n, n)
        off = z[offs[2]: offs[3]]
        U = z[offs[3]: offs[4]].reshape(n, k)
        W = z[offs[4]: offs[5]].reshape(n, m)
        v5 = z[offs[5]: offs[6]].reshape(M5, 5)
        Y = 0.5 * (Y + Y.T)
        Th = jnp.zeros((m, m)).at[iu].set(off)
        Th = Th + Th.T + jnp.diag(jnp.sum(W, axis=0))
        return X, Y, Th, U, W, v5

    def logdet(M):
        C = jnp.linalg.cholesky(M)
        return 2.0 * jnp.sum(jnp.log(jnp.diagonal(C)))

    def f(z, mu):
        X, Y, Th, U, W, v5 = unpack(z)
        obj = 0.5 * jnp.sum(mask_j * (A_j**2 - 2.0 * A_j * X + W))
        obj = obj + (0.5 / gamma) * jnp.trace(Th)
        M1 = jnp.block([[Y, X], [X.T, Th]])
        M2 = jnp.block([[Y, U], [U.T, jnp.eye(k)]])
        bar = logdet(M1) + logdet(M2) + logdet(jnp.eye(n) - Y)
        bar = bar + jnp.log(k - jnp.trace(Y))
        bar = bar + jnp.sum(jnp.log(U - lo_j)) + jnp.sum(jnp.log(hi_j - U))
        bar = bar + jnp.sum(jnp.log(1.0 - jnp.sum(U * U, axis=0)))
        for t, (i1, i2, j1, j2) in enumerate(minors):
            x11, x12 = X[i1, j1], X[i1, j2]
            x21, x22 = X[i2, j1], X[i2, j2]
            w11, w12 = W[i1, j1], W[i1, j2]
            w21, w22 = W[i2, j1], W[i2, j2]
            v1a, v1b, v2a, v2b, v3 = (v5[t, c] for c in range(5))
            one = jnp.asarray(1.0)
            M = jnp.stack([
                jnp.stack([one, x11, x12, x21, x22]),
                jnp.stack([x11, w11, v1a, v2a, v3]),
                jnp.stack([x12, v1a, w12, v3, v2b]),
                jnp.stack([x21, v2a, v3, w21, v1b]),
                jnp.stack([x22, v3, v2b, v1b, w22]),
            ])
            bar = bar + logdet(M)
        for (i, j) in soc:
            bar = bar + jnp.log(W[i, j] - X[i, j] ** 2)
        return obj - mu * bar

    nu = (n + m) + (n + k) + n + 1 + 2 * n * k + k + 5 * M5 + len(soc)
    return f, unpack, nu, offs[-1], offs


def solve_shor_sdp_interior_point(A, mask, gamma, lo_box, hi_box, minors,
                                  soc, mu0=1.0, mu_final=1e-7, theta=0.15,
                                  newton_tol=1e-8, max_newton=60):
    """Path-following barrier for the k=1 Shor model; returns
    (objective, gap_bound) bracketing the true optimum as in
    solve_sdp_interior_point."""
    n, m = A.shape
    k = 1
    f, unpack, nu, dim, offs = _make_barrier_shor(
        A, mask, gamma, n, m, lo_box, hi_box, list(minors), list(soc)
    )
    grad = jax.jit(jax.grad(f))
    hess = jax.jit(jax.hessian(f))
    val = jax.jit(f)

    z = np.zeros(dim)
    Y0 = (0.5 * k / n) * np.eye(n)
    U0 = np.clip(np.zeros((n, k)), lo_box + 1e-3 * (hi_box - lo_box),
                 hi_box - 1e-3 * (hi_box - lo_box))
    z[offs[1]: offs[2]] = Y0.ravel()
    z[offs[3]: offs[4]] = U0.ravel()
    z[offs[4]: offs[5]] = 1.0  # W = 1 everywhere: minors diag(1,1,..), RSOC slack
    z = jnp.asarray(z)
    assert np.isfinite(float(val(z, mu0))), "interior start infeasible"

    mu = mu0
    while True:
        for _ in range(max_newton):
            g = np.asarray(grad(z, mu))
            H = np.asarray(hess(z, mu))
            lam = 1e-10 * (1.0 + np.abs(H).max())
            try:
                step = np.linalg.solve(H + lam * np.eye(dim), g)
            except np.linalg.LinAlgError:
                step = np.linalg.lstsq(H, g, rcond=None)[0]
            dec = float(g @ step)
            if dec < newton_tol:
                break
            t = 1.0
            f0 = float(val(z, mu))
            while t > 1e-12:
                z_new = z - t * jnp.asarray(step)
                f1 = float(val(z_new, mu))
                if np.isfinite(f1) and f1 < f0 - 1e-4 * t * dec:
                    break
                t *= 0.5
            if t <= 1e-12:
                break
            z = z - t * jnp.asarray(step)
        if mu <= mu_final:
            break
        mu = max(mu * theta, mu_final)

    X, Y, Th, U, W, v5 = unpack(z)
    obj = 0.5 * float(np.sum(mask * (A**2 - 2.0 * A * np.asarray(X)
                                     + np.asarray(W))))
    obj += (0.5 / gamma) * float(np.trace(np.asarray(Th)))
    return obj, mu * nu


@pytest.mark.slow
def test_shor_bound_matches_interior_point():
    """The production Shor (k=1) certified bound converges to the true
    optimum of the Shor-strengthened SDP, witnessed independently."""
    from omc.sdp.admm_shor import (
        host_certified_bound_shor,
        init_shor_state,
        make_shor_solver,
        shor_batch_to_device,
    )
    from omc.sdp.relax import NodeBatch
    from omc.sdp.shor import (
        generate_rank1_matrix_completion_Shor_constraints_indexes,
        shor_soc_complement,
    )
    from omc.sdp.shor_encode import pack_shor_batch

    n = m = 5
    gamma = 10.0
    A, idx = generate_matrix_completion_data(1, n, m, 20, seed=2)
    mask = idx.astype(np.float64)
    cand = generate_rank1_matrix_completion_Shor_constraints_indexes(idx, [4])
    # keep minors disjoint in row pairs and column pairs so the oracle's
    # per-minor v-scalars match the reference's shared-table model exactly
    minors, rows, cols = [], set(), set()
    for (i1, i2, j1, j2) in cand:
        if (i1, i2) in rows or (j1, j2) in cols:
            continue
        minors.append((i1, i2, j1, j2))
        rows.add((i1, i2))
        cols.add((j1, j2))
        if len(minors) == 2:
            break
    assert minors, "instance yields no disjoint 4-minor (pick another seed)"
    soc = shor_soc_complement(n, m, minors)
    lo_box, hi_box = root_box(n, 1)

    ip_obj, ip_gap = solve_shor_sdp_interior_point(
        A, mask, gamma, lo_box, hi_box, minors, soc
    )

    B, L = 1, 1
    M5, Ms = 4, n * m
    dt = jnp.float64
    batch = NodeBatch(
        cut_x=jnp.zeros((B, L, n), dt), cut_lo=jnp.zeros((B, L, 1), dt),
        cut_hi=jnp.zeros((B, L, 1), dt), cut_mask=jnp.zeros((B, L), dt),
        U_lo=jnp.asarray(lo_box[None], dt), U_hi=jnp.asarray(hi_box[None], dt),
    )
    sbh = pack_shor_batch(n, m, [minors], [soc], M5, Ms)
    sb_dev = shor_batch_to_device(sbh, dt)
    ub_bar = 0.5 * float(np.sum(mask * A * A))
    solver = make_shor_solver(
        n, m, L, M5, Ms, gamma, iters=80000, dtype=dt,
        check_every=80000, ema_iters=4000, psd_method="eigh",
    )
    st0 = init_shor_state(
        B, n, m, 1, L, M5, Ms, dt, sX=max(1.0, float(np.abs(A).max())),
        rho=0.05,
    )
    _, out = solver(jnp.asarray(A, dt), jnp.asarray(mask, dt), batch, sb_dev,
                    ub_bar, st0)
    out_np = {key: np.asarray(v) for key, v in out.items()}
    lb = float(host_certified_bound_shor(
        A, mask, batch, sbh, out_np, gamma, ub_bar
    )[0])

    scale = max(1.0, abs(ip_obj))
    assert lb <= ip_obj + 1e-6 * scale
    assert lb >= ip_obj - ip_gap - 5e-3 * scale, (
        f"Shor ADMM bound {lb} loose vs interior-point optimum {ip_obj} "
        f"(bracket {ip_gap})"
    )


@pytest.mark.slow
def test_admm_bound_matches_interior_point_one_cut():
    n = m = 6
    k, gamma = 1, 10.0
    A, idx = generate_matrix_completion_data(k, n, m, 24, seed=1)
    mask = idx.astype(np.float64)
    lo_box, hi_box = root_box(n, k)
    rng = np.random.default_rng(0)
    cx = rng.standard_normal(n)
    cx /= np.linalg.norm(cx)
    # strictly-feasible cut region around the interior start (see module
    # docstring feasibility argument): v ~ 0 in (-1, 0.4), chord slack
    # 0.4 - x'Yx = 0.4 - k/(2n) > 0
    cuts = [(cx, np.array([-1.0]), np.array([0.4]))]

    ip_obj, ip_gap = solve_sdp_interior_point(
        A, mask, gamma, k, lo_box, hi_box, cuts=cuts
    )
    lb, primal = _admm_bound_and_primal(A, mask, gamma, k, cuts=cuts)

    scale = max(1.0, abs(ip_obj))
    assert lb <= ip_obj + 1e-6 * scale
    assert lb >= ip_obj - ip_gap - 2e-3 * scale, (
        f"ADMM bound {lb} loose vs interior-point optimum {ip_obj} with a "
        f"disjunctive cut (bracket {ip_gap})"
    )
    assert abs(primal - ip_obj) <= 5e-3 * scale
