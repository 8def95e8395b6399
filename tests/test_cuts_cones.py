"""Tests for cut-region encoding and cone projections."""

import numpy as np
import pytest

import jax.numpy as jnp

from omc.ops.cones import project_psd, project_rsoc, project_soc
from omc.sdp.cuts import N_PIECES, chord_coefficients, region_bounds


@pytest.mark.parametrize("cuts_type", ["linear", "linear2", "linear3"])
def test_regions_partition_minus1_1(cuts_type):
    """The disjunctive regions must cover [-1, 1] exactly (they partition
    the range of v = U' x)."""
    vhat = np.array([0.37, -0.6])
    pieces = N_PIECES[cuts_type]
    los, his = [], []
    for code in range(pieces):
        lo, hi = region_bounds(cuts_type, np.full(2, code), vhat)
        los.append(lo)
        his.append(hi)
        assert np.all(lo <= hi + 1e-12)
    los, his = np.array(los), np.array(his)
    assert np.allclose(los[0], -1.0)
    assert np.allclose(his[-1], 1.0)
    # consecutive regions share endpoints
    for c in range(pieces - 1):
        np.testing.assert_allclose(his[c], los[c + 1], atol=1e-12)


@pytest.mark.parametrize("cuts_type", ["linear", "linear2", "linear3"])
def test_chord_overestimates_square_on_region(cuts_type):
    rng = np.random.default_rng(0)
    for _ in range(50):
        vhat = rng.uniform(-1, 1, size=3)
        code = rng.integers(0, N_PIECES[cuts_type], size=3)
        lo, hi = region_bounds(cuts_type, code, vhat)
        c, b = chord_coefficients(lo, hi)
        for t in np.linspace(0, 1, 11):
            v = lo + t * (hi - lo)
            assert np.all(c * v + b >= v**2 - 1e-12)
        # chord is exact at the region endpoints
        np.testing.assert_allclose(c * lo + b, lo**2, atol=1e-12)
        np.testing.assert_allclose(c * hi + b, hi**2, atol=1e-12)


def test_project_psd_batched():
    rng = np.random.default_rng(1)
    M = rng.standard_normal((4, 6, 6))
    M = 0.5 * (M + M.transpose(0, 2, 1))
    P = np.asarray(project_psd(jnp.asarray(M)))
    w = np.linalg.eigvalsh(P)
    assert (w >= -1e-8).all()
    # idempotent & closest-point property vs direct eig clamp
    for i in range(4):
        wi, Vi = np.linalg.eigh(M[i])
        ref = (Vi * np.maximum(wi, 0)) @ Vi.T
        np.testing.assert_allclose(P[i], ref, atol=1e-6)


def test_project_soc_cases():
    # inside
    t, x = project_soc(jnp.asarray([5.0]), jnp.asarray([[3.0, 0.0]]))
    np.testing.assert_allclose(np.asarray(t), [5.0])
    # polar -> origin
    t, x = project_soc(jnp.asarray([-5.0]), jnp.asarray([[3.0, 0.0]]))
    np.testing.assert_allclose(np.asarray(t), [0.0])
    np.testing.assert_allclose(np.asarray(x), [[0.0, 0.0]])
    # boundary blend
    t, x = project_soc(jnp.asarray([0.0]), jnp.asarray([[2.0, 0.0]]))
    np.testing.assert_allclose(np.asarray(t), [1.0])
    np.testing.assert_allclose(np.asarray(x), [[1.0, 0.0]])


def test_project_rsoc_membership():
    rng = np.random.default_rng(2)
    u = jnp.asarray(rng.standard_normal(16))
    v = jnp.asarray(rng.standard_normal(16))
    x = jnp.asarray(rng.standard_normal((16, 3)))
    up, vp, xp = project_rsoc(u, v, x)
    up, vp, xp = map(np.asarray, (up, vp, xp))
    assert (up >= -1e-9).all() and (vp >= -1e-9).all()
    assert (2 * up * vp + 1e-7 >= (xp**2).sum(-1)).all()


def test_project_psd_ns_sign_schedule():
    """The quintic/cubic matrix-sign schedule matches the float64 eigh
    projection (omc/ops/polar.py): exact-arithmetic error ~1e-13, float32
    ~1e-5 relative."""
    from omc.ops.polar import project_psd_ns

    rng = np.random.default_rng(7)
    for scale in (1.0, 50.0, 1e-3):
        M = rng.standard_normal((4, 60, 60)) * scale
        M = 0.5 * (M + M.transpose(0, 2, 1))
        w, V = np.linalg.eigh(M)
        ref = np.einsum("bik,bk,bjk->bij", V, np.maximum(w, 0.0), V)
        P64 = np.asarray(project_psd_ns(jnp.asarray(M, jnp.float64)))
        np.testing.assert_allclose(P64, ref, atol=1e-10 * scale)
        P32 = np.asarray(project_psd_ns(jnp.asarray(M, jnp.float32)), np.float64)
        assert np.abs(P32 - ref).max() <= 1e-4 * max(np.abs(ref).max(), scale)


def test_put_packed_roundtrip():
    from omc.ops.transfer import get_all, put_packed

    rng = np.random.default_rng(3)
    arrays = [
        rng.standard_normal((4, 3, 2)),
        rng.standard_normal((7,)),
        np.zeros((2, 2)),
    ]
    devs = put_packed(arrays, jnp.float32)
    assert [tuple(d.shape) for d in devs] == [(4, 3, 2), (7,), (2, 2)]
    back = get_all(devs)
    for a, b in zip(arrays, back):
        np.testing.assert_allclose(b, a.astype(np.float32), rtol=1e-6)
