"""Entry-wise 3x3 projections vs numpy-SVD references (including the
inversion-handling semantics of the reference constraints)."""

import numpy as np
import jax.numpy as jnp
import pytest

from animsnapbases_tpu.ops.strain3d import (
    polar_rotation,
    svd3_rotation_basis,
    tet_strain_fhat,
)


def _entries(F):
    """(b, 3, 3) -> tuple of 9 (b,) arrays."""
    return tuple(jnp.asarray(F[:, i, j]) for i in range(3) for j in range(3))


def _to_mats(entries, b):
    out = np.empty((b, 3, 3))
    for k, e in enumerate(entries):
        out[:, k // 3, k % 3] = np.asarray(e)
    return out


def _batch(seed, n=64, near_identity=False, inverted=False):
    rng = np.random.default_rng(seed)
    F = rng.normal(size=(n, 3, 3))
    if near_identity:
        F = np.eye(3) + 1e-3 * rng.normal(size=(n, 3, 3))
    if inverted:
        F[:, :, 0] *= -1
    return F


def ref_tet_strain(F, smin, smax):
    U, s, Vt = np.linalg.svd(F)
    s = np.clip(s, smin, smax)
    if np.linalg.det(F) < 0:
        s[2] = -s[2]
    return U @ np.diag(s) @ Vt


def ref_polar(F):
    U, _, Vt = np.linalg.svd(F)
    R = U @ Vt
    if np.linalg.det(R) < 0:
        U = U.copy()
        U[:, 2] *= -1
        R = U @ Vt
    return R


@pytest.mark.parametrize("kind", ["random", "near_identity", "inverted"])
def test_svd_rotation_basis_reconstructs(kind):
    F = _batch(0, near_identity=kind == "near_identity",
               inverted=kind == "inverted")
    U, s, V = svd3_rotation_basis(_entries(F))
    Um = _to_mats(U, len(F))
    Vm = _to_mats(V, len(F))
    s = np.stack([np.asarray(x) for x in s], axis=1)
    s_np = np.linalg.svd(F, compute_uv=False)
    np.testing.assert_allclose(s, s_np, atol=1e-8)
    for i in range(len(F)):
        # det(U) = det(V) = +1
        assert np.linalg.det(Um[i]) == pytest.approx(1.0, abs=1e-6)
        assert np.linalg.det(Vm[i]) == pytest.approx(1.0, abs=1e-6)
        np.testing.assert_allclose(Um[i].T @ Um[i], np.eye(3), atol=1e-7)
        # F = U diag(s0, s1, +-s2) V^T
        t2 = np.sign(np.linalg.det(F[i])) * s[i, 2]
        rec = Um[i] @ np.diag([s[i, 0], s[i, 1], t2]) @ Vm[i].T
        np.testing.assert_allclose(rec, F[i], atol=1e-7)


@pytest.mark.parametrize("kind", ["random", "near_identity", "inverted"])
def test_tet_strain_fhat_matches_reference(kind):
    F = _batch(1, near_identity=kind == "near_identity",
               inverted=kind == "inverted")
    smin, smax = 0.8, 1.2
    got = _to_mats(tet_strain_fhat(_entries(F), smin, smax), len(F))
    for i in range(len(F)):
        ref = ref_tet_strain(F[i], smin, smax)
        np.testing.assert_allclose(got[i], ref, atol=1e-7)


@pytest.mark.parametrize("kind", ["random", "near_identity", "inverted"])
def test_polar_matches_reference(kind):
    F = _batch(2, near_identity=kind == "near_identity",
               inverted=kind == "inverted")
    got = _to_mats(polar_rotation(_entries(F)), len(F))
    for i in range(len(F)):
        ref = ref_polar(F[i])
        np.testing.assert_allclose(got[i], ref, atol=1e-6)
        assert np.linalg.det(got[i]) == pytest.approx(1.0, abs=1e-6)


def test_zero_matrix_is_finite():
    F = np.zeros((4, 3, 3))
    out = _to_mats(tet_strain_fhat(_entries(F), 0.9, 1.1), 4)
    assert np.isfinite(out).all()
    out = _to_mats(polar_rotation(_entries(F)), 4)
    assert np.isfinite(out).all()
