import numpy as np
import jax
import jax.numpy as jnp
import pytest

from animsnapbases_tpu.ops import (
    jacobi_eigh3, jacobi_eigh2, svd3x3, svd2x2, polar_rotation3x3,
    top_mode_rows, coo_matvec, coo_matvec_cols, snapshot_pod,
)


RNG = np.random.default_rng(0)


def random_spd(n):
    a = RNG.normal(size=(n, n))
    return a @ a.T


@pytest.mark.parametrize("seed", range(5))
def test_jacobi_eigh3_matches_numpy(seed):
    rng = np.random.default_rng(seed)
    a = rng.normal(size=(3, 3))
    S = a @ a.T
    w, V = jacobi_eigh3(jnp.asarray(S))
    w_np = np.sort(np.linalg.eigvalsh(S))[::-1]
    np.testing.assert_allclose(np.asarray(w), w_np, rtol=1e-10, atol=1e-10)
    # eigen equation and orthogonality
    np.testing.assert_allclose(S @ np.asarray(V), np.asarray(V) * np.asarray(w),
                               atol=1e-8)
    np.testing.assert_allclose(np.asarray(V).T @ np.asarray(V), np.eye(3),
                               atol=1e-12)


def test_jacobi_eigh3_degenerate():
    w, V = jacobi_eigh3(jnp.eye(3) * 2.0)
    np.testing.assert_allclose(np.asarray(w), [2, 2, 2], atol=1e-14)
    np.testing.assert_allclose(np.asarray(V).T @ np.asarray(V), np.eye(3),
                               atol=1e-14)


def test_jacobi_eigh2():
    S = np.array([[2.0, 1.0], [1.0, 3.0]])
    w, V = jacobi_eigh2(jnp.asarray(S))
    w_np = np.sort(np.linalg.eigvalsh(S))[::-1]
    np.testing.assert_allclose(np.asarray(w), w_np, rtol=1e-12)
    np.testing.assert_allclose(S @ np.asarray(V), np.asarray(V) * np.asarray(w),
                               atol=1e-10)


@pytest.mark.parametrize("seed", range(8))
def test_svd3x3_random(seed):
    rng = np.random.default_rng(seed)
    F = rng.normal(size=(3, 3))
    U, s, Vt = (np.asarray(x) for x in svd3x3(jnp.asarray(F)))
    s_np = np.linalg.svd(F, compute_uv=False)
    np.testing.assert_allclose(s, s_np, rtol=1e-8, atol=1e-10)
    np.testing.assert_allclose(U @ np.diag(s) @ Vt, F, atol=1e-8)
    np.testing.assert_allclose(U.T @ U, np.eye(3), atol=1e-8)
    np.testing.assert_allclose(Vt @ Vt.T, np.eye(3), atol=1e-8)


def test_svd3x3_near_identity():
    """The PD strain clamp operates on F ~ I (triple-degenerate sigma)."""
    F = np.eye(3) + 1e-4 * RNG.normal(size=(3, 3))
    U, s, Vt = (np.asarray(x) for x in svd3x3(jnp.asarray(F)))
    np.testing.assert_allclose(U @ np.diag(s) @ Vt, F, atol=1e-10)
    np.testing.assert_allclose(s, np.linalg.svd(F, compute_uv=False), atol=1e-8)


def test_svd3x3_rank_deficient():
    F = np.outer([1.0, 2.0, 3.0], [1.0, 0.0, -1.0])
    U, s, Vt = (np.asarray(x) for x in svd3x3(jnp.asarray(F)))
    np.testing.assert_allclose(U @ np.diag(s) @ Vt, F, atol=1e-8)
    np.testing.assert_allclose(U.T @ U, np.eye(3), atol=1e-8)
    assert s[1] < 1e-8 and s[2] < 1e-8


@pytest.mark.parametrize("seed", range(5))
def test_svd2x2(seed):
    rng = np.random.default_rng(seed)
    F = rng.normal(size=(2, 2))
    U, s, Vt = (np.asarray(x) for x in svd2x2(jnp.asarray(F)))
    np.testing.assert_allclose(s, np.linalg.svd(F, compute_uv=False),
                               rtol=1e-8, atol=1e-10)
    np.testing.assert_allclose(U @ np.diag(s) @ Vt, F, atol=1e-8)
    np.testing.assert_allclose(U.T @ U, np.eye(2), atol=1e-8)


def test_polar_rotation():
    rng = np.random.default_rng(3)
    # random rotation + stretch
    q = rng.normal(size=(3, 3))
    R0 = np.linalg.qr(q)[0]
    if np.linalg.det(R0) < 0:
        R0[:, 0] *= -1
    S = random_spd(3) + 3 * np.eye(3)
    F = R0 @ S
    R = np.asarray(polar_rotation3x3(jnp.asarray(F)))
    np.testing.assert_allclose(R, R0, atol=1e-7)
    assert np.linalg.det(R) == pytest.approx(1.0, abs=1e-8)


def test_polar_rotation_inverted():
    F = np.diag([1.0, 1.0, -1.0])  # reflection
    R = np.asarray(polar_rotation3x3(jnp.asarray(F)))
    assert np.linalg.det(R) == pytest.approx(1.0, abs=1e-8)


def test_top_mode_rows_matches_svd():
    rng = np.random.default_rng(4)
    X = rng.normal(size=(3, 40))
    sigma, w = top_mode_rows(jnp.asarray(X))
    U, s, Vt = np.linalg.svd(X, full_matrices=False)
    np.testing.assert_allclose(float(sigma), s[0], rtol=1e-10)
    ref = s[0] * Vt[0]
    w = np.asarray(w)
    # sign-invariant comparison
    sign = np.sign(w @ ref)
    np.testing.assert_allclose(sign * w, ref, atol=1e-8)
    # the rank-1 deflation quantity is fully sign-invariant
    c_ref = (X @ ref) / (ref @ ref)
    c_new = (X @ w) / (w @ w)
    np.testing.assert_allclose(np.outer(w, c_new), np.outer(ref, c_ref),
                               atol=1e-8)


def test_coo_matvec():
    from scipy.sparse import random as sprandom
    rng = np.random.default_rng(5)
    A = sprandom(7, 5, density=0.4, random_state=1).tocoo()
    x = rng.normal(size=5)
    y = coo_matvec(jnp.asarray(A.row), jnp.asarray(A.col),
                   jnp.asarray(A.data), jnp.asarray(x), 7)
    np.testing.assert_allclose(np.asarray(y), A @ x, atol=1e-12)
    X = rng.normal(size=(5, 3))
    Y = coo_matvec_cols(jnp.asarray(A.row), jnp.asarray(A.col),
                        jnp.asarray(A.data), jnp.asarray(X), 7)
    np.testing.assert_allclose(np.asarray(Y), A @ X, atol=1e-12)


def test_snapshot_pod_matches_svd():
    rng = np.random.default_rng(6)
    X = rng.normal(size=(200, 12))
    U, s, Vt = (np.asarray(v) for v in snapshot_pod(jnp.asarray(X)))
    s_np = np.linalg.svd(X, compute_uv=False)
    np.testing.assert_allclose(s, s_np, rtol=1e-8)
    np.testing.assert_allclose(U @ np.diag(s) @ Vt, X, atol=1e-8)
    np.testing.assert_allclose(U.T @ U, np.eye(12), atol=1e-8)


def test_vmapped_svd3x3_batch():
    rng = np.random.default_rng(7)
    Fs = rng.normal(size=(64, 3, 3))
    U, s, Vt = jax.vmap(svd3x3)(jnp.asarray(Fs))
    rec = np.einsum("bij,bj,bjk->bik", np.asarray(U), np.asarray(s),
                    np.asarray(Vt))
    np.testing.assert_allclose(rec, Fs, atol=1e-8)
