"""Jacobi 3x3 Kabsch solver vs LAPACK SVD oracle."""

import jax
import jax.numpy as jnp
import numpy as np

from learning3d_tpu.utils.svd3 import eigh3x3, kabsch_rotation_3x3


def ref_kabsch(H):
    U, S, Vt = np.linalg.svd(H)
    V = Vt.T
    D = np.diag([1.0, 1.0, np.linalg.det(V @ U.T)])
    return V @ D @ U.T


def test_eigh3x3():
    rng = np.random.RandomState(0)
    M = rng.randn(16, 3, 3).astype(np.float32)
    A = M @ M.transpose(0, 2, 1)
    lam, V = eigh3x3(jnp.asarray(A))
    lam, V = np.asarray(lam), np.asarray(V)
    # descending, orthonormal, reconstructs A
    assert np.all(lam[:, :-1] >= lam[:, 1:] - 1e-4)
    np.testing.assert_allclose(
        V @ V.transpose(0, 2, 1), np.tile(np.eye(3), (16, 1, 1)), atol=1e-5
    )
    recon = V @ (lam[..., None] * V.transpose(0, 2, 1))
    np.testing.assert_allclose(recon, A, atol=1e-3)


def test_kabsch_matches_svd_oracle():
    rng = np.random.RandomState(1)
    worst = 0.0
    for trial in range(60):
        kind = trial % 3
        if kind == 0:
            H = rng.randn(3, 3)
        elif kind == 1:  # reflection-prone
            H = rng.randn(3, 3)
            H[:, 2] *= -3
        else:  # near rank-2 (planar clouds)
            a = rng.randn(3, 2)
            H = a @ rng.randn(2, 3) + 1e-6 * rng.randn(3, 3)
        R = np.asarray(kabsch_rotation_3x3(jnp.asarray(H[None], jnp.float32)))[0]
        worst = max(worst, np.abs(R - ref_kabsch(H)).max())
    assert worst < 1e-3, worst


def test_always_proper_rotation():
    H = jnp.asarray(np.random.RandomState(2).randn(64, 3, 3), jnp.float32)
    R = np.asarray(kabsch_rotation_3x3(H))
    np.testing.assert_allclose(np.linalg.det(R), 1.0, atol=1e-4)
    np.testing.assert_allclose(
        R @ R.transpose(0, 2, 1), np.tile(np.eye(3), (64, 1, 1)), atol=1e-4
    )


def test_differentiable():
    H = jnp.asarray(np.random.RandomState(3).randn(2, 3, 3), jnp.float32)
    g = jax.grad(lambda h: jnp.sum(kabsch_rotation_3x3(h)))(H)
    assert np.all(np.isfinite(np.asarray(g)))
