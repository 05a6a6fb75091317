"""Kernel correctness: Chamfer + EMD + blocked kNN vs brute-force oracles.

The Pallas TPU paths are exercised by tools/check_tpu_kernels.py on real
hardware; here the XLA twins (the same code path models use on CPU) are
pinned against numpy.
"""

import jax
import jax.numpy as jnp
import numpy as np

from learning3d_tpu.kernels import chamfer, emd, knn
from learning3d_tpu.losses import losses


def np_sqdist(a, b):
    return np.sum((a[:, :, None] - b[:, None]) ** 2, -1)


class TestChamfer:
    def test_nn_distance_matches_bruteforce(self):
        k1, k2 = jax.random.split(jax.random.PRNGKey(0))
        x = jax.random.normal(k1, (2, 96, 3))
        y = jax.random.normal(k2, (2, 64, 3))
        d1, i1, d2, i2 = chamfer.nn_distance(x, y, use_pallas=False)
        D = np_sqdist(np.asarray(x), np.asarray(y))
        np.testing.assert_allclose(d1, D.min(-1), atol=1e-4)
        np.testing.assert_array_equal(i1, D.argmin(-1))
        np.testing.assert_allclose(d2, D.min(-2), atol=1e-4)
        np.testing.assert_array_equal(i2, D.argmin(-2))

    def test_loss_zero_on_identical(self):
        x = jax.random.normal(jax.random.PRNGKey(1), (2, 64, 3))
        loss = losses.chamfer_distance_loss(x, x)
        assert float(loss) < 1e-4

    def test_grad_matches_autodiff_oracle(self):
        k1, k2 = jax.random.split(jax.random.PRNGKey(2))
        x = jax.random.normal(k1, (2, 32, 3))
        y = jax.random.normal(k2, (2, 24, 3))

        def custom(x, y):
            d1, d2 = chamfer.chamfer_distance(x, y)
            return jnp.sum(d1) + 0.5 * jnp.sum(d2)

        def oracle(x, y):
            d = (
                jnp.sum(x * x, -1)[..., :, None]
                + jnp.sum(y * y, -1)[..., None, :]
                - 2 * jnp.einsum("bnc,bmc->bnm", x, y, precision=jax.lax.Precision.HIGHEST)
            )
            return jnp.sum(jnp.min(d, -1)) + 0.5 * jnp.sum(jnp.min(d, -2))

        gx_c, gy_c = jax.grad(custom, (0, 1))(x, y)
        gx_o, gy_o = jax.grad(oracle, (0, 1))(x, y)
        np.testing.assert_allclose(gx_c, gx_o, atol=1e-4)
        np.testing.assert_allclose(gy_c, gy_o, atol=1e-4)


class TestEMD:
    def test_match_marginals(self):
        k1, k2 = jax.random.split(jax.random.PRNGKey(3))
        x = jax.random.normal(k1, (2, 32, 3))
        y = jax.random.normal(k2, (2, 32, 3))
        m = np.asarray(emd.approx_match(x, y))
        assert m.min() >= 0
        # rows/cols approximately sum to 1 for n == m
        np.testing.assert_allclose(m.sum(-1), 1.0, atol=0.05)
        np.testing.assert_allclose(m.sum(-2), 1.0, atol=0.05)

    def test_zero_on_identical(self):
        x = jax.random.normal(jax.random.PRNGKey(4), (1, 32, 3))
        cost = emd.emd_loss(x, x)
        assert float(cost[0]) / 32 < 1e-3

    def test_close_to_optimal_transport(self):
        from scipy.optimize import linear_sum_assignment

        rng = np.random.RandomState(0)
        x = rng.randn(1, 24, 3).astype(np.float32)
        y = rng.randn(1, 24, 3).astype(np.float32)
        cost = float(emd.emd_loss(jnp.asarray(x), jnp.asarray(y))[0])
        C = np.sqrt(np_sqdist(x, y))[0]
        r, c = linear_sum_assignment(C)
        opt = C[r, c].sum()
        assert cost >= opt * 0.95  # can't beat the optimum (tolerance for fp)
        assert cost <= opt * 1.5  # approximation should be in the ballpark

    def test_grad_consistent_with_fixed_match_autodiff(self):
        k1, k2 = jax.random.split(jax.random.PRNGKey(5))
        x = jax.random.normal(k1, (1, 16, 3))
        y = jax.random.normal(k2, (1, 16, 3))

        def fixed_match_cost(x, y):
            m = jax.lax.stop_gradient(emd.approx_match(x, y))
            return jnp.sum(emd.match_cost(m, x, y))

        gx_o, gy_o = jax.grad(fixed_match_cost, (0, 1))(x, y)
        gx_c, gy_c = jax.grad(lambda a, b: jnp.sum(emd.emd_loss(a, b)), (0, 1))(x, y)
        np.testing.assert_allclose(gx_c, gx_o, atol=1e-3)
        np.testing.assert_allclose(gy_c, gy_o, atol=1e-3)


class TestBlockedKNN:
    def test_matches_dense(self):
        k1, k2 = jax.random.split(jax.random.PRNGKey(6))
        q = jax.random.normal(k1, (2, 100, 3))
        p = jax.random.normal(k2, (2, 64, 3))
        d, idx = knn.knn_blocked(q, p, 5, tile=32)
        D = np_sqdist(np.asarray(q), np.asarray(p))
        ref_idx = np.argsort(D, -1)[..., :5]
        np.testing.assert_array_equal(np.sort(np.asarray(idx), -1), np.sort(ref_idx, -1))
        np.testing.assert_allclose(
            np.asarray(d), np.take_along_axis(D, np.asarray(idx), -1), atol=1e-4
        )

    def test_streamed_point_axis_matches_dense(self):
        """M > point_tile streams point chunks with a running top-k merge
        (the large-N path: one top_k over the full M row faulted the TPU
        worker at M=65536). Points cluster near the origin so zero-padded
        chunk rows would win the local top-k if padding were wrong."""
        k1, k2 = jax.random.split(jax.random.PRNGKey(8))
        q = jax.random.normal(k1, (2, 70, 3))
        p = jax.random.normal(k2, (2, 300, 3)) * 0.01
        d, idx = knn.knn_blocked(q, p, 5, tile=32, point_tile=64)
        D = np_sqdist(np.asarray(q), np.asarray(p))
        ref_idx = np.argsort(D, -1)[..., :5]
        np.testing.assert_array_equal(np.sort(np.asarray(idx), -1), np.sort(ref_idx, -1))
        np.testing.assert_allclose(
            np.asarray(d), np.take_along_axis(D, np.asarray(idx), -1), atol=1e-4
        )


class TestLossReductions:
    def test_frobenius_identity(self):
        from learning3d_tpu.ops import se3

        g = se3.exp(0.3 * jax.random.normal(jax.random.PRNGKey(7), (4, 6)))
        # perfect estimate: pred = g^{-1}, igt = g -> loss 0
        assert float(losses.frobenius_norm_loss(se3.inverse(g), g)) < 1e-8

    def test_rmse_features_is_sum(self):
        r = jnp.ones((2, 3, 4))
        np.testing.assert_allclose(float(losses.rmse_features_loss(r)), 24.0)

    def test_classification_matches_manual(self):
        logits = jax.random.normal(jax.random.PRNGKey(8), (8, 10))
        logp = jax.nn.log_softmax(logits)
        labels = jnp.arange(8) % 10
        ref = -np.mean([np.asarray(logp)[i, int(labels[i])] for i in range(8)])
        np.testing.assert_allclose(float(losses.classification_loss(logp, labels)), ref, atol=1e-6)

    def test_correspondence_loss_runs(self):
        pred = jax.random.normal(jax.random.PRNGKey(9), (2, 16, 16))
        gt = jnp.eye(16)[None].repeat(2, axis=0)
        val = float(losses.correspondence_loss(pred, gt))
        assert np.isfinite(val) and val > 0
