"""fused BN+ReLU+max-pool tail (utils.layers.fused_bn_relu_maxpool):
values, running-stat updates, and gradients must match the naive
max(relu(bn(z))) chain — it's a selection identity, not an approximation.
"""

import numpy as np

import jax
import jax.numpy as jnp
from flax import nnx

from learning3d_tpu.utils.layers import fused_bn_relu_maxpool


def make_bn(c=16, negative_scales=True):
    bn = nnx.BatchNorm(c, use_running_average=False, momentum=0.9, rngs=nnx.Rngs(0))
    if negative_scales:  # exercise the min-selection branch
        sc = np.ones(c, np.float32)
        sc[::3] = -0.7
        bn.scale[...] = jnp.asarray(sc)
    bn.mean[...] = 0.1 * jnp.arange(c, dtype=jnp.float32)
    bn.var[...] = 1.0 + 0.05 * jnp.arange(c, dtype=jnp.float32)
    return bn


class TestFusedBnReluMaxpool:
    def test_values_and_stats_train_mode(self):
        z = jax.random.normal(jax.random.PRNGKey(1), (4, 32, 16))
        bn_a, bn_b = make_bn(), make_bn()
        naive = jnp.max(jax.nn.relu(bn_a(z)), axis=-2)
        fused = fused_bn_relu_maxpool(z, bn_b)
        np.testing.assert_allclose(np.asarray(fused), np.asarray(naive), atol=1e-5)
        np.testing.assert_allclose(
            np.asarray(bn_b.mean[...]), np.asarray(bn_a.mean[...]), atol=1e-6
        )
        np.testing.assert_allclose(
            np.asarray(bn_b.var[...]), np.asarray(bn_a.var[...]), atol=1e-6
        )

    def test_values_eval_mode(self):
        z = jax.random.normal(jax.random.PRNGKey(2), (4, 32, 16))
        bn_a, bn_b = make_bn(), make_bn()
        naive = jnp.max(jax.nn.relu(bn_a(z, use_running_average=True)), axis=-2)
        fused = fused_bn_relu_maxpool(z, bn_b, use_running_average=True)
        np.testing.assert_allclose(np.asarray(fused), np.asarray(naive), atol=1e-5)
        # eval: running stats untouched
        np.testing.assert_array_equal(np.asarray(bn_b.mean[...]), np.asarray(make_bn().mean[...]))

    def test_gradients_match(self):
        z = jax.random.normal(jax.random.PRNGKey(3), (2, 24, 8))

        def naive_loss(z):
            bn = make_bn(8)
            return jnp.sum(jnp.max(jax.nn.relu(bn(z)), axis=-2) ** 2)

        def fused_loss(z):
            bn = make_bn(8)
            return jnp.sum(fused_bn_relu_maxpool(z, bn) ** 2)

        ga = jax.grad(naive_loss)(z)
        gb = jax.grad(fused_loss)(z)
        np.testing.assert_allclose(np.asarray(gb), np.asarray(ga), atol=1e-5)

    def test_pointnet_pooled_features_matches_naive(self):
        from learning3d_tpu.models import PointNet

        x = jax.random.normal(jax.random.PRNGKey(4), (3, 64, 3))
        for train in (True, False):
            pn_a = PointNet(emb_dims=32, use_bn=True, rngs=nnx.Rngs(0))
            pn_b = PointNet(emb_dims=32, use_bn=True, rngs=nnx.Rngs(0))
            if not train:
                pn_a.eval(), pn_b.eval()
            naive = jnp.max(pn_a(x), axis=-2)
            fused = pn_b.pooled_features(x)
            np.testing.assert_allclose(
                np.asarray(fused), np.asarray(naive), atol=1e-5, err_msg=f"train={train}"
            )
            # the whole BN stack (incl. the fused last stage) updated identically
            for bna, bnb in zip(pn_a.bns, pn_b.bns):
                np.testing.assert_allclose(
                    np.asarray(bnb.mean[...]), np.asarray(bna.mean[...]), atol=1e-6
                )

    def test_linear_fusion_values_grads_stats(self):
        """Full-stage fusion (linear_bn_relu_maxpool, Gram-matrix custom
        VJP): values, ALL parameter grads, dx, and running-stat EMAs must
        match the naive conv->bn->relu->maxpool chain in train mode."""
        from learning3d_tpu.utils.layers import linear_bn_relu_maxpool

        B, N, K, E = 3, 29, 8, 12
        x = jax.random.normal(jax.random.PRNGKey(6), (B, N, K))

        def build():
            lin = nnx.Linear(K, E, rngs=nnx.Rngs(7))
            bn = make_bn(E)
            return lin, bn

        def naive_loss(params, x):
            lin, bn = params
            out = jnp.max(jax.nn.relu(bn(lin(x))), axis=-2)
            return jnp.sum(jnp.sin(out) * (1.0 + jnp.arange(E)))

        def fused_loss(params, x):
            lin, bn = params
            out = linear_bn_relu_maxpool(x, lin, bn)
            return jnp.sum(jnp.sin(out) * (1.0 + jnp.arange(E)))

        la, ba = build()
        lb, bb = build()
        va = naive_loss((la, ba), x)
        vb = fused_loss((lb, bb), x)
        np.testing.assert_allclose(float(vb), float(va), rtol=1e-4)
        # train-mode running-stat EMA identical
        np.testing.assert_allclose(
            np.asarray(bb.mean[...]), np.asarray(ba.mean[...]), atol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(bb.var[...]), np.asarray(ba.var[...]), atol=1e-4
        )

        ga = nnx.grad(naive_loss, argnums=(0, 1))(build(), x)
        gb = nnx.grad(fused_loss, argnums=(0, 1))(build(), x)
        fa = jax.tree_util.tree_leaves(ga)
        fb = jax.tree_util.tree_leaves(gb)
        assert len(fa) == len(fb) and len(fa) >= 4
        for a, b in zip(fa, fb):
            np.testing.assert_allclose(
                np.asarray(b), np.asarray(a), atol=2e-3 * max(1.0, float(jnp.max(jnp.abs(a))))
            )
        gxa = jax.grad(lambda x: naive_loss(build(), x))(x)
        gxb = jax.grad(lambda x: fused_loss(build(), x))(x)
        np.testing.assert_allclose(np.asarray(gxb), np.asarray(gxa), atol=1e-3)

    def test_linear_fusion_through_pointnet_grads(self):
        """End-to-end: grads of a pooled PointNet loss agree between the
        pooled_features fused path and the naive __call__+max chain."""
        from learning3d_tpu.models import PointNet

        x = jax.random.normal(jax.random.PRNGKey(8), (2, 48, 3))

        def loss(pn, x, fused):
            out = pn.pooled_features(x) if fused else jnp.max(pn(x), axis=-2)
            return jnp.mean(out ** 2)

        pn_a = PointNet(emb_dims=16, use_bn=True, rngs=nnx.Rngs(0))
        pn_b = PointNet(emb_dims=16, use_bn=True, rngs=nnx.Rngs(0))
        ga = nnx.grad(loss)(pn_a, x, False)
        gb = nnx.grad(loss)(pn_b, x, True)
        for a, b in zip(jax.tree_util.tree_leaves(ga), jax.tree_util.tree_leaves(gb)):
            np.testing.assert_allclose(
                np.asarray(b), np.asarray(a), atol=1e-3 * max(1.0, float(jnp.max(jnp.abs(a))))
            )

    def test_classifier_uses_fused_path(self):
        from learning3d_tpu.models import Classifier, PointNet

        x = jax.random.normal(jax.random.PRNGKey(5), (3, 64, 3))

        def build():
            return Classifier(
                PointNet(emb_dims=32, use_bn=True, rngs=nnx.Rngs(0)), num_classes=5,
                rngs=nnx.Rngs(1),
            )

        m_fast = build()
        m_naive = build()
        m_fast.eval(), m_naive.eval()
        # force the naive route by hiding pooled_features
        naive = m_naive.pooling(m_naive.feature_model(x))
        naive = m_naive.dropout1(jax.nn.relu(m_naive.bn1(m_naive.linear1(naive))))
        naive = m_naive.dropout2(jax.nn.relu(m_naive.bn2(m_naive.linear2(naive))))
        naive = m_naive.linear3(naive)
        np.testing.assert_allclose(np.asarray(m_fast(x)), np.asarray(naive), atol=1e-5)
