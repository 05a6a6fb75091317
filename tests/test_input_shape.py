"""input_shape='bnc'|'bcn' convention across the model zoo.

The reference validates this on every encoder (models/pointnet.py:12-13,
55-61). Each case calls the model once channel-last, then flips
``input_shape`` and calls with the transposed input: outputs must match
exactly (the conversion happens at the model boundary, before any math).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from flax import nnx

from learning3d_tpu import models

B, N = 2, 32


def cloud(seed, n=N, c=3):
    return jax.random.normal(jax.random.PRNGKey(seed), (B, n, c))


def tree_allclose(a, b):
    la, lb = jax.tree.leaves(a), jax.tree.leaves(b)
    assert len(la) == len(lb)
    for x, y in zip(la, lb):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), atol=1e-5)


def flip_and_compare(model, *inputs, **kwargs):
    """model(inputs) == model_bcn(transposed inputs)."""
    model.eval()
    out_bnc = model(*inputs, **kwargs)
    model.input_shape = "bcn"
    out_bcn = model(*(jnp.swapaxes(x, 1, 2) for x in inputs), **kwargs)
    model.input_shape = "bnc"
    tree_allclose(out_bnc, out_bcn)


class TestInputShapeConvention:
    def test_validation_rejects_garbage(self):
        for ctor in (
            lambda: models.PointNet(emb_dims=16, input_shape="nbc", rngs=nnx.Rngs(0)),
            lambda: models.DCP(
                models.PointNet(emb_dims=16, rngs=nnx.Rngs(0)),
                pointer_="identity", input_shape="cbn", rngs=nnx.Rngs(0),
            ),
            lambda: models.MaskNet2(input_shape="xyz", rngs=nnx.Rngs(0)),
        ):
            with pytest.raises(ValueError):
                ctor()

    def test_pointnet(self):
        flip_and_compare(models.PointNet(emb_dims=32, rngs=nnx.Rngs(0)), cloud(0))

    def test_dgcnn(self):
        flip_and_compare(models.DGCNN(emb_dims=32, k=8, rngs=nnx.Rngs(0)), cloud(1))

    def test_ppfnet(self):
        net = models.PPFNet(emb_dims=16, num_neighbors=8, rngs=nnx.Rngs(0))
        net.eval()
        xyz, normals = cloud(2), cloud(3)
        normals = normals / jnp.linalg.norm(normals, axis=-1, keepdims=True)
        out_bnc = net(xyz, normals)
        net.input_shape = "bcn"
        out_bcn = net(jnp.swapaxes(xyz, 1, 2), jnp.swapaxes(normals, 1, 2))
        tree_allclose(out_bnc, out_bcn)

    def test_dcp(self):
        net = models.DCP(
            models.PointNet(emb_dims=32, rngs=nnx.Rngs(0)), pointer_="identity",
            rngs=nnx.Rngs(1),
        )
        flip_and_compare(net, cloud(4), cloud(5))

    def test_ipcrnet(self):
        net = models.iPCRNet(models.PointNet(emb_dims=32, rngs=nnx.Rngs(0)), rngs=nnx.Rngs(1))
        flip_and_compare(net, cloud(6), cloud(7), max_iteration=2)

    def test_pointnetlk(self):
        net = models.PointNetLK(models.PointNet(emb_dims=32, use_bn=True, rngs=nnx.Rngs(0)))
        flip_and_compare(net, cloud(8), cloud(9), maxiter=2)

    def test_rpmnet(self):
        net = models.RPMNet(
            feature_model=models.PPFNet(emb_dims=16, num_neighbors=8, rngs=nnx.Rngs(0)),
            rngs=nnx.Rngs(1),
        )
        t, s = cloud(10, c=6), cloud(11, c=6)
        flip_and_compare(net, t, s)

    def test_deepgmr(self):
        net = models.DeepGMR(use_rri=False, d_model=32, n_clusters=4, rngs=nnx.Rngs(0))
        flip_and_compare(net, cloud(12), cloud(13))

    def test_masknet(self):
        net = models.MaskNet(models.PointNet(emb_dims=32, rngs=nnx.Rngs(0)), rngs=nnx.Rngs(1))
        flip_and_compare(net, cloud(14), cloud(15))

    def test_masknet2(self):
        flip_and_compare(models.MaskNet2(rngs=nnx.Rngs(0)), cloud(16), cloud(17))

    def test_prnet(self):
        net = models.PRNet(
            emb_dims=32, num_keypoints=16, num_subsampled_points=24, num_iters=1,
            rngs=nnx.Rngs(0),
        )
        flip_and_compare(net, cloud(18, n=24), cloud(19, n=24))

    def test_pcn(self):
        flip_and_compare(models.PCN(emb_dims=32, rngs=nnx.Rngs(0)), cloud(20))
