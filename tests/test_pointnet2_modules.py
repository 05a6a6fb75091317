"""PointNet++ SA/FP module layer (reference utils/lib/pointnet2_modules.py)."""

import numpy as np

import jax
import jax.numpy as jnp
from flax import nnx

from learning3d_tpu.utils import (
    GroupAll,
    PointnetFPModule,
    PointnetSAModule,
    PointnetSAModuleMSG,
    QueryAndGroup,
)


def cloud(seed, b=2, n=128):
    return jax.random.normal(jax.random.PRNGKey(seed), (b, n, 3))


class TestGroupers:
    def test_query_and_group_recenters(self):
        xyz = cloud(0)
        new_xyz = xyz[:, :16]
        g = QueryAndGroup(radius=0.8, nsample=8)(xyz, new_xyz)
        assert g.shape == (2, 16, 8, 3)
        # each query point is inside its own ball -> some neighbor is the
        # recentered query itself (zero vector)
        mins = jnp.min(jnp.sum(g * g, axis=-1), axis=-1)
        np.testing.assert_allclose(np.asarray(mins), 0.0, atol=1e-6)

    def test_query_and_group_features_concat(self):
        xyz = cloud(1)
        feats = jax.random.normal(jax.random.PRNGKey(2), (2, 128, 5))
        g = QueryAndGroup(radius=0.8, nsample=8, use_xyz=True)(xyz, xyz[:, :16], feats)
        assert g.shape == (2, 16, 8, 8)
        g2 = QueryAndGroup(radius=0.8, nsample=8, use_xyz=False)(xyz, xyz[:, :16], feats)
        assert g2.shape == (2, 16, 8, 5)

    def test_group_all(self):
        xyz = cloud(3)
        feats = jax.random.normal(jax.random.PRNGKey(4), (2, 128, 5))
        g = GroupAll()(xyz, None, feats)
        assert g.shape == (2, 1, 128, 8)


class TestSAModules:
    def test_single_scale_shapes(self):
        sa = PointnetSAModule(
            mlp=[5, 16, 32], npoint=32, radius=0.8, nsample=8, rngs=nnx.Rngs(0)
        )
        sa.eval()
        xyz = cloud(5)
        feats = jax.random.normal(jax.random.PRNGKey(6), (2, 128, 5))
        new_xyz, new_feats = sa(xyz, feats)
        assert new_xyz.shape == (2, 32, 3)
        assert new_feats.shape == (2, 32, 32)

    def test_msg_concatenates_scales(self):
        sa = PointnetSAModuleMSG(
            npoint=32,
            radii=[0.4, 0.8],
            nsamples=[8, 16],
            mlps=[[5, 16], [5, 32]],
            rngs=nnx.Rngs(0),
        )
        sa.eval()
        xyz = cloud(7)
        feats = jax.random.normal(jax.random.PRNGKey(8), (2, 128, 5))
        new_xyz, new_feats = sa(xyz, feats)
        assert new_feats.shape == (2, 32, 48)

    def test_group_all_global_vector(self):
        sa = PointnetSAModule(mlp=[5, 16], npoint=None, rngs=nnx.Rngs(0))
        sa.eval()
        xyz = cloud(9)
        feats = jax.random.normal(jax.random.PRNGKey(10), (2, 128, 5))
        new_xyz, new_feats = sa(xyz, feats)
        assert new_xyz is None and new_feats.shape == (2, 1, 16)

    def test_jits(self):
        sa = PointnetSAModule(
            mlp=[5, 16], npoint=32, radius=0.8, nsample=8, rngs=nnx.Rngs(0)
        )
        sa.eval()
        gd, st = nnx.split(sa)

        @jax.jit
        def run(st, xyz, feats):
            return nnx.merge(gd, st)(xyz, feats)[1]

        out = run(st, cloud(11), jax.random.normal(jax.random.PRNGKey(12), (2, 128, 5)))
        assert out.shape == (2, 32, 16)


class TestFPModule:
    def test_coincident_points_copy_features(self):
        """unknown == known -> the 3-NN interpolation is dominated by the
        exact-match neighbor, so pre-MLP features equal known_feats; with
        an identity-free check we verify through a linear MLP fitted to
        identity."""
        fp = PointnetFPModule(mlp=[4, 4], bn=False, rngs=nnx.Rngs(0))
        fp.eval()
        # force the MLP to the identity (weights eye, bias 0)
        fp.mlp.lins[0].kernel.value = jnp.eye(4)
        fp.mlp.lins[0].bias.value = jnp.zeros(4)
        xyz = cloud(13, n=32)
        feats = jax.nn.relu(jax.random.normal(jax.random.PRNGKey(14), (2, 32, 4)))
        out = fp(xyz, xyz, None, feats)
        np.testing.assert_allclose(np.asarray(out), np.asarray(feats), atol=1e-4)

    def test_skip_concat_shapes(self):
        fp = PointnetFPModule(mlp=[7, 16], rngs=nnx.Rngs(0))
        fp.eval()
        unknown, known = cloud(15, n=64), cloud(16, n=16)
        uf = jax.random.normal(jax.random.PRNGKey(17), (2, 64, 3))
        kf = jax.random.normal(jax.random.PRNGKey(18), (2, 16, 4))
        out = fp(unknown, known, uf, kf)
        assert out.shape == (2, 64, 16)
