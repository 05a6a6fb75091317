"""FlowNet3D — scene-flow estimation.

Capability parity with reference models/flownet3d.py:73-328, with every
pointnet2 CUDA call (FPS/gather/ball-query/group/knn/three_nn, reference
utils/lib/src/*) replaced by the static-shape jnp geometry primitives —
the entire forward compiles to one XLA program (SURVEY.md §3.5).
Channel-last (B, N, C).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import nnx

from learning3d_tpu.ops.geometry import (
    farthest_point_sample,
    index_points,
    knn_point,
    query_ball_point,
    three_interpolate,
    three_interpolate_weights,
    three_nn,
)


class _ConvBN2d(nnx.Module):
    def __init__(self, i, o, *, dtype=None, rngs: nnx.Rngs):
        self.lin = nnx.Linear(i, o, use_bias=False, dtype=dtype, rngs=rngs)
        self.bn = nnx.BatchNorm(o, use_running_average=False, momentum=0.9, dtype=dtype, rngs=rngs)

    def __call__(self, x):
        return jax.nn.relu(self.bn(self.lin(x)))


class PointNetSetAbstraction(nnx.Module):
    """FPS + ball-query grouping + shared MLP + max pool
    (reference flownet3d.py:73-123)."""

    def __init__(self, npoint, radius, nsample, in_channel, mlp, group_all, *, dtype=None, rngs: nnx.Rngs):
        self.npoint = npoint
        self.radius = radius
        self.nsample = nsample
        self.group_all = group_all
        dims = [in_channel + 3, *mlp]
        self.blocks = nnx.List([
            _ConvBN2d(i, o, dtype=dtype, rngs=rngs) for i, o in zip(dims[:-1], dims[1:])
        ])

    def __call__(self, xyz, points):
        """xyz (B, N, 3), points (B, N, D) -> (new_xyz (B, S, 3), feats (B, S, mlp[-1]))."""
        if self.group_all:
            new_xyz = xyz
            grouped_xyz = xyz[:, None, :, :] - 0.0
            grouped = (
                jnp.concatenate([grouped_xyz, points[:, None, :, :]], -1)
                if points is not None
                else grouped_xyz
            )
        else:
            fps_idx = farthest_point_sample(xyz, self.npoint)
            new_xyz = index_points(xyz, fps_idx)
            idx = query_ball_point(self.radius, self.nsample, xyz, new_xyz)
            grouped_xyz = index_points(xyz, idx) - new_xyz[:, :, None, :]
            if points is not None:
                grouped = jnp.concatenate([grouped_xyz, index_points(points, idx)], -1)
            else:
                grouped = grouped_xyz
        h = grouped
        for blk in self.blocks:
            h = blk(h)
        return new_xyz, jnp.max(h, axis=2)


class FlowEmbedding(nnx.Module):
    """Cross-cloud kNN correlation (reference flownet3d.py:125-180)."""

    def __init__(self, radius, nsample, in_channel, mlp, approx_knn=False, *, dtype=None, rngs: nnx.Rngs):
        self.nsample = nsample
        self.approx_knn = approx_knn
        dims = [in_channel * 2 + 3, *mlp]
        self.blocks = nnx.List([
            _ConvBN2d(i, o, dtype=dtype, rngs=rngs) for i, o in zip(dims[:-1], dims[1:])
        ])

    def __call__(self, pos1, pos2, feat1, feat2):
        _, idx = knn_point(self.nsample, pos2, pos1, approx=self.approx_knn)
        pos2_grouped = index_points(pos2, idx)  # (B, N, S, 3)
        pos_diff = pos2_grouped - pos1[:, :, None, :]
        feat2_grouped = index_points(feat2, idx)  # (B, N, S, C)
        feat1_tiled = jnp.broadcast_to(feat1[:, :, None, :], feat2_grouped.shape)
        h = jnp.concatenate([pos_diff, feat2_grouped, feat1_tiled], axis=-1)
        for blk in self.blocks:
            h = blk(h)
        return pos1, jnp.max(h, axis=2)


class PointNetSetUpConv(nnx.Module):
    """Upsampling via kNN grouping of the coarse level + skip concat
    (reference flownet3d.py:182-242)."""

    def __init__(self, nsample, radius, f1_channel, f2_channel, mlp, mlp2, *, dtype=None, rngs: nnx.Rngs):
        self.nsample = nsample
        dims1 = [f2_channel + 3, *mlp]
        self.blocks1 = nnx.List([
            _ConvBN2d(i, o, dtype=dtype, rngs=rngs) for i, o in zip(dims1[:-1], dims1[1:])
        ])
        last = (mlp[-1] if mlp else f2_channel + 3) + f1_channel
        dims2 = [last, *mlp2]
        self.blocks2 = nnx.List([
            _ConvBN2d(i, o, dtype=dtype, rngs=rngs) for i, o in zip(dims2[:-1], dims2[1:])
        ])

    def __call__(self, pos1, pos2, feat1, feat2):
        """pos1 fine (B, N, 3), pos2 coarse (B, S, 3) -> (B, N, C')."""
        _, idx = knn_point(self.nsample, pos2, pos1)
        pos2_grouped = index_points(pos2, idx)
        pos_diff = pos2_grouped - pos1[:, :, None, :]
        feat2_grouped = index_points(feat2, idx)
        h = jnp.concatenate([feat2_grouped, pos_diff], axis=-1)
        for blk in self.blocks1:
            h = blk(h)
        h = jnp.max(h, axis=2)  # (B, N, C)
        if feat1 is not None:
            h = jnp.concatenate([h, feat1], axis=-1)
        for blk in self.blocks2:
            h = blk(h)
        return h


class PointNetFeaturePropogation(nnx.Module):
    """Three-NN inverse-distance interpolation + MLP
    (reference flownet3d.py:244-286; sic spelling)."""

    def __init__(self, in_channel, mlp, *, dtype=None, rngs: nnx.Rngs):
        dims = [in_channel, *mlp]
        self.blocks = nnx.List([
            _ConvBN2d(i, o, dtype=dtype, rngs=rngs) for i, o in zip(dims[:-1], dims[1:])
        ])

    def __call__(self, pos1, pos2, feat1, feat2):
        dists, idx = three_nn(pos1, pos2)
        weight = three_interpolate_weights(jnp.maximum(dists, 1e-10), eps=0.0)
        interp = three_interpolate(feat2, idx, weight)
        h = jnp.concatenate([interp, feat1], -1) if feat1 is not None else interp
        for blk in self.blocks:
            h = blk(h)
        return h


class FlowNet3D(nnx.Module):
    def __init__(self, *, dtype=None, rngs: nnx.Rngs):
        self.sa1 = PointNetSetAbstraction(1024, 0.5, 16, 3, [32, 32, 64], False, dtype=dtype, rngs=rngs)
        self.sa2 = PointNetSetAbstraction(256, 1.0, 16, 64, [64, 64, 128], False, dtype=dtype, rngs=rngs)
        self.sa3 = PointNetSetAbstraction(64, 2.0, 8, 128, [128, 128, 256], False, dtype=dtype, rngs=rngs)
        self.sa4 = PointNetSetAbstraction(16, 4.0, 8, 256, [256, 256, 512], False, dtype=dtype, rngs=rngs)
        self.fe_layer = FlowEmbedding(10.0, 64, 128, [128, 128, 128], dtype=dtype, rngs=rngs)
        self.su1 = PointNetSetUpConv(8, 2.4, 256, 512, [], [256, 256], dtype=dtype, rngs=rngs)
        self.su2 = PointNetSetUpConv(8, 1.2, 128 + 128, 256, [128, 128, 256], [256], dtype=dtype, rngs=rngs)
        self.su3 = PointNetSetUpConv(8, 0.6, 64, 256, [128, 128, 256], [256], dtype=dtype, rngs=rngs)
        self.fp = PointNetFeaturePropogation(256 + 3, [256, 256], dtype=dtype, rngs=rngs)
        self.conv1 = nnx.Linear(256, 128, use_bias=False, dtype=dtype, rngs=rngs)
        self.bn1 = nnx.BatchNorm(128, use_running_average=False, momentum=0.9, dtype=dtype, rngs=rngs)
        self.conv2 = nnx.Linear(128, 3, dtype=dtype, rngs=rngs)

    def __call__(self, pc1, pc2, feature1, feature2):
        """pc1/pc2 (B, N, 3), feature1/feature2 (B, N, 3) -> flow (B, N, 3)."""
        l1_pc1, l1_f1 = self.sa1(pc1, feature1)
        l2_pc1, l2_f1 = self.sa2(l1_pc1, l1_f1)
        l1_pc2, l1_f2 = self.sa1(pc2, feature2)
        l2_pc2, l2_f2 = self.sa2(l1_pc2, l1_f2)

        _, l2_f1_new = self.fe_layer(l2_pc1, l2_pc2, l2_f1, l2_f2)

        l3_pc1, l3_f1 = self.sa3(l2_pc1, l2_f1_new)
        l4_pc1, l4_f1 = self.sa4(l3_pc1, l3_f1)

        l3_fnew1 = self.su1(l3_pc1, l4_pc1, l3_f1, l4_f1)
        l2_fnew1 = self.su2(l2_pc1, l3_pc1, jnp.concatenate([l2_f1, l2_f1_new], -1), l3_fnew1)
        l1_fnew1 = self.su3(l1_pc1, l2_pc1, l1_f1, l2_fnew1)
        l0_fnew1 = self.fp(pc1, l1_pc1, feature1, l1_fnew1)

        x = jax.nn.relu(self.bn1(self.conv1(l0_fnew1)))
        return self.conv2(x)
