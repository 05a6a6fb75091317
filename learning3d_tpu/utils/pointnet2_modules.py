"""PointNet++ set-abstraction / feature-propagation modules.

Capability parity with the reference's pointnet2 module layer
(reference utils/lib/pointnet2_modules.py:10-157 and
utils/lib/pytorch_utils.py:5-33 SharedMLP): ``PointnetSAModule`` (single
scale), ``PointnetSAModuleMSG`` (multi-scale grouping), and
``PointnetFPModule`` (3-NN inverse-distance feature propagation), plus
the ``QueryAndGroup`` / ``GroupAll`` groupers
(utils/lib/pointnet2_utils.py:259-318).

TPU-native design: channel-LAST (B, N, C) throughout, FPS/ball-query
dispatch to the Pallas kernels on TPU (ops/geometry.py), grouping is a
gather, and each scale's shared MLP runs as stacked 1x1 matmuls on the
MXU. The reference's CUDA kernels and (B, C, npoint, nsample) layout are
deliberately not reproduced.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import nnx

from learning3d_tpu.ops import geometry

__all__ = [
    "SharedMLP",
    "QueryAndGroup",
    "GroupAll",
    "PointnetSAModule",
    "PointnetSAModuleMSG",
    "PointnetFPModule",
]


class SharedMLP(nnx.Module):
    """Per-point MLP (1x1-conv stack) with optional BatchNorm + ReLU
    (reference utils/lib/pytorch_utils.py:5-33). Channel-last: applies to
    the trailing axis of any (..., C) array."""

    def __init__(self, channels, bn: bool = True, *, dtype=None, rngs: nnx.Rngs):
        self.lins = nnx.List([
            nnx.Linear(i, o, use_bias=not bn, dtype=dtype, rngs=rngs)
            for i, o in zip(channels[:-1], channels[1:])
        ])
        self.bns = nnx.List([
            nnx.BatchNorm(o, use_running_average=False, momentum=0.9, dtype=dtype, rngs=rngs)
            if bn
            else None
            for o in channels[1:]
        ])

    def __call__(self, x, use_running_average=None):
        for lin, bn in zip(self.lins, self.bns):
            x = lin(x)
            if bn is not None:
                x = bn(x, use_running_average=use_running_average)
            x = jnp.maximum(x, 0.0)
        return x


class QueryAndGroup:
    """Ball-query grouper (reference utils/lib/pointnet2_utils.py:259-292):
    groups neighbor xyz (recentered on the query) and features, optionally
    concatenating the relative xyz. Stateless — returns
    (B, npoint, nsample, 3 [+ C])."""

    def __init__(self, radius: float, nsample: int, use_xyz: bool = True):
        self.radius = radius
        self.nsample = nsample
        self.use_xyz = use_xyz

    def __call__(self, xyz, new_xyz, features=None):
        idx = geometry.query_ball_point(self.radius, self.nsample, xyz, new_xyz)
        grouped_xyz = geometry.index_points(xyz, idx) - new_xyz[:, :, None, :]
        if features is None:
            return grouped_xyz
        grouped = geometry.index_points(features, idx)  # (B, S, ns, C)
        if self.use_xyz:
            return jnp.concatenate([grouped_xyz, grouped], axis=-1)
        return grouped


class GroupAll:
    """Single-group variant (reference utils/lib/pointnet2_utils.py:
    295-318): every point in one neighborhood, (B, 1, N, 3 [+ C])."""

    def __init__(self, use_xyz: bool = True):
        self.use_xyz = use_xyz

    def __call__(self, xyz, new_xyz, features=None):
        grouped_xyz = xyz[:, None, :, :]
        if features is None:
            return grouped_xyz
        grouped = features[:, None, :, :]
        if self.use_xyz:
            return jnp.concatenate([grouped_xyz, grouped], axis=-1)
        return grouped


class PointnetSAModuleMSG(nnx.Module):
    """Multi-scale-grouping set abstraction (reference
    utils/lib/pointnet2_modules.py:58-92): FPS to ``npoint`` centers, then
    per-scale ball-query grouping + shared MLP + neighbor pooling, scales
    concatenated on the channel axis."""

    def __init__(
        self,
        *,
        npoint: int | None,
        radii,
        nsamples,
        mlps,
        bn: bool = True,
        use_xyz: bool = True,
        pool_method: str = "max_pool",
        dtype=None,
        rngs: nnx.Rngs,
    ):
        assert len(radii) == len(nsamples) == len(mlps)
        self.npoint = npoint
        self.pool_method = pool_method
        self.groupers = [
            QueryAndGroup(r, ns, use_xyz=use_xyz) if npoint is not None else GroupAll(use_xyz)
            for r, ns in zip(radii, nsamples)
        ]
        self.mlps = nnx.List([
            SharedMLP(
                [spec[0] + (3 if use_xyz else 0)] + list(spec[1:]),
                bn=bn,
                dtype=dtype,
                rngs=rngs,
            )
            for spec in mlps
        ])

    def __call__(self, xyz, features=None, new_xyz=None, use_running_average=None):
        """xyz (B, N, 3), features (B, N, C) ->
        (new_xyz (B, npoint, 3), new_features (B, npoint, sum(mlp[-1])))."""
        if new_xyz is None and self.npoint is not None:
            idx = geometry.farthest_point_sample(xyz, self.npoint)
            new_xyz = geometry.index_points(xyz, idx)
        outs = []
        for grouper, mlp in zip(self.groupers, self.mlps):
            g = grouper(xyz, new_xyz, features)  # (B, S, ns, Cin)
            g = mlp(g, use_running_average=use_running_average)
            if self.pool_method == "max_pool":
                outs.append(jnp.max(g, axis=-2))
            elif self.pool_method == "avg_pool":
                outs.append(jnp.mean(g, axis=-2))
            else:
                raise NotImplementedError(self.pool_method)
        return new_xyz, jnp.concatenate(outs, axis=-1)


class PointnetSAModule(PointnetSAModuleMSG):
    """Single-scale set abstraction (reference pointnet2_modules.py:95-113)."""

    def __init__(
        self,
        *,
        mlp,
        npoint: int | None = None,
        radius: float | None = None,
        nsample: int | None = None,
        bn: bool = True,
        use_xyz: bool = True,
        pool_method: str = "max_pool",
        dtype=None,
        rngs: nnx.Rngs,
    ):
        super().__init__(
            mlps=[mlp],
            npoint=npoint,
            radii=[radius],
            nsamples=[nsample],
            bn=bn,
            use_xyz=use_xyz,
            pool_method=pool_method,
            dtype=dtype,
            rngs=rngs,
        )


class PointnetFPModule(nnx.Module):
    """Feature propagation (reference pointnet2_modules.py:116-157):
    3-NN inverse-distance interpolation of the known set's features onto
    the unknown set, skip-concatenated and refined by a shared MLP."""

    def __init__(self, *, mlp, bn: bool = True, dtype=None, rngs: nnx.Rngs):
        self.mlp = SharedMLP(mlp, bn=bn, dtype=dtype, rngs=rngs)

    def __call__(self, unknown, known, unknown_feats, known_feats, use_running_average=None):
        """unknown (B, n, 3), known (B, m, 3) | None, unknown_feats
        (B, n, C1) | None, known_feats (B, m, C2) -> (B, n, mlp[-1])."""
        if known is not None:
            dist, idx = geometry.three_nn(unknown, known)
            weight = geometry.three_interpolate_weights(dist)
            interp = geometry.three_interpolate(known_feats, idx, weight)
        else:
            interp = jnp.broadcast_to(
                known_feats, (known_feats.shape[0], unknown.shape[1], known_feats.shape[-1])
            )
        if unknown_feats is not None:
            interp = jnp.concatenate([interp, unknown_feats], axis=-1)
        return self.mlp(interp, use_running_average=use_running_average)
