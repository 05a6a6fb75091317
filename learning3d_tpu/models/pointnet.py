"""PointNet encoder.

Capability parity with reference models/pointnet.py:7-73: five 1x1-conv
blocks 3->64->64->64->128->emb_dims (optional BatchNorm), returning
*per-point* features; with ``global_feat=False`` the pooled global vector
is tiled and concatenated with the first-block point features for
segmentation.

Framework convention: channel-LAST — features are (B, N, C) everywhere
(``input_shape`` only describes the *input* layout, as in the reference).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import nnx

from learning3d_tpu.models.pooling import Pooling
from learning3d_tpu.utils.layers import linear_bn_relu_maxpool


class PointNet(nnx.Module):
    def __init__(
        self,
        emb_dims: int = 1024,
        input_shape: str = "bnc",
        use_bn: bool = False,
        global_feat: bool = True,
        *,
        channels: int = 3,
        dtype=None,
        rngs: nnx.Rngs,
    ):
        if input_shape not in ("bnc", "bcn"):
            raise ValueError("Allowed shapes are 'bcn' and 'bnc'.")
        self.input_shape = input_shape
        self.emb_dims = emb_dims
        self.use_bn = use_bn
        self.global_feat = global_feat
        self.pooling = Pooling("max")

        dims = [channels, 64, 64, 64, 128, emb_dims]
        self.convs = nnx.List([
            nnx.Linear(i, o, dtype=dtype, rngs=rngs) for i, o in zip(dims[:-1], dims[1:])
        ])
        if use_bn:
            self.bns = nnx.List([
                nnx.BatchNorm(o, use_running_average=False, momentum=0.9, dtype=dtype, rngs=rngs)
                for o in dims[1:]
            ])
        else:
            self.bns = nnx.List([None] * 5)

    def __call__(self, input_data, use_running_average=None):
        """-> (B, N, emb_dims), or (B, N, emb_dims + 64) if not global_feat.

        ``use_running_average`` overrides BatchNorm mode per call — needed
        for PointNetLK's warm-then-freeze trick (reference
        models/pointnetlk.py:158-164).
        """
        x = input_data
        if self.input_shape == "bcn":
            x = jnp.swapaxes(x, 1, 2)
        if x.shape[-1] not in (3, self.convs[0].in_features):
            raise RuntimeError("expected 3-channel point clouds")

        point_feature = None
        for i, (conv, bn) in enumerate(zip(self.convs, self.bns)):
            x = conv(x)
            if bn is not None:
                x = bn(x, use_running_average=use_running_average)
                if i == 0 and not self.global_feat:
                    point_feature = x  # post-norm, pre-relu (reference idx==1 capture)
            x = jax.nn.relu(x)
            if i == 0 and not self.global_feat and point_feature is None:
                point_feature = x

        if self.global_feat:
            return x
        g = self.pooling(x)  # (B, emb)
        g = jnp.broadcast_to(g[:, None, :], (x.shape[0], x.shape[1], self.emb_dims))
        return jnp.concatenate([g, point_feature], axis=-1)

    def pooled_features(self, input_data, use_running_average=None):
        """Max-pooled global feature (B, emb_dims) with the whole last
        stage conv+BN+ReLU+max-pool fused (utils.layers.linear_bn_relu_maxpool)
        — identical values and gradients to
        ``max(relu(bn(conv(x))), axis=-2)``, but the normalized (B, N, emb)
        tensor is never materialized and in train mode the backward runs
        through a Gram-matrix custom VJP that never builds a dense dz
        (the train step's traffic bottleneck, tools/profile_bwd.py).
        Heads that max-pool this encoder (Classifier, PointNetLK,
        iPCRNet) route through here."""
        if not self.global_feat:
            raise ValueError("pooled_features requires global_feat=True")
        x = input_data
        if self.input_shape == "bcn":
            x = jnp.swapaxes(x, 1, 2)
        if x.shape[-1] not in (3, self.convs[0].in_features):
            raise RuntimeError("expected 3-channel point clouds")
        from learning3d_tpu.kernels.pointnet_fused import (
            pointnet_fused_ok,
            pointnet_pooled_fused,
        )

        if pointnet_fused_ok(x, self.convs, self.bns, use_running_average):
            # whole chain + pool in one Pallas program (VMEM-resident
            # intermediates); identical math, exact grads via custom VJP
            return pointnet_pooled_fused(x, list(self.convs), list(self.bns))
        for conv, bn in zip(self.convs[:-1], self.bns[:-1]):
            x = conv(x)
            if bn is not None:
                x = bn(x, use_running_average=use_running_average)
            x = jax.nn.relu(x)
        if self.bns[-1] is not None:
            return linear_bn_relu_maxpool(x, self.convs[-1], self.bns[-1], use_running_average)
        return jnp.max(jax.nn.relu(self.convs[-1](x)), axis=-2)
