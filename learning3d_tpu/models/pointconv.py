"""PointConv — density-reweighted point convolution classifier.

Capability parity with reference models/pointconv.py:18-96 and the
utility stack in utils/pointconv_util.py:199-380: DensityNet, WeightNet,
PointConvDensitySetAbstraction (kNN grouping + weighted-matmul point
convolution), and the 3-stage SSG classifier. Channel-last throughout.

Behavioral notes preserved from the reference: DensityNet applies ReLU on
every layer (its `if i == len(...)` sigmoid branch is dead code,
pointconv_util.py:225-233), and FPS uses the deterministic first-point
start (pointconv_util.py:60-83).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import nnx

from learning3d_tpu.ops.grouping import (
    compute_density,
    sample_and_group_all,
    sample_and_group_knn,
)


class _Conv2dBN(nnx.Module):
    def __init__(self, i, o, *, dtype=None, rngs: nnx.Rngs):
        self.lin = nnx.Linear(i, o, dtype=dtype, rngs=rngs)
        self.bn = nnx.BatchNorm(o, use_running_average=False, momentum=0.9, dtype=dtype, rngs=rngs)

    def __call__(self, x):
        return jax.nn.relu(self.bn(self.lin(x)))


class DensityNet(nnx.Module):
    def __init__(self, hidden=(16, 8), *, dtype=None, rngs: nnx.Rngs):
        dims = [1, *hidden, 1]
        self.blocks = nnx.List([
            _Conv2dBN(i, o, dtype=dtype, rngs=rngs) for i, o in zip(dims[:-1], dims[1:])
        ])

    def __call__(self, scale):
        for blk in self.blocks:
            scale = blk(scale)
        return scale


class WeightNet(nnx.Module):
    def __init__(self, in_ch=3, out_ch=16, hidden=(8, 8), *, dtype=None, rngs: nnx.Rngs):
        dims = [in_ch, *hidden, out_ch]
        self.blocks = nnx.List([
            _Conv2dBN(i, o, dtype=dtype, rngs=rngs) for i, o in zip(dims[:-1], dims[1:])
        ])

    def __call__(self, x):
        for blk in self.blocks:
            x = blk(x)
        return x


class PointConvDensitySetAbstraction(nnx.Module):
    def __init__(
        self, npoint, nsample, in_channel, mlp, bandwidth, group_all,
        *, dtype=None, rngs: nnx.Rngs,
    ):
        self.npoint = npoint
        self.nsample = nsample
        self.bandwidth = bandwidth
        self.group_all = group_all
        dims = [in_channel, *mlp]
        self.mlp_blocks = nnx.List([
            _Conv2dBN(i, o, dtype=dtype, rngs=rngs) for i, o in zip(dims[:-1], dims[1:])
        ])
        self.weightnet = WeightNet(3, 16, dtype=dtype, rngs=rngs)
        self.linear = nnx.Linear(16 * mlp[-1], mlp[-1], dtype=dtype, rngs=rngs)
        self.bn_linear = nnx.BatchNorm(mlp[-1], use_running_average=False, momentum=0.9, dtype=dtype, rngs=rngs)
        self.densitynet = DensityNet(dtype=dtype, rngs=rngs)

    def __call__(self, xyz, points):
        """xyz (B, N, 3), points (B, N, D) or None ->
        (new_xyz (B, S, 3), new_feats (B, S, mlp[-1]))."""
        B, N, _ = xyz.shape
        inverse_density = 1.0 / compute_density(xyz, self.bandwidth)  # (B, N)
        if self.group_all:
            new_xyz, new_points = sample_and_group_all(xyz, points)
            grouped_norm = xyz[:, None, :, :]
            grouped_density = inverse_density[:, None, :, None]
            S = 1
        else:
            new_xyz, new_points, grouped_norm, grouped_density = sample_and_group_knn(
                self.npoint, self.nsample, xyz, points, density_scale=inverse_density
            )
            S = self.npoint
        # new_points (B, S, K, C+D) -> shared MLP
        h = new_points
        for blk in self.mlp_blocks:
            h = blk(h)  # (B, S, K, C')
        # density rescale
        inv_max = jnp.max(grouped_density, axis=2, keepdims=True)
        density_scale = self.densitynet(grouped_density / inv_max)  # (B, S, K, 1)
        h = h * density_scale
        # weighted "convolution": contract neighbors against learned weights
        weights = self.weightnet(grouped_norm)  # (B, S, K, 16)
        out = jnp.einsum("bskc,bskw->bscw", h, weights).reshape(B, S, -1)
        out = jax.nn.relu(self.bn_linear(self.linear(out)))
        return new_xyz, out


class PointConvDensityClsSsg(nnx.Module):
    def __init__(
        self,
        emb_dims: int = 1024,
        input_shape: str = "bnc",
        input_channel_dim: int = 3,
        classifier: bool = False,
        num_classes: int = 40,
        pretrained=None,
        *,
        dtype=None,
        rngs: nnx.Rngs,
    ):
        if input_shape not in ("bnc", "bcn"):
            raise ValueError("Allowed shapes are 'bcn' and 'bnc'.")
        self.input_shape = input_shape
        self.emb_dims = emb_dims
        self.classifier = classifier
        self.input_channel_dim = input_channel_dim
        extra = input_channel_dim - 3
        self.sa1 = PointConvDensitySetAbstraction(
            512, 32, 3 + extra, [64, 64, 128], 0.1, False, dtype=dtype, rngs=rngs
        )
        self.sa2 = PointConvDensitySetAbstraction(
            128, 64, 128 + 3, [128, 128, 256], 0.2, False, dtype=dtype, rngs=rngs
        )
        self.sa3 = PointConvDensitySetAbstraction(
            1, None, 256 + 3, [256, 512, emb_dims], 0.4, True, dtype=dtype, rngs=rngs
        )
        if classifier:
            self.fc1 = nnx.Linear(emb_dims, 512, dtype=dtype, rngs=rngs)
            self.bn1 = nnx.BatchNorm(512, use_running_average=False, momentum=0.9, dtype=dtype, rngs=rngs)
            self.drop1 = nnx.Dropout(0.7, rngs=rngs)
            self.fc2 = nnx.Linear(512, 256, dtype=dtype, rngs=rngs)
            self.bn2 = nnx.BatchNorm(256, use_running_average=False, momentum=0.9, dtype=dtype, rngs=rngs)
            self.drop2 = nnx.Dropout(0.7, rngs=rngs)
            self.fc3 = nnx.Linear(256, num_classes, dtype=dtype, rngs=rngs)

    def __call__(self, input_data):
        x = input_data
        if self.input_shape == "bcn":
            x = jnp.swapaxes(x, 1, 2)
        xyz, feats = x[..., :3], (x[..., 3:] if x.shape[-1] > 3 else None)
        l1_xyz, l1_feats = self.sa1(xyz, feats)
        l2_xyz, l2_feats = self.sa2(l1_xyz, l1_feats)
        _, l3_feats = self.sa3(l2_xyz, l2_feats)
        features = l3_feats[:, 0, :]  # (B, emb)
        if not self.classifier:
            return features
        h = self.drop1(jax.nn.relu(self.bn1(self.fc1(features))))
        h = self.drop2(jax.nn.relu(self.bn2(self.fc2(h))))
        return jax.nn.log_softmax(self.fc3(h), axis=-1)


def create_pointconv(classifier=False, pretrained=None):
    """Factory mirroring reference models/pointconv.py:68-96. Checkpoint
    loading of the torch authors' weights is out of scope here; use
    train.checkpointing for native checkpoints."""
    return PointConvDensityClsSsg
