"""Shared-MLP stacks and pooling.

The reference's Conv1d/Conv2d(kernel=1) stacks are per-point Linear layers;
channel-last (B, N, C) Linears map straight onto the MXU with the point
axis as rows — no transposes, no im2col. BatchNorm matches torch
BatchNorm1d/2d semantics (normalize over batch+points per channel).
"""

from __future__ import annotations

from collections.abc import Callable, Sequence

import jax
import jax.numpy as jnp
from flax import nnx


def validate_input_shape(input_shape: str) -> str:
    """The reference's encoder convention (models/pointnet.py:12-13):
    every model accepts input_shape='bnc'|'bcn' and rejects anything else."""
    if input_shape not in ("bnc", "bcn"):
        raise ValueError("Allowed shapes are 'bcn' and 'bnc'.")
    return input_shape


def to_bnc(x, input_shape: str):
    """Convert a point cloud / feature tensor to the framework's
    channel-last (B, N, C) layout."""
    return jnp.swapaxes(x, 1, 2) if input_shape == "bcn" else x


def fused_bn_relu_maxpool(z, bn, use_running_average=None):
    """max over the points axis of ``relu(bn(z))`` for (B, N, C) inputs
    WITHOUT materializing the normalized (B, N, C) tensor.

    BatchNorm in this position is a per-channel affine s*z + b and relu is
    monotone, so max_n relu(s*z_n + b) = relu(s * sel + b) where sel is the
    per-channel max of z when s >= 0 and min when s < 0 — the same element
    is selected, so values AND gradients match the naive chain. The batch
    stats and the max/min reduce in one fused pass over the activation;
    the affine + relu run on the pooled (B, C) values only. This removes
    the normalize+relu passes over the largest activation of the train
    step (the profiled bottleneck: BN traffic over the (B*N, emb) conv
    output, tools/profile_train.py).

    Semantics mirror flax nnx.BatchNorm exactly: f32 fast-variance stats
    with negative clipping, (1 - momentum) running-stat updates under
    stop_gradient.
    """
    ura = bn.use_running_average if use_running_average is None else use_running_average
    red = tuple(range(z.ndim - 1))
    scale, bias = bn.scale[...], bn.bias[...]
    z_p, mean, var, scale, bias = bn.promote_dtype(
        (z, bn.mean[...], bn.var[...], scale, bias), dtype=bn.dtype
    )
    if not ura:
        zf = z_p.astype(jnp.float32)
        mean = jnp.mean(zf, axis=red)
        if bn.use_fast_variance:
            var = jnp.maximum(jnp.mean(zf * zf, axis=red) - mean * mean, 0.0)
        else:
            var = jnp.mean(jnp.square(zf - mean), axis=red)
        bn.mean[...] = jax.lax.stop_gradient(
            bn.momentum * bn.mean[...] + (1 - bn.momentum) * mean
        )
        bn.var[...] = jax.lax.stop_gradient(
            bn.momentum * bn.var[...] + (1 - bn.momentum) * var
        )
    s = scale * jax.lax.rsqrt(var.astype(scale.dtype) + bn.epsilon)
    b = bias - mean.astype(scale.dtype) * s
    sel = jnp.where(s >= 0, jnp.max(z_p, axis=-2), jnp.min(z_p, axis=-2))
    return jax.nn.relu(s * sel + b).astype(z_p.dtype)


class MLP1d(nnx.Module):
    """Stack of per-point Linear(+Norm)(+activation) over (..., C) inputs.

    Equivalent of the reference's Conv1d(1) towers (e.g. PointNet's
    models/pointnet.py:22-49). norm: None | 'batch' | 'group'.
    """

    def __init__(
        self,
        dims: Sequence[int],
        *,
        norm: str | None = "batch",
        act: Callable = jax.nn.relu,
        act_last: bool = True,
        norm_last: bool = True,
        dtype=None,
        rngs: nnx.Rngs,
    ):
        self.act = act
        self.act_last = act_last
        layers, norms = [], []
        for i, (din, dout) in enumerate(zip(dims[:-1], dims[1:])):
            layers.append(nnx.Linear(din, dout, dtype=dtype, rngs=rngs))
            last = i == len(dims) - 2
            if norm is None or (last and not norm_last):
                norms.append(None)
            elif norm == "batch":
                norms.append(nnx.BatchNorm(dout, use_running_average=False, momentum=0.9, dtype=dtype, rngs=rngs))
            elif norm == "group":
                norms.append(nnx.GroupNorm(dout, num_groups=min(8, dout), dtype=dtype, rngs=rngs))
            else:
                raise ValueError(norm)
        self.layers = nnx.List(layers)
        self.norms = nnx.List(norms)

    def __call__(self, x):
        n = len(self.layers)
        for i, (lin, nrm) in enumerate(zip(self.layers, self.norms)):
            x = lin(x)
            if nrm is not None:
                x = nrm(x)
            if i < n - 1 or self.act_last:
                x = self.act(x)
        return x


# Grouped (B, S, K, C) inputs share the same per-point Linear math.
MLP2d = MLP1d


class Pooling(nnx.Module):
    """Max or mean pool over the point axis (reference models/pooling.py:6-15).

    Input (B, N, C) -> (B, C). Axis is -2 (points) in channel-last layout.
    """

    def __init__(self, pool_type: str = "max"):
        self.pool_type = pool_type

    def __call__(self, x, axis=-2):
        if self.pool_type == "max":
            return jnp.max(x, axis=axis)
        if self.pool_type in ("avg", "average", "mean"):
            return jnp.mean(x, axis=axis)
        raise ValueError(self.pool_type)


def set_bn_mode(model: nnx.Module, use_running_average: bool):
    """Flip every BatchNorm between train/eval statistics (the PointNetLK
    warm-then-freeze trick, reference models/pointnetlk.py:158-164)."""
    if use_running_average:
        model.eval()
    else:
        model.train()
