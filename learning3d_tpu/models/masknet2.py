"""MaskNet2 / MaskNet++ — coupled inlier masks for both clouds.

Capability parity with reference models/masknet2.py:8-257: a self-attention
PointNet variant (Mish + BatchNorm conv blocks, residual beta-gated N x N
attention), cross-cloud coupled attention over max+avg pooled global
features, and a shared mask head predicting masks for *both* clouds.
Binarization by threshold is the host-side ragged path
(``select_by_threshold`` in models/masknet.py); the module returns the
soft masks.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import nnx

from learning3d_tpu.models.pooling import Pooling
from learning3d_tpu.utils.layers import to_bnc, validate_input_shape


def mish(x):
    return x * jnp.tanh(jax.nn.softplus(x))


class BasicConv1D(nnx.Module):
    """Bias-free Linear + BatchNorm + optional Mish
    (reference masknet2.py:17-31)."""

    def __init__(self, in_ch, out_ch, active=True, *, dtype=None, rngs: nnx.Rngs):
        self.conv = nnx.Linear(in_ch, out_ch, use_bias=False, dtype=dtype, rngs=rngs)
        self.bn = nnx.BatchNorm(out_ch, use_running_average=False, momentum=0.9, dtype=dtype, rngs=rngs)
        self.active = active

    def __call__(self, x):
        x = self.bn(self.conv(x))
        return mish(x) if self.active else x


class SelfAttn(nnx.Module):
    """Residual beta-gated point self-attention (masknet2.py:34-71).
    Channel-last (B, N, C) -> (B, N, out)."""

    def __init__(self, in_dim, out_dim, *, dtype=None, rngs: nnx.Rngs):
        self.query_conv = BasicConv1D(in_dim, out_dim, dtype=dtype, rngs=rngs)
        self.beta = nnx.Param(jnp.zeros((1,)))

    def __call__(self, x):
        q = self.query_conv(x)  # (B, N, out)
        energy = jnp.einsum("bnc,bmc->bnm", q, q)
        attn = jax.nn.softmax(energy, axis=-1)
        out = jnp.einsum("bnm,bmc->bnc", attn, q)
        return self.beta[...] * out + q


class AttnPointNet(nnx.Module):
    """The masknet2-local PointNet built from SelfAttn stages
    (masknet2.py:73-120); concatenated stage outputs (32+64+64+128+224=512)."""

    def __init__(self, emb_dims=224, input_shape="bnc", *, dtype=None, rngs: nnx.Rngs):
        self.input_shape = input_shape
        self.emb_dims = emb_dims
        self.conv1 = SelfAttn(3, 32, dtype=dtype, rngs=rngs)
        self.conv2 = SelfAttn(32, 64, dtype=dtype, rngs=rngs)
        self.conv3 = SelfAttn(64, 64, dtype=dtype, rngs=rngs)
        self.conv4 = SelfAttn(64, 128, dtype=dtype, rngs=rngs)
        self.conv5 = SelfAttn(128, emb_dims, dtype=dtype, rngs=rngs)

    def __call__(self, x):
        if self.input_shape == "bcn":
            x = jnp.swapaxes(x, 1, 2)
        x1 = self.conv1(x)
        x2 = self.conv2(x1)
        x3 = self.conv3(x2)
        x4 = self.conv4(x3 + x2)
        x5 = self.conv5(x4)
        return jnp.concatenate([x1, x2, x3, x4, x5], axis=-1)  # (B, N, 512)


class SelfAttentionFC(nnx.Module):
    """Coupled feature-dim attention between two global vectors
    (masknet2.py:124-163). Inputs (B, C) -> (B, out) pair; the query conv
    is shared between the two streams."""

    def __init__(self, in_dim, out_dim, *, dtype=None, rngs: nnx.Rngs):
        self.query_conv = BasicConv1D(in_dim, out_dim, dtype=dtype, rngs=rngs)
        self.beta = nnx.Param(jnp.zeros((1,)))

    def __call__(self, x, y):
        qx = self.query_conv(x[:, None, :])[:, 0]  # (B, out)
        qy = self.query_conv(y[:, None, :])[:, 0]
        energy = jnp.einsum("bi,bj->bij", qx, qy)  # (B, out, out)
        attn_xy = jax.nn.softmax(energy, axis=-1)
        attn_yx = jax.nn.softmax(jnp.swapaxes(energy, -1, -2), axis=-1)
        out_x = jnp.einsum("bij,bj->bi", attn_xy, qx)
        out_y = jnp.einsum("bij,bj->bi", attn_yx, qy)
        return self.beta[...] * out_x + qx, self.beta[...] * out_y + qy


class PointNetMask2(nnx.Module):
    def __init__(self, feature_model=None, *, dtype=None, rngs: nnx.Rngs):
        self.feature_model = feature_model or AttnPointNet(dtype=dtype, rngs=rngs)
        self.pooling_max = Pooling("max")
        self.pooling_avg = Pooling("avg")
        self.global_feat_1 = SelfAttentionFC(1024, 512, dtype=dtype, rngs=rngs)
        self.global_feat_2 = SelfAttentionFC(512, 256, dtype=dtype, rngs=rngs)
        self.global_feat_3 = SelfAttentionFC(256, 512, dtype=dtype, rngs=rngs)
        self.h3 = nnx.List([
            BasicConv1D(1024, 512, dtype=dtype, rngs=rngs),
            BasicConv1D(512, 256, dtype=dtype, rngs=rngs),
            BasicConv1D(256, 128, dtype=dtype, rngs=rngs),
        ])
        self.out = nnx.Linear(128, 1, dtype=dtype, rngs=rngs)

    def _head(self, point_feats, global_feats):
        g = jnp.broadcast_to(
            global_feats[:, None, :], point_feats.shape[:2] + global_feats.shape[-1:]
        )
        x = jnp.concatenate([point_feats, g], axis=-1)
        for blk in self.h3:
            x = blk(x)
        return jax.nn.sigmoid(self.out(x))[..., 0]

    def __call__(self, template, source):
        sf = self.feature_model(source)  # (B, N, 512)
        tf = self.feature_model(template)
        gs = jnp.concatenate([self.pooling_max(sf), self.pooling_avg(sf)], axis=-1)
        gt = jnp.concatenate([self.pooling_max(tf), self.pooling_avg(tf)], axis=-1)
        s1, s2 = self.global_feat_1(gs, gt)
        s1, s2 = self.global_feat_2(s1, s2)
        s1, s2 = self.global_feat_3(s1, s2)
        template_mask = self._head(tf, s1)
        source_mask = self._head(sf, s2)
        return template_mask, source_mask


class MaskNet2(nnx.Module):
    def __init__(self, feature_model=None, is_training: bool = True, input_shape: str = "bnc", *, dtype=None, rngs: nnx.Rngs):
        self.input_shape = validate_input_shape(input_shape)
        self.maskNet = PointNetMask2(feature_model, dtype=dtype, rngs=rngs)
        self.is_training = is_training

    def __call__(self, template, source, mask_threshold: float = 0.5):
        """-> (template_mask, source_mask) soft inlier probabilities (B, N).

        Ragged binarized selection (reference masknet2.py:245-257, B=1
        eval) lives in models.masknet.select_by_threshold.
        """
        template = to_bnc(template, self.input_shape)
        source = to_bnc(source, self.input_shape)
        return self.maskNet(template, source)
