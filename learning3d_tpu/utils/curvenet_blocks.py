"""CurveNet building blocks.

Capability parity with reference utils/curvenet_util.py:52-536: the
gumbel-guided curve Walk with crossover suppression and momentum, LPFA
local-point-feature aggregation, CIC residual blocks, curve aggregation /
grouping, masked max-pool and the attention U-Net feature propagation.
Channel-last (B, N, C); the Walk's flattened-index gathers become batched
take_along_axis, and its "gumbel" softmax is the reference's deterministic
straight-through variant (curvenet_util.py:61-76 — no noise).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import nnx

from learning3d_tpu.ops.geometry import (
    farthest_point_sample,
    index_points,
    knn,
    query_ball_point,
    square_distance,
)


def st_gumbel_softmax(logits, axis=-1, temperature=1.0):
    """Deterministic straight-through 'gumbel' softmax (reference
    curvenet_util.py:61-76: no gumbel noise is actually sampled)."""
    y = jax.nn.softmax(logits / temperature, axis=axis)
    hard = jax.nn.one_hot(jnp.argmax(y, axis=axis), y.shape[axis], dtype=y.dtype, axis=axis)
    return jax.lax.stop_gradient(hard - y) + y


class _ConvBNLRelu(nnx.Module):
    def __init__(self, i, o, act=True, bias=False, slope=0.2, *, dtype=None, rngs: nnx.Rngs):
        self.lin = nnx.Linear(i, o, use_bias=bias, dtype=dtype, rngs=rngs)
        self.bn = nnx.BatchNorm(o, use_running_average=False, momentum=0.9, dtype=dtype, rngs=rngs)
        self.act = act
        self.slope = slope

    def __call__(self, x):
        x = self.bn(self.lin(x))
        return jax.nn.leaky_relu(x, self.slope) if self.act else x


class Walk(nnx.Module):
    """Guided walk in the cloud (reference curvenet_util.py:78-195).

    xyz (B, N, 3), x (B, N, C), adj (B, N, k), start (B, n_curves) ->
    curves (B, n_curves, curve_length, C).
    """

    def __init__(self, in_channel, k, curve_num, curve_length, *, dtype=None, rngs: nnx.Rngs):
        self.curve_num = curve_num
        self.curve_length = curve_length
        self.k = k
        self.agent_lin = nnx.Linear(in_channel * 2, 1, use_bias=False, dtype=dtype, rngs=rngs)
        self.agent_bn = nnx.BatchNorm(1, use_running_average=False, momentum=0.9, dtype=dtype, rngs=rngs)
        self.momentum_lin = nnx.Linear(in_channel * 2, 2, use_bias=False, dtype=dtype, rngs=rngs)
        self.momentum_bn = nnx.BatchNorm(2, use_running_average=False, momentum=0.9, dtype=dtype, rngs=rngs)

    @staticmethod
    def _crossover(cur_dir, nbr_dir):
        """cos-similarity based suppression in [0, 1]
        (reference crossover_suppression, curvenet_util.py:100-114)."""
        cur_dir = jax.lax.stop_gradient(cur_dir)  # (B, n, C)
        nbr_dir = jax.lax.stop_gradient(nbr_dir)  # (B, n, k, C)
        dot = jnp.einsum("bnc,bnkc->bnk", cur_dir, nbr_dir)
        n1 = jnp.linalg.norm(cur_dir, axis=-1)[..., None]
        n2 = jnp.linalg.norm(nbr_dir, axis=-1)
        ans = dot / jnp.maximum(n1 * n2, 1e-8)
        return jax.lax.stop_gradient(jnp.clip(1.0 + ans, 0.0, 1.0))

    def __call__(self, xyz, x, adj, start):
        B, N, C = x.shape
        cur = start  # (B, n_curves) int32
        pre_feature = index_points(x, cur)  # (B, n, C)
        cur_feature = pre_feature
        curves = []
        for step in range(self.curve_length):
            if step > 0:
                # dynamic momentum between current and previous descriptor
                cat_vec = jnp.concatenate([cur_feature, pre_feature], axis=-1)
                att = jax.nn.softmax(
                    self.momentum_bn(self.momentum_lin(cat_vec)), axis=-1
                )  # (B, n, 2)
                pre_feature = (
                    cur_feature * att[..., 0:1] + pre_feature * att[..., 1:2]
                )
            pick_idx = index_points(adj, cur)  # (B, n, k)
            pick_values = index_points(x, pick_idx)  # (B, n, k, C)
            logits_in = jnp.concatenate(
                [pick_values, jnp.broadcast_to(pre_feature[:, :, None, :], pick_values.shape)],
                axis=-1,
            )
            logits = self.agent_bn(self.agent_lin(logits_in))[..., 0]  # (B, n, k)
            if step > 0:
                d = self._crossover(
                    cur_feature - pre_feature, pick_values - cur_feature[:, :, None, :]
                )
                logits = logits * d
            onehot = st_gumbel_softmax(logits, axis=-1)  # (B, n, k)
            new_feature = jnp.einsum("bnk,bnkc->bnc", onehot, pick_values)
            choice = jnp.argmax(onehot, axis=-1)  # (B, n)
            cur = jnp.take_along_axis(pick_idx, choice[..., None], axis=-1)[..., 0]
            cur_feature = new_feature
            curves.append(cur_feature)
        return jnp.stack(curves, axis=2)  # (B, n_curves, curve_length, C)


class AttentionBlock(nnx.Module):
    """Attention U-Net gate (reference curvenet_util.py:197-226)."""

    def __init__(self, F_g, F_l, F_int, *, dtype=None, rngs: nnx.Rngs):
        self.wg_lin = nnx.Linear(F_g, F_int, dtype=dtype, rngs=rngs)
        self.wg_bn = nnx.BatchNorm(F_int, use_running_average=False, momentum=0.9, dtype=dtype, rngs=rngs)
        self.wx_lin = nnx.Linear(F_l, F_int, dtype=dtype, rngs=rngs)
        self.wx_bn = nnx.BatchNorm(F_int, use_running_average=False, momentum=0.9, dtype=dtype, rngs=rngs)
        self.psi_lin = nnx.Linear(F_int, 1, dtype=dtype, rngs=rngs)
        self.psi_bn = nnx.BatchNorm(1, use_running_average=False, momentum=0.9, dtype=dtype, rngs=rngs)

    def __call__(self, g, x):
        g1 = self.wg_bn(self.wg_lin(g))
        x1 = self.wx_bn(self.wx_lin(x))
        psi = jax.nn.leaky_relu(g1 + x1, 0.2)
        psi = jax.nn.sigmoid(self.psi_bn(self.psi_lin(psi)))
        return psi, 1.0 - psi


class LPFA(nnx.Module):
    """Local point-feature aggregation (reference curvenet_util.py:229-290)."""

    def __init__(self, in_channel, out_channel, k, mlp_num=2, initial=False, *, dtype=None, rngs: nnx.Rngs):
        self.k = k
        self.initial = initial
        if not initial:
            self.xyz2feat_lin = nnx.Linear(9, in_channel, use_bias=False, dtype=dtype, rngs=rngs)
            self.xyz2feat_bn = nnx.BatchNorm(in_channel, use_running_average=False, momentum=0.9, dtype=dtype, rngs=rngs)
        blocks = []
        ci = 9 if initial else in_channel
        if initial:
            ci = 9
        for _ in range(mlp_num):
            blocks.append(_ConvBNLRelu(ci, out_channel, dtype=dtype, rngs=rngs))
            ci = out_channel
        self.mlp = nnx.List(blocks)

    def _group(self, x, xyz, idx):
        B, N, _ = xyz.shape
        if idx is None:
            idx = knn(xyz, self.k)
        nbr_xyz = index_points(xyz, idx)  # (B, N, k, 3)
        center = jnp.broadcast_to(xyz[:, :, None, :], nbr_xyz.shape)
        geo = jnp.concatenate([center, nbr_xyz, nbr_xyz - center], axis=-1)  # (B, N, k, 9)
        if self.initial:
            return geo
        nbr_feat = index_points(x, idx)  # (B, N, k, C)
        feat = nbr_feat - x[:, :, None, :]
        geo_feat = self.xyz2feat_bn(self.xyz2feat_lin(geo))
        return jax.nn.leaky_relu(feat + geo_feat, 0.2)

    def __call__(self, x, xyz, idx=None):
        h = self._group(x, xyz, idx)
        for blk in self.mlp:
            h = blk(h)
        if self.initial:
            return jnp.max(h, axis=2)
        return jnp.mean(h, axis=2)


class PointNetFeaturePropagation(nnx.Module):
    """3-NN interpolation with optional skip attention
    (reference curvenet_util.py:293-354)."""

    def __init__(self, in_channel, mlp, att=None, *, dtype=None, rngs: nnx.Rngs):
        dims = [in_channel, *mlp]
        self.blocks = nnx.List(
            [_ConvBNLRelu(i, o, dtype=dtype, rngs=rngs) for i, o in zip(dims[:-1], dims[1:])]
        )
        self.att = (
            AttentionBlock(att[0], att[1], att[2], dtype=dtype, rngs=rngs) if att else None
        )

    def __call__(self, xyz1, xyz2, points1, points2):
        B, N, _ = xyz1.shape
        S = xyz2.shape[1]
        if S == 1:
            interpolated = jnp.broadcast_to(points2, (B, N, points2.shape[-1]))
        else:
            dists = square_distance(xyz1, xyz2)
            neg, idx = jax.lax.top_k(-dists, 3)
            d3 = jnp.maximum(-neg, 0.0)
            recip = 1.0 / (d3 + 1e-8)
            weight = recip / jnp.sum(recip, axis=-1, keepdims=True)
            interpolated = jnp.sum(index_points(points2, idx) * weight[..., None], axis=2)
        if self.att is not None and points1 is not None:
            psix, _ = self.att(interpolated, points1)
            points1 = points1 * psix
        h = (
            jnp.concatenate([points1, interpolated], axis=-1)
            if points1 is not None
            else interpolated
        )
        for blk in self.blocks:
            h = blk(h)
        return h


class CurveAggregation(nnx.Module):
    """Inter/intra curve attention aggregation
    (reference curvenet_util.py:431-490)."""

    def __init__(self, in_channel, *, dtype=None, rngs: nnx.Rngs):
        mid = in_channel // 2
        mk = lambda i, o: nnx.Linear(i, o, use_bias=False, dtype=dtype, rngs=rngs)
        self.conva, self.convb, self.convc = mk(in_channel, mid), mk(in_channel, mid), mk(in_channel, mid)
        self.convn, self.convl = mk(mid, mid), mk(mid, mid)
        self.convd_lin = mk(mid * 2, in_channel)
        self.convd_bn = nnx.BatchNorm(in_channel, use_running_average=False, momentum=0.9, dtype=dtype, rngs=rngs)
        self.line_conv_att = mk(in_channel, 1)

    def __call__(self, x, curves):
        """x (B, N, C); curves (B, c_n, c_l, C) -> (B, N, C)."""
        att = self.line_conv_att(curves)[..., 0]  # (B, c_n, c_l)
        inter = jnp.einsum("bnlc,bnl->bnc", curves, jax.nn.softmax(att, axis=-1))  # (B, c_n, C)
        intra = jnp.einsum("bnlc,bnl->blc", curves, jax.nn.softmax(att, axis=-2))  # (B, c_l, C)
        inter_m = self.conva(inter)  # (B, c_n, mid)
        intra_m = self.convb(intra)  # (B, c_l, mid)
        x_logits = self.convc(x)  # (B, N, mid)
        x_inter = jax.nn.softmax(jnp.einsum("bnm,bcm->bnc", x_logits, inter_m), axis=-1)
        x_intra = jax.nn.softmax(jnp.einsum("bnm,blm->bnl", x_logits, intra_m), axis=-1)
        inter_v = self.convn(inter_m)  # (B, c_n, mid)
        intra_v = self.convl(intra_m)  # (B, c_l, mid)
        f_inter = jnp.einsum("bnc,bcm->bnm", x_inter, inter_v)
        f_intra = jnp.einsum("bnl,blm->bnm", x_intra, intra_v)
        fused = jnp.concatenate([f_inter, f_intra], axis=-1)
        x = x + self.convd_bn(self.convd_lin(fused))
        return jax.nn.leaky_relu(x, 0.2)


class CurveGrouping(nnx.Module):
    """Start-point selection + walk (reference curvenet_util.py:493-518)."""

    def __init__(self, in_channel, k, curve_num, curve_length, *, dtype=None, rngs: nnx.Rngs):
        self.curve_num = curve_num
        self.att = nnx.Linear(in_channel, 1, use_bias=False, dtype=dtype, rngs=rngs)
        self.walk = Walk(in_channel, k, curve_num, curve_length, dtype=dtype, rngs=rngs)

    def __call__(self, x, xyz, idx):
        x_att = jax.nn.sigmoid(self.att(x))  # (B, N, 1)
        x = x * x_att
        _, start = jax.lax.top_k(x_att[..., 0], self.curve_num)  # (B, curve_num)
        return self.walk(xyz, x, idx, start)


class MaskedMaxPool(nnx.Module):
    """FPS + ball query + neighborhood max (reference curvenet_util.py:521-536)."""

    def __init__(self, npoint, radius, k):
        self.npoint = npoint
        self.radius = radius
        self.k = k

    def __call__(self, xyz, features):
        fps_idx = farthest_point_sample(xyz, self.npoint)
        new_xyz = index_points(xyz, fps_idx)
        idx = query_ball_point(self.radius, self.k, xyz, new_xyz)
        grouped = index_points(features, idx)  # (B, S, k, C)
        return new_xyz, jnp.max(grouped, axis=2)


class CIC(nnx.Module):
    """Curve-intervention residual block (reference curvenet_util.py:357-428)."""

    def __init__(
        self, npoint, radius, k, in_channels, output_channels,
        bottleneck_ratio=2, mlp_num=2, curve_config=None, *, dtype=None, rngs: nnx.Rngs,
    ):
        self.in_channels = in_channels
        self.output_channels = output_channels
        self.npoint = npoint
        self.k = k
        planes = in_channels // bottleneck_ratio
        self.use_curve = curve_config is not None
        if self.use_curve:
            self.curveaggregation = CurveAggregation(planes, dtype=dtype, rngs=rngs)
            self.curvegrouping = CurveGrouping(
                planes, k, curve_config[0], curve_config[1], dtype=dtype, rngs=rngs
            )
        self.conv1 = _ConvBNLRelu(in_channels, planes, dtype=dtype, rngs=rngs)
        self.conv2 = _ConvBNLRelu(planes, output_channels, act=False, dtype=dtype, rngs=rngs)
        if in_channels != output_channels:
            self.shortcut = _ConvBNLRelu(in_channels, output_channels, act=False, dtype=dtype, rngs=rngs)
        else:
            self.shortcut = None
        self.maxpool = MaskedMaxPool(npoint, radius, k)
        self.lpfa = LPFA(planes, planes, k, mlp_num=mlp_num, initial=False, dtype=dtype, rngs=rngs)

    def __call__(self, xyz, x, idx=None):
        """xyz (B, N, 3), x (B, N, C) -> (new_xyz, new_x, idx).

        ``idx`` is the (B, N, k+1) self-inclusive kNN of ``xyz``; passing
        it lets consecutive same-resolution blocks share one kNN (the
        reference recomputes it per block and leans on eager caching; the
        Pallas kNN is a custom call that XLA cannot CSE, so the reuse is
        explicit here — returned alongside the features)."""
        if xyz.shape[1] != self.npoint:
            xyz, x = self.maxpool(xyz, x)
            idx = None  # resolution changed
        shortcut = x
        x = self.conv1(x)
        if idx is None:
            idx = knn(xyz, self.k + 1)  # includes self at position 0
        if self.use_curve:
            curves = self.curvegrouping(x, xyz, idx[..., 1:])  # no self-loop
            x = self.curveaggregation(x, curves)
        x = self.lpfa(x, xyz, idx=idx[..., : self.k])
        x = self.conv2(x)
        if self.shortcut is not None:
            shortcut = self.shortcut(shortcut)
        return xyz, jax.nn.leaky_relu(x + shortcut, 0.2), idx
