"""Shared-MLP stacks and pooling.

The reference's Conv1d/Conv2d(kernel=1) stacks are per-point Linear layers;
channel-last (B, N, C) Linears map straight onto the MXU with the point
axis as rows — no transposes, no im2col. BatchNorm matches torch
BatchNorm1d/2d semantics (normalize over batch+points per channel).
"""

from __future__ import annotations

import functools
from collections.abc import Callable, Sequence

import jax
import jax.numpy as jnp
from flax import nnx

from learning3d_tpu.kernels.poolgrad import (
    pool_bwd_ok as _pool_bwd_ok,
    pool_bwd_pallas as _pool_bwd_pallas,
    pool_stats_ok as _pool_stats_ok,
    pool_stats_pallas as _pool_stats_pallas,
)


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


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def _linear_bn_relu_maxpool_train(x, W, c, gamma, beta, eps):
    """relu(bn(x @ W + c)) max-pooled over the points axis, training-mode
    batch statistics — with a backward that never materializes dz.

    Forward math (M = B*N rows, z = x @ W + c, per-channel stats):
      mean = colmean(x) @ W + c
      E[z^2] = diag(W^T G W)/M + 2 c*mean - c^2       with G = sum_bn x x^T
      var = max(E[z^2] - mean^2, 0)                    (fast variance)
      s = gamma*rsqrt(var+eps); b = beta - mean*s
      out = relu(s * sel + b),  sel = max_n z if s>=0 else min_n z
    i.e. the batch stats come from the K x K Gram matrix instead of a
    second pass over the (M, E) activation.

    Backward: through the pool, dz has exactly the structure
      dz = onehot(argsel)*dsel + dmean/M + (2/M) * dE2 * z
    so with z = xW + c every dense contraction collapses onto G:
      dW  = gather(x, argsel)^T dsel + colmean(x) (x) dmean
            + (2/M) (G W) * dE2 + 2 colmean(x) (x) (c*dE2)
      dx  = scatter(dsel * W[:,e]) + (W dmean)/M
            + x @ (W diag(2 dE2/M) W^T) + (2/M) (c*dE2) W^T
    — O(M K^2) FLOPs and one (B, E, K) gather/scatter instead of two
    O(M K E) matmuls over a dense (M, E) dz (the profiled train-step
    bottleneck: stage5 fwd+bwd was 4.2 ms of the 6.3 ms step at
    B=256, N=1024, E=1024; tools/profile_bwd.py).

    Returns (out, batch_mean, batch_var); the module wrapper folds the
    running-stat EMA outside (under stop_gradient), mirroring
    fused_bn_relu_maxpool.
    """
    out, mean, var, _ = _lbrm_fwd_impl(x, W, c, gamma, beta, eps)
    return out, mean, var


def _lbrm_fwd_impl(x, W, c, gamma, beta, eps):
    B, N, K = x.shape
    E = W.shape[1]
    M = B * N
    # stats in at-least-f32 (f64 under x64 so exactness is testable)
    f32 = jnp.promote_types(x.dtype, jnp.float32)
    Wf = W.astype(f32)
    cf = c.astype(f32)
    if (
        jax.default_backend() == "tpu"
        and f32 == jnp.float32
        and _pool_stats_ok(N, E, K)
    ):
        # one fused HBM pass: (B, N, E) z never materializes and the
        # (~2.3 ms) XLA arg-reduces disappear (kernels/poolgrad.py)
        mx, mn, amax, amin, G, colsum = _pool_stats_pallas(x, W, c)
        out_dtype = x.dtype
        colmean_x = colsum / M
    else:
        z = x @ W + c  # compute dtype; consumed only by the 4 reduces below
        out_dtype = z.dtype
        mx = jnp.max(z, axis=1)
        mn = jnp.min(z, axis=1)
        amax = jnp.argmax(z, axis=1).astype(jnp.int32)
        amin = jnp.argmin(z, axis=1).astype(jnp.int32)
        colmean_x = jnp.mean(x.astype(f32), axis=(0, 1))
        G = jnp.einsum("bnk,bnl->kl", x, x, preferred_element_type=f32)
    T = G @ Wf  # (K, E), reused in the backward
    mean = colmean_x @ Wf + cf
    e2 = jnp.sum(Wf * T, axis=0) / M + 2.0 * cf * mean - cf * cf
    var = jnp.maximum(e2 - mean * mean, 0.0)

    s = gamma.astype(f32) * jax.lax.rsqrt(var + eps)
    b = beta.astype(f32) - mean * s
    spos = s >= 0
    sel = jnp.where(spos, mx, mn).astype(f32)
    idx = jnp.where(spos[None, :], amax, amin)
    a = s * sel + b
    out = jax.nn.relu(a).astype(out_dtype)
    resid = (x, W, c, beta, gamma, mean, var, e2, s, sel, idx, a > 0, colmean_x, T)
    return out, mean, var, resid


def _lbrm_fwd(x, W, c, gamma, beta, eps):
    out, mean, var, resid = _lbrm_fwd_impl(x, W, c, gamma, beta, eps)
    return (out, mean, var), resid


def _lbrm_bwd(eps, resid, cts):
    x, W, c, beta, gamma, mean, var, e2, s, sel, idx, pos, colmean_x, T = resid
    f32 = jnp.promote_types(x.dtype, jnp.float32)
    Wf = W.astype(f32)
    cf = c.astype(f32)
    dout, dmean_out, dvar_out = cts
    B, N, K = x.shape
    M = B * N

    da = dout.astype(f32) * pos  # (B, E)
    dsel = da * s
    db2 = jnp.sum(da, axis=0)  # (E,)
    ds = jnp.sum(da * sel, axis=0) - mean * db2
    rstd = jax.lax.rsqrt(var + eps)
    dgamma = ds * rstd
    dvar = -0.5 * ds * gamma.astype(f32) * rstd / (var + eps) + dvar_out.astype(f32)
    # var = max(e2 - mean^2, 0): the clip only bites in degenerate cases
    dd = jnp.where(e2 - mean * mean > 0, dvar, 0.0)
    dbeta = db2
    dmean = -s * db2 - 2.0 * mean * dd + dmean_out.astype(f32)
    dE2 = dd

    E = idx.shape[1]
    if jax.default_backend() == "tpu" and f32 == jnp.float32 and _pool_bwd_ok(N, E, K):
        # XLA's row-scatter serializes (4.3 ms at B=256,N=1024,E=1024,
        # K=128 on v5e) and the gathered dW einsum costs another ~3 ms;
        # the Pallas kernel runs both as VMEM one-hot MXU matmuls.
        dx, dW_sel = _pool_bwd_pallas(idx, dsel, W, x)
    else:
        # gather the selected rows: x_sel[b, e, :] = x[b, idx[b, e], :]
        x_sel = jnp.take_along_axis(x, idx[:, :, None], axis=1)  # (B, E, K)
        dW_sel = jnp.einsum("bek,be->ke", x_sel, dsel, preferred_element_type=f32)
        vals = (dsel[:, :, None] * Wf.T[None, :, :]).astype(f32)  # (B, E, K)
        dx = jnp.zeros((B, N, K), f32).at[jnp.arange(B)[:, None], idx].add(vals)
    dW = (
        dW_sel
        + jnp.outer(colmean_x, dmean)
        + (2.0 / M) * T * dE2[None, :]
        + 2.0 * jnp.outer(colmean_x, cf * dE2)
    )
    dc = jnp.sum(dsel, axis=0) + dmean + 2.0 * dE2 * mean
    P = (Wf * (2.0 * dE2 / M)[None, :]) @ Wf.T  # (K, K)
    row = Wf @ (dmean / M) + (2.0 / M) * (Wf @ (cf * dE2))  # (K,)
    dx = dx + jnp.einsum("bnk,kl->bnl", x, P.astype(x.dtype), preferred_element_type=f32)
    dx = dx + row[None, None, :]

    return (
        dx.astype(x.dtype),
        dW.astype(W.dtype),
        dc.astype(c.dtype),
        dgamma.astype(gamma.dtype),
        dbeta.astype(beta.dtype),
    )


_linear_bn_relu_maxpool_train.defvjp(_lbrm_fwd, _lbrm_bwd)


def linear_bn_relu_maxpool(x, linear, bn, use_running_average=None):
    """``max over points of relu(bn(linear(x)))`` for (B, N, K) inputs —
    the whole encoder tail as one fused stage.

    Train mode routes through the Gram-matrix custom-VJP
    (:func:`_linear_bn_relu_maxpool_train`); eval mode keeps the existing
    affine-selection fusion (no batch stats to compute). Running stats are
    EMA-updated here exactly as flax nnx.BatchNorm does.
    """
    ura = bn.use_running_average if use_running_average is None else use_running_average
    if ura:
        return fused_bn_relu_maxpool(linear(x), bn, True)
    kernel = linear.kernel[...]
    bias = linear.bias[...] if linear.bias is not None else jnp.zeros(
        (kernel.shape[-1],), kernel.dtype
    )
    # same compute-dtype promotion as nnx.Linear.__call__ (params stay in
    # param_dtype; the matmul runs in linear.dtype, e.g. bf16)
    x, kernel, bias = linear.promote_dtype((x, kernel, bias), dtype=linear.dtype)
    out, mean, var = _linear_bn_relu_maxpool_train(
        x, kernel, bias, bn.scale[...], bn.bias[...], bn.epsilon,
    )
    bn.mean[...] = jax.lax.stop_gradient(
        bn.momentum * bn.mean[...] + (1 - bn.momentum) * mean.astype(bn.mean[...].dtype)
    )
    bn.var[...] = jax.lax.stop_gradient(
        bn.momentum * bn.var[...] + (1 - bn.momentum) * var.astype(bn.var[...].dtype)
    )
    return out


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
