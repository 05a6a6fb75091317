"""Fully-fused eval-mode PointNet encoder: the whole 3->64->64->64->128
->emb conv chain + BN fold + ReLU + max-pool in ONE Pallas kernel.

The XLA eval path (models/pointnet.py) runs each 1x1 conv as a separate
GEMM, so every intermediate activation round-trips HBM: at B=256, N=1024
the three 64-channel stages are ~34 MB each (bf16) against only ~11 us of
MXU work apiece — they are pure bandwidth, ~0.1 ms of the 0.46 ms forward
(tools/profile_train.py). Here the per-point chain lives in VMEM: the
kernel reads the (B, N, 3) cloud once (3 MB), keeps every intermediate
on-chip, and writes only the pooled (B, emb) feature (0.5 MB). The big
128->emb GEMM (87% of the FLOPs) is unchanged and already MXU-bound, so
the fusion removes essentially all non-roofline time.

TPU-native details:

* eval-mode BatchNorm is a per-channel affine folded into each conv's
  weight/bias outside the kernel (W' = W * s, b' = (b - mean) * s + beta,
  same fold as kernels/dgcnn_fused.py::_fold_bn but PointNet convs carry
  a bias);
* relu and max commute (both monotone), so the pooled feature is
  relu(max_n z_n) — the (N, emb) pre-activation is consumed by the max
  reduction while still in VMEM and padding rows are masked to -BIG;
* each grid step processes ``bt`` clouds (python-unrolled, static
  indices) so the per-step MXU work (~bt * 1.4 us) amortizes Mosaic's
  grid overhead; weights use constant index_maps and stay resident.

Differentiation: the public entry point wraps the kernel in a
``jax.custom_vjp`` whose backward recomputes through an identical-math
jnp chain (`_oracle_chain`), so heads that differentiate through a
frozen-BN encoder (PointNetLK's warm-then-freeze trick) still get exact
gradients — the kernel only replaces the *forward* HBM traffic.

Reference semantics: models/pointnet.py:7-73 + the max-pool head used by
Classifier/iPCRNet/PointNetLK (reference models/classifier.py:24-27).
Train-mode BN (batch statistics) keeps the unfused
utils/layers.linear_bn_relu_maxpool path.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BIG = 1e30


def _round_up(x, m):
    return (x + m - 1) // m * m


def _pn_kernel(xt_ref, *refs, n_valid, bt, n_stages, dot_dtype):
    """xt_ref (bt, 3, Np) f32; refs = [w1, b1, ..., wS, bS, out_ref].

    Weights are BN-folded f32 (cast to ``dot_dtype`` for the MXU, f32
    accumulation); out_ref is (bt, emb).
    """
    ws = [refs[2 * i] for i in range(n_stages)]
    bs = [refs[2 * i + 1] for i in range(n_stages)]
    out_ref = refs[2 * n_stages]
    f32 = jnp.float32

    for j in range(bt):  # static unroll: per-cloud chain + pooled write
        h = jnp.transpose(xt_ref[j]).astype(dot_dtype)  # (Np, 3)
        for i in range(n_stages - 1):
            z = (
                jax.lax.dot_general(
                    h, ws[i][...].astype(dot_dtype), (((1,), (0,)), ((), ())),
                    preferred_element_type=f32,
                )
                + bs[i][...]
            )
            h = jax.nn.relu(z).astype(dot_dtype)
        z = (
            jax.lax.dot_general(
                h, ws[-1][...].astype(dot_dtype), (((1,), (0,)), ((), ())),
                preferred_element_type=f32,
            )
            + bs[-1][...]
        )  # (Np, emb) f32, consumed immediately by the max
        rows = jax.lax.broadcasted_iota(jnp.int32, z.shape, 0)
        z = jnp.where(rows < n_valid, z, -_BIG)
        out_ref[j, :] = jax.nn.relu(jnp.max(z, axis=0)).astype(out_ref.dtype)


def _pn_int8_kernel(xt_ref, *refs, n_valid, bt, n_q, dot_dtype, scales_x):
    """int8 variant: stage 1 (3 -> C1) in ``dot_dtype``, stages 2..S as
    int8 x int8 -> int32 MXU dots with static activation scales
    (``scales_x``, python floats baked at trace time), requant + relu in
    VMEM. refs = [w1, b1, (wq_i, swb_i) * n_q, out_ref]; ``swb_i`` rows
    are [s_w * s_x; b] stacked (2, C_out) so the epilogue is one fused
    multiply-add."""
    w1_ref, b1_ref = refs[0], refs[1]
    qrefs = refs[2 : 2 + 2 * n_q]
    out_ref = refs[2 + 2 * n_q]
    f32 = jnp.float32

    for j in range(bt):
        h = jnp.transpose(xt_ref[j]).astype(dot_dtype)  # (Np, 3)
        z = (
            jax.lax.dot_general(
                h, w1_ref[...].astype(dot_dtype), (((1,), (0,)), ((), ())),
                preferred_element_type=f32,
            )
            + b1_ref[...]
        )
        h = jax.nn.relu(z)  # f32 (Np, C1)
        for i in range(n_q):
            wq = qrefs[2 * i]
            swb = qrefs[2 * i + 1]  # (2, C_out): [s_w * s_x; b]
            inv = 1.0 / scales_x[i]
            hq = jnp.clip(jnp.round(h * inv), -127, 127).astype(jnp.int8)
            acc = jax.lax.dot_general(
                hq, wq[...], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
            z = acc.astype(f32) * swb[0:1, :] + swb[1:2, :]
            h = jax.nn.relu(z) if i < n_q - 1 else z  # last: pre-pool
        rows = jax.lax.broadcasted_iota(jnp.int32, h.shape, 0)
        h = jnp.where(rows < n_valid, h, -_BIG)
        out_ref[j, :] = jax.nn.relu(jnp.max(h, axis=0)).astype(out_ref.dtype)


def pointnet_pooled_int8(x, w1, b1, qlayers, *, bt=8, dot_dtype=jnp.bfloat16):
    """Fused int8 eval encoder+pool: x (B, N, 3) -> (B, emb) f32.

    ``qlayers`` = list of (w_q int8 (in, out), s_w (out,), b (out,),
    s_x float) for conv2..conv5 — the same per-channel-weight /
    static-activation-scale scheme as learning3d_tpu/quant.py, but the
    whole chain stays VMEM-resident and the requant/relu epilogues fuse
    with the int8 MXU dots (no HBM round trips between stages)."""
    B, N, _ = x.shape
    emb = qlayers[-1][0].shape[1]
    Np = _round_up(N, 128)
    bt = min(bt, B)
    Bp = _round_up(B, bt)
    xt = jnp.swapaxes(x.astype(jnp.float32), 1, 2)
    if (Bp, Np) != (B, N):
        xt = jnp.pad(xt, ((0, Bp - B), (0, 0), (0, Np - N)))

    scales_x = tuple(float(s) for _, _, _, s in qlayers)
    args = [w1.astype(jnp.float32), b1.reshape(1, -1).astype(jnp.float32)]
    specs = [
        pl.BlockSpec(args[0].shape, lambda g: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec(args[1].shape, lambda g: (0, 0), memory_space=pltpu.VMEM),
    ]
    for w_q, s_w, b, s_x in qlayers:
        swb = jnp.stack([s_w.astype(jnp.float32) * s_x, b.astype(jnp.float32)])
        args += [w_q, swb]
        specs += [
            pl.BlockSpec(w_q.shape, lambda g: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(swb.shape, lambda g: (0, 0), memory_space=pltpu.VMEM),
        ]
    chain_flops = 2 * Bp * Np * (
        w1.shape[0] * w1.shape[1] + sum(q[0].shape[0] * q[0].shape[1] for q in qlayers)
    )
    out = pl.pallas_call(
        functools.partial(
            _pn_int8_kernel,
            n_valid=N,
            bt=bt,
            n_q=len(qlayers),
            dot_dtype=dot_dtype,
            scales_x=scales_x,
        ),
        grid=(Bp // bt,),
        in_specs=[
            pl.BlockSpec((bt, 3, Np), lambda g: (g, 0, 0), memory_space=pltpu.VMEM)
        ]
        + specs,
        out_specs=pl.BlockSpec((bt, emb), lambda g: (g, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Bp, emb), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=chain_flops,
            bytes_accessed=4 * Bp * Np * 3 + 4 * Bp * emb,
            transcendentals=0,
        ),
    )(xt, *args)
    return out[:B]


def fold_conv_bn(conv, bn):
    """Fold eval-mode BatchNorm into a biased conv: (W', b') f32 with
    relu(x @ W' + b') == relu(bn(x @ W + b)) under running stats."""
    w = conv.kernel[...].astype(jnp.float32)
    b = (
        conv.bias[...].astype(jnp.float32)
        if conv.bias is not None
        else jnp.zeros((w.shape[-1],), jnp.float32)
    )
    if bn is None:
        return w, b
    s = bn.scale[...].astype(jnp.float32) * jax.lax.rsqrt(
        bn.var[...].astype(jnp.float32) + bn.epsilon
    )
    return w * s[None, :], (b - bn.mean[...].astype(jnp.float32)) * s + bn.bias[
        ...
    ].astype(jnp.float32)


def pointnet_pooled_kernel(x, ws, bs, *, dot_dtype=jnp.bfloat16, bt=8):
    """Raw kernel call: x (B, N, 3) f32-ish, folded weights/biases (f32)
    -> pooled (B, emb). ``dot_dtype=f32`` for exactness tests."""
    B, N, _ = x.shape
    emb = ws[-1].shape[1]
    Np = _round_up(N, 128)
    bt = min(bt, B)  # don't pad B=1 serving calls up to 8 clouds of garbage
    Bp = _round_up(B, bt)
    xt = jnp.swapaxes(x.astype(jnp.float32), 1, 2)  # (B, 3, N)
    if (Bp, Np) != (B, N):
        xt = jnp.pad(xt, ((0, Bp - B), (0, 0), (0, Np - N)))

    out_dtype = dot_dtype if dot_dtype != jnp.float32 else x.dtype
    row = lambda a: a.reshape(1, -1)
    wb = []
    wb_specs = []
    for w, b in zip(ws, bs):
        wb += [w, row(b)]
        wb_specs += [
            pl.BlockSpec(w.shape, lambda g: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, w.shape[1]), lambda g: (0, 0), memory_space=pltpu.VMEM),
        ]
    chain_flops = 2 * Bp * Np * sum(w.shape[0] * w.shape[1] for w in ws)
    out = pl.pallas_call(
        functools.partial(
            _pn_kernel, n_valid=N, bt=bt, n_stages=len(ws), dot_dtype=dot_dtype
        ),
        grid=(Bp // bt,),
        in_specs=[
            pl.BlockSpec((bt, 3, Np), lambda g: (g, 0, 0), memory_space=pltpu.VMEM)
        ]
        + wb_specs,
        out_specs=pl.BlockSpec((bt, emb), lambda g: (g, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Bp, emb), out_dtype),
        cost_estimate=pl.CostEstimate(
            flops=chain_flops,
            bytes_accessed=4 * Bp * Np * 3 + 2 * Bp * emb,
            transcendentals=0,
        ),
    )(xt, *wb)
    return out[:B]


def oracle_chain(x, ws, bs, dot_dtype=jnp.bfloat16):
    """Identical-math jnp chain (the kernel's oracle and its VJP path)."""
    f32 = jnp.float32
    h = x.astype(dot_dtype)
    for w, b in zip(ws[:-1], bs[:-1]):
        z = (
            jax.lax.dot_general(
                h, w.astype(dot_dtype), (((2,), (0,)), ((), ())),
                preferred_element_type=f32,
            )
            + b
        )
        h = jax.nn.relu(z).astype(dot_dtype)
    z = (
        jax.lax.dot_general(
            h, ws[-1].astype(dot_dtype), (((2,), (0,)), ((), ())),
            preferred_element_type=f32,
        )
        + bs[-1]
    )
    out_dtype = dot_dtype if dot_dtype != jnp.float32 else x.dtype
    return jax.nn.relu(jnp.max(z, axis=-2)).astype(out_dtype)


@jax.custom_vjp
def _fused_bf16(x, ws, bs):
    return pointnet_pooled_kernel(x, list(ws), list(bs), dot_dtype=jnp.bfloat16)


def _fused_fwd(x, ws, bs):
    return _fused_bf16(x, ws, bs), (x, ws, bs)


def _fused_bwd(res, g):
    x, ws, bs = res
    _, vjp = jax.vjp(lambda x, ws, bs: oracle_chain(x, ws, bs, jnp.bfloat16), x, ws, bs)
    return vjp(g)


_fused_bf16.defvjp(_fused_fwd, _fused_bwd)


def pointnet_fused_ok(x, convs, bns, use_running_average=None):
    """Dispatch guard: eval-mode TPU bf16 max-pooled PointNet shapes."""
    if os.environ.get("L3D_NO_FUSED_POINTNET") or jax.default_backend() != "tpu":
        return False
    if x.ndim != 3 or x.shape[-1] != 3 or convs[0].in_features != 3:
        return False
    if convs[0].dtype != jnp.bfloat16 or x.shape[1] < 128:
        return False
    emb = convs[-1].out_features
    # VMEM bound uses the PADDED point count: the kernel rounds N up to a
    # multiple of 128 and the (Np, emb) f32 pre-pool block is the largest
    # live buffer per unrolled cloud (Mosaic reuses it across the bt
    # unroll — the chain is sequential — so bt does not multiply it).
    n_padded = _round_up(x.shape[1], 128)
    if n_padded * emb * 4 > 8 * 2**20 or emb % 128:
        return False
    for bn in bns:
        if bn is not None:
            ura = bn.use_running_average if use_running_average is None else use_running_average
            if not ura:
                return False  # train-mode BN needs batch stats: unfused path
    # NOTE: with use_bn=False there is no batch-stat dependence, so the
    # fused path is deliberately taken in TRAIN mode too — the custom VJP
    # recomputes the identical-math `oracle_chain`, so gradients are exact;
    # only f32-vs-bf16 accumulation order differs from the unfused chain.
    return True


def pointnet_pooled_fused(x, convs, bns):
    """Public entry: x (B, N, 3) -> pooled (B, emb) bf16, differentiable
    (backward recomputes through `oracle_chain`)."""
    folded = [fold_conv_bn(c, bn) for c, bn in zip(convs, bns)]
    ws = tuple(w for w, _ in folded)
    bs = tuple(b for _, b in folded)
    return _fused_bf16(x, ws, bs)
