"""Lean fused attention for the DCP/PRNet pointer shapes.

The pointer transformer runs at ~52% bf16 MFU under XLA (BENCH_NOTES
round 3): the softmax chain between the QK^T and PV matmuls costs ~4
VPU passes over the (B, h, N, N) scores with imperfect fusion. At the
pointer's shapes (N ~ 768-1024, d = 128) the WHOLE K/V fits VMEM, so no
flash-style streaming/online-softmax is needed — one kernel step does
  S = (Q_tile @ K^T) * scale   (MXU, f32 accum)
  P = exp(S - rowmax(S))       (VPU, single traversal with the rowsum)
  O = (P_bf16 @ V) / rowsum    (MXU)
and the (TN, N) score tile never exists in HBM.

The generic jax.experimental flash kernel measured 2x SLOWER than XLA
here (round 2) — its streaming machinery (online softmax state, causal
plumbing) costs more than it saves when K/V are VMEM-resident. This
kernel is the shape-specialized alternative; math is exactly the
unfused softmax attention (f32 scores/normalizer, bf16 matmul inputs —
the same dtypes the einsum path uses on TPU).

Reference semantics: utils/transformer.py:17-23 (scaled dot-product
attention, no mask, no dropout in the DCP config).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x, m):
    return (x + m - 1) // m * m


def _attn_kernel(q_ref, k_ref, v_ref, o_ref, *, scale, n_valid):
    q = q_ref[0].astype(jnp.bfloat16)  # (TN, D)
    k = k_ref[0].astype(jnp.bfloat16)  # (Np, D)
    v = v_ref[0].astype(jnp.bfloat16)  # (Np, D)
    s = (
        jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        * scale
    )  # (TN, Np) f32
    if n_valid != s.shape[1]:
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where(col < n_valid, s, -jnp.inf)
    m = jnp.max(s, axis=1, keepdims=True)
    p = jnp.exp(s - m)
    l = jnp.sum(p, axis=1, keepdims=True)
    o = jax.lax.dot_general(
        p.astype(jnp.bfloat16), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    o_ref[0] = (o / l).astype(o_ref.dtype)


def attention_pallas(q, k, v, tile_n=256):
    """softmax(q k^T / sqrt(d)) v for (B, H, N, D) q/k and (B, H, M, Dv)
    v (Dv may differ — e.g. the SVD head attends embeddings onto xyz
    coordinates). Full (unmasked) attention; K/V live in VMEM whole;
    exact softmax (f32 scores, bf16 matmul operands — matches the TPU
    einsum path dtypes)."""
    B, H, N, D = q.shape
    M = k.shape[2]
    Dv = v.shape[3]
    scale = 1.0 / (D**0.5)
    Np = _round_up(N, tile_n)
    Mp = _round_up(M, 128)
    Dvp = _round_up(Dv, 128)
    qf = q.reshape(B * H, N, D)
    kf = k.reshape(B * H, M, D)
    vf = v.reshape(B * H, M, Dv)
    if Np != N:
        qf = jnp.pad(qf, ((0, 0), (0, Np - N), (0, 0)))
    if Mp != M:
        kf = jnp.pad(kf, ((0, 0), (0, Mp - M), (0, 0)))
        vf = jnp.pad(vf, ((0, 0), (0, Mp - M), (0, 0)))
    if Dvp != Dv:
        vf = jnp.pad(vf, ((0, 0), (0, 0), (0, Dvp - Dv)))

    grid = (B * H, Np // tile_n)
    out = pl.pallas_call(
        functools.partial(_attn_kernel, scale=scale, n_valid=M),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, tile_n, D), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Mp, D), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Mp, Dvp), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, tile_n, Dvp), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((B * H, Np, Dvp), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * H * Np * Mp * (D + Dvp),
            bytes_accessed=2 * B * H * (2 * Np * D + Mp * (D + Dvp)),
            transcendentals=B * H * Np * Mp,
        ),
    )(qf, kf, vf)
    return out[:, :N, :Dv].reshape(B, H, N, Dv)


def attention_oracle(q, k, v):
    """Identical-math jnp chain: bf16 matmul operands, f32 scores +
    softmax (the kernel's dtypes). Used as the custom-VJP backward and
    the parity oracle."""
    d = q.shape[-1]
    s = jax.lax.dot_general(
        q.astype(jnp.bfloat16),
        k.astype(jnp.bfloat16),
        (((3,), (3,)), ((0, 1), (0, 1))),
        preferred_element_type=jnp.float32,
    ) / (d**0.5)
    p = jax.nn.softmax(s, axis=-1)
    o = jax.lax.dot_general(
        p.astype(jnp.bfloat16),
        v.astype(jnp.bfloat16),
        (((3,), (2,)), ((0, 1), (0, 1))),
        preferred_element_type=jnp.float32,
    )
    return o.astype(q.dtype)


@jax.custom_vjp
def attention_fused(q, k, v):
    """Differentiable entry: Pallas forward, backward recomputes through
    the identical-math oracle (the kernel itself has no VJP)."""
    return attention_pallas(q, k, v)


def _attn_fwd(q, k, v):
    return attention_fused(q, k, v), (q, k, v)


def _attn_bwd(res, g):
    q, k, v = res
    _, vjp = jax.vjp(attention_oracle, q, k, v)
    return vjp(g)


attention_fused.defvjp(_attn_fwd, _attn_bwd)


# --- int8 serving variant -----------------------------------------------
#
# The v5e MXU runs int8 x int8 -> int32 at 2x the bf16 rate. For the
# serving-mode pointer (quant.QuantMHA) q/k/v arrive ALREADY quantized
# (the int8 projection GEMMs requantize in their epilogue), so the score
# matmul is one int8 MXU pass; the softmax stays exact f32; and P is
# requantized per row at the FIXED scale 1/127 — after the rowmax
# subtraction the largest element of each row is exp(0) = 1 exactly, so
# 127 is the per-row-optimal symmetric scale with no reduction needed.
# The PV product is the second int8 MXU pass. Only the (TN, D) f32
# output ever leaves VMEM.


def _attn_kernel_int8(q_ref, k_ref, v_ref, o_ref, *, sscale, vscale, n_valid, int8_pv):
    q = q_ref[0]  # (TN, D) int8
    k = k_ref[0]  # (Mp, D) int8
    v = v_ref[0]  # (Mp, D) int8
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.int32
    ).astype(jnp.float32) * sscale  # (TN, Mp) f32 = s_q * s_k / sqrt(d)
    if n_valid != s.shape[1]:
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where(col < n_valid, s, -jnp.inf)
    m = jnp.max(s, axis=1, keepdims=True)
    p = jnp.exp(s - m)
    l = jnp.sum(p, axis=1, keepdims=True)
    if int8_pv:
        p_q = jnp.round(p * 127.0).astype(jnp.int8)  # rowmax(p) == 1 exactly
        o = jax.lax.dot_general(
            p_q, v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
        ).astype(jnp.float32)
        o_ref[0] = (o * (vscale / 127.0) / l).astype(o_ref.dtype)
    else:
        # hybrid: pre-norm P spans [~1e-4, 1] within a row — 7-bit fixed
        # point collapses the tail (flat rows lose ~20% rel), while bf16
        # keeps RELATIVE precision at every magnitude. PV runs bf16 MXU.
        o = jax.lax.dot_general(
            p.astype(jnp.bfloat16),
            v.astype(jnp.bfloat16),
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        o_ref[0] = (o * vscale / l).astype(o_ref.dtype)


def attention_int8_oracle(q, k, v, s_q, s_k, s_v, out_dtype=jnp.bfloat16,
                          int8_pv=False):
    """Identical-math jnp chain of the int8 kernel (CPU fallback + parity
    oracle): int8 score matmul, f32 softmax, PV either int8 (P requantized
    at the exact per-row scale 127) or bf16 (the accuracy-safe hybrid)."""
    d = q.shape[-1]
    s = jax.lax.dot_general(
        q, k, (((3,), (3,)), ((0, 1), (0, 1))), preferred_element_type=jnp.int32
    ).astype(jnp.float32) * (s_q * s_k / (d**0.5))
    # UN-normalized p (rowmax == 1 exactly), like the kernel: P is
    # quantized/bf16-cast BEFORE the 1/l normalization
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    l = jnp.sum(p, axis=-1, keepdims=True)
    if int8_pv:
        p_q = jnp.round(p * 127.0).astype(jnp.int8)
        o = jax.lax.dot_general(
            p_q, v, (((3,), (2,)), ((0, 1), (0, 1))), preferred_element_type=jnp.int32
        ).astype(jnp.float32)
        return (o * (s_v / 127.0) / l).astype(out_dtype)
    o = jax.lax.dot_general(
        p.astype(jnp.bfloat16),
        v.astype(jnp.bfloat16),
        (((3,), (2,)), ((0, 1), (0, 1))),
        preferred_element_type=jnp.float32,
    )
    return (o * s_v / l).astype(out_dtype)


def attention_int8(q, k, v, s_q, s_k, s_v, tile_n=256, out_dtype=jnp.bfloat16,
                   int8_pv=False):
    """softmax((q s_q)(k s_k)^T / sqrt(d)) (v s_v) for int8 (B, H, N, D)
    q/k/v with static python-float dequant scales. Serving path of the
    quantized pointer (quant.QuantMHA); grads never flow here (training
    keeps the bf16 custom-VJP oracle in utils/transformer._attention).
    ``int8_pv`` also runs the PV product on the int8 MXU (fastest, but
    the post-softmax requantization costs accuracy on flat rows)."""
    B, H, N, D = q.shape
    M = k.shape[2]
    if not (
        jax.default_backend() == "tpu"
        and D % 128 == 0
        and D <= 512
        and 128 <= M <= 4096
    ):
        return attention_int8_oracle(q, k, v, s_q, s_k, s_v, out_dtype, int8_pv)
    sscale = float(s_q) * float(s_k) / (D**0.5)
    Np = _round_up(N, tile_n)
    Mp = _round_up(M, 128)
    qf = q.reshape(B * H, N, D)
    kf = k.reshape(B * H, M, D)
    vf = v.reshape(B * H, M, D)
    if Np != N:
        qf = jnp.pad(qf, ((0, 0), (0, Np - N), (0, 0)))
    if Mp != M:
        kf = jnp.pad(kf, ((0, 0), (0, Mp - M), (0, 0)))
        vf = jnp.pad(vf, ((0, 0), (0, Mp - M), (0, 0)))

    grid = (B * H, Np // tile_n)
    out = pl.pallas_call(
        functools.partial(
            _attn_kernel_int8, sscale=sscale, vscale=float(s_v), n_valid=M,
            int8_pv=int8_pv,
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, tile_n, D), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Mp, D), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Mp, D), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, tile_n, D), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((B * H, Np, D), out_dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * H * Np * Mp * 2 * D,
            bytes_accessed=B * H * (Np * D * 3 + Mp * D * 2),
            transcendentals=B * H * Np * Mp,
        ),
    )(qf, kf, vf)
    return out[:, :N].reshape(B, H, N, D)


def attention_pallas_ok(q, k, v):
    """Dispatch guard: eval-scale pointer shapes on TPU. The kernel holds
    K/V (and a (tile, M) score tile) in VMEM — cap M; D must be
    lane-aligned for the MXU."""
    import os

    B, H, N, D = q.shape
    M = k.shape[2]
    return (
        not os.environ.get("L3D_NO_PALLAS_ATTN")
        and jax.default_backend() == "tpu"
        and D % 128 == 0
        and D <= 512
        and 256 <= M <= 4096
        and N >= 256
    )
