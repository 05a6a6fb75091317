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
