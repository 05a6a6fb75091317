"""VMEM-resident fused int8 transformer layers for the DCP/PRNet pointer.

Round-3/4 profiling (BENCH_NOTES) showed the quantized pointer's int8
GEMMs are no longer the wall — the inter-block elementwise passes are:
at B=32, N=1024, d=512 every LayerNorm / quantize / requant / residual
between blocks reads+writes a 64 MB f32 activation in HBM (~150 us per
pass, ~10 passes per layer block). These kernels run ONE WHOLE
encoder/decoder layer per batch item inside VMEM (~12 MB at the DCP
shape), so the only HBM traffic per layer is the int8 weights and the
bf16 input/output streams.

Math is exactly the serving-mode module path (quant.QuantMHA + QuantFF +
utils.transformer.AnnotatedLayerNorm composed as _EncoderLayer /
_DecoderLayer do):
  x  = x + MHA_int8(LN1(x))                 [+ cross-attn for decoder]
  out = x + FF_int8(LN2(x))
with int8 QK^T / PV attention cores (P requantized per row at the exact
scale 127 — rowmax of exp(s - max) is 1), exact f32 softmax and
LayerNorms, and static python-float activation scales baked into the
kernel closure. Training never sees this path (the bf16 custom-VJP
oracle in utils/transformer._attention keeps exact grads).

Reference semantics: utils/transformer.py:219-243 (the pointer DCP runs).
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


@dataclasses.dataclass(frozen=True)
class LayerScales:
    """Static activation scales of one quantized layer (python floats —
    part of the kernel closure, not traced)."""

    s_y: float      # post-LN1 input scale (self-attention input)
    s_q: float
    s_k: float
    s_v: float
    s_att: float    # attention-output scale (feeds the output projection)
    s_ff: float     # post-LN feed-forward input scale
    s_h: float      # post-relu hidden scale
    # decoder-only (cross-attention); unused for encoder layers
    s_y2: float = 1.0  # post-LN2 cross-attn query input scale
    s_mem: float = 1.0
    s_q2: float = 1.0
    s_k2: float = 1.0
    s_v2: float = 1.0
    s_att2: float = 1.0


def _ln(x32, a, b, eps=1e-6):
    """AnnotatedLayerNorm: a * (x - mean) / (UNBIASED std + eps) + b
    (utils/transformer.AnnotatedLayerNorm — torch-reference semantics)."""
    n = x32.shape[-1]
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.var(x32, axis=-1, keepdims=True) * (n / (n - 1))
    return a * (x32 - mean) / (jnp.sqrt(var) + eps) + b


def _quant(x32, s):
    # divide, not multiply-by-reciprocal: quant.quantize_activation/_requant
    # divide, and a one-ULP difference flips round() at .5 ties — enough to
    # break bit-parity of the int8 streams between fused and module paths
    return jnp.clip(jnp.round(x32 / s), -127, 127).astype(jnp.int8)


def _gemm_i8(x_q, w_q):
    return jax.lax.dot_general(
        x_q, w_q, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
    )


def _proj(x_q, s_x, w_q, s_w, b, s_out):
    """int8 GEMM + dequant epilogue + requant to int8 at s_out."""
    acc = _gemm_i8(x_q, w_q).astype(jnp.float32)
    return _quant(acc * (s_x * s_w) + b, s_out)


def _attend(q, k, v, s_q, s_k, s_v, n_heads, d_k, tile_n, int8_pv):
    """Per-head int8 attention on whole-layer int8 q (N, d), k/v (M, d).
    Returns f32 (N, d). Identical math to kernels/attention._attn_kernel_int8."""
    N = q.shape[0]
    M = k.shape[0]
    sscale = s_q * s_k / (d_k**0.5)
    heads = []
    for hh in range(n_heads):
        sl = slice(hh * d_k, (hh + 1) * d_k)
        qh, kh, vh = q[:, sl], k[:, sl], v[:, sl]
        tiles = []
        for t in range(0, N, tile_n):
            s = jax.lax.dot_general(
                qh[t : t + tile_n], kh, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.int32,
            ).astype(jnp.float32) * sscale  # (tile, M)
            m = jnp.max(s, axis=1, keepdims=True)
            p = jnp.exp(s - m)
            l = jnp.sum(p, axis=1, keepdims=True)
            if int8_pv:
                p_q = jnp.round(p * 127.0).astype(jnp.int8)
                o = jax.lax.dot_general(
                    p_q, vh, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32,
                ).astype(jnp.float32) * (s_v / 127.0)
            else:
                o = jax.lax.dot_general(
                    p.astype(jnp.bfloat16), vh.astype(jnp.bfloat16),
                    (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
                ) * s_v
            tiles.append(o / l)
        heads.append(jnp.concatenate(tiles, axis=0))
    # bf16 round-trip: the module path (QuantMHA -> attention_int8,
    # out_dtype=bf16) hands the attention output to the s_att
    # requantization as bf16; match it exactly so fused and module paths
    # produce identical int8 streams.
    return jnp.concatenate(heads, axis=1).astype(jnp.bfloat16).astype(jnp.float32)


def _mha_block(x32, y_q, s_y, kv_q, s_kv, w, sc, n_heads, d_k, tile_n, int8_pv,
               prefix=""):
    """One residual MHA block: x32 + WO(attend(Q(y), K(kv), V(kv))).
    ``w`` is the weight dict; ``prefix`` selects self ('') vs cross ('x')
    weights; scale names follow LayerScales fields."""
    p = prefix
    q = _proj(y_q, s_y, w[p + "wq"], w[p + "swq"], w[p + "bq"], sc[p + "s_q"])
    k = _proj(kv_q, s_kv, w[p + "wk"], w[p + "swk"], w[p + "bk"], sc[p + "s_k"])
    v = _proj(kv_q, s_kv, w[p + "wv"], w[p + "swv"], w[p + "bv"], sc[p + "s_v"])
    attn = _attend(
        q, k, v, sc[p + "s_q"], sc[p + "s_k"], sc[p + "s_v"],
        n_heads, d_k, tile_n, int8_pv,
    )
    a_q = _quant(attn, sc[p + "s_att"])
    o = _gemm_i8(a_q, w[p + "wo"]).astype(jnp.float32)
    return x32 + o * (sc[p + "s_att"] * w[p + "swo"]) + w[p + "bo"]


def _ff_block(x32, w, s_ff, s_h, tile_n, ln_a, ln_b):
    """Residual feed-forward with tiled rows (bounds the f32 hidden to
    (tile, d_ff) VMEM): x + W2(relu(W1(quant(LN(x)))))."""
    N = x32.shape[0]
    outs = []
    for t in range(0, N, tile_n):
        xt = x32[t : t + tile_n]
        y = _ln(xt, ln_a, ln_b)
        h = _gemm_i8(_quant(y, s_ff), w["w1"]).astype(jnp.float32)
        h = jax.nn.relu(h * (s_ff * w["sw1"]) + w["b1"])
        o = _gemm_i8(_quant(h, s_h), w["w2"]).astype(jnp.float32)
        outs.append(xt + o * (s_h * w["sw2"]) + w["b2"])
    return jnp.concatenate(outs, axis=0)


# weight-array orderings (row vectors (1, d) for scales/biases/LN params
# so every ref is >= 2-D on TPU)
_ENC_NAMES = (
    "wq", "swq", "bq", "wk", "swk", "bk", "wv", "swv", "bv", "wo", "swo", "bo",
    "w1", "sw1", "b1", "w2", "sw2", "b2",
    "ln1a", "ln1b", "ln2a", "ln2b",
)
_DEC_NAMES = (
    "wq", "swq", "bq", "wk", "swk", "bk", "wv", "swv", "bv", "wo", "swo", "bo",
    "xwq", "xswq", "xbq", "xwk", "xswk", "xbk", "xwv", "xswv", "xbv",
    "xwo", "xswo", "xbo",
    "w1", "sw1", "b1", "w2", "sw2", "b2",
    "ln1a", "ln1b", "ln2a", "ln2b", "ln3a", "ln3b",
)


def _scale_dict(sc: LayerScales):
    return {
        "s_q": sc.s_q, "s_k": sc.s_k, "s_v": sc.s_v, "s_att": sc.s_att,
        "xs_q": sc.s_q2, "xs_k": sc.s_k2, "xs_v": sc.s_v2, "xs_att": sc.s_att2,
    }


def _enc_kernel(*refs, sc: LayerScales, n_heads, d_k, tile_n, int8_pv):
    x_ref, *w_refs, o_ref = refs
    w = {}
    for name, r in zip(_ENC_NAMES, w_refs):
        w[name] = r[:] if name[0] == "w" and name[1] in "qkvo12" else r[0]
    x = x_ref[0].astype(jnp.float32)  # (N, d)
    y_q = _quant(_ln(x, w["ln1a"], w["ln1b"]), sc.s_y)
    x2 = _mha_block(
        x, y_q, sc.s_y, y_q, sc.s_y, w, _scale_dict(sc),
        n_heads, d_k, tile_n, int8_pv,
    )
    out = _ff_block(x2, w, sc.s_ff, sc.s_h, tile_n, w["ln2a"], w["ln2b"])
    o_ref[0] = out.astype(o_ref.dtype)


def _dec_kernel(*refs, sc: LayerScales, n_heads, d_k, tile_n, int8_pv):
    x_ref, mem_ref, *w_refs, o_ref = refs
    w = {}
    for name, r in zip(_DEC_NAMES, w_refs):
        core = name[1:] if name.startswith("x") else name
        is_mat = core[0] == "w" and core[1] in "qkvo12"
        w[name] = r[:] if is_mat else r[0]
    x = x_ref[0].astype(jnp.float32)
    mem = mem_ref[0].astype(jnp.float32)
    scd = _scale_dict(sc)
    y_q = _quant(_ln(x, w["ln1a"], w["ln1b"]), sc.s_y)
    x2 = _mha_block(x, y_q, sc.s_y, y_q, sc.s_y, w, scd, n_heads, d_k, tile_n, int8_pv)
    y2_q = _quant(_ln(x2, w["ln2a"], w["ln2b"]), sc.s_y2)
    mem_q = _quant(mem, sc.s_mem)
    x3 = _mha_block(
        x2, y2_q, sc.s_y2, mem_q, sc.s_mem, w, scd,
        n_heads, d_k, tile_n, int8_pv, prefix="x",
    )
    out = _ff_block(x3, w, sc.s_ff, sc.s_h, tile_n, w["ln3a"], w["ln3b"])
    o_ref[0] = out.astype(o_ref.dtype)


def _row(v):
    """(d,) -> (1, d) f32 so TPU refs stay 2-D."""
    return jnp.asarray(v, jnp.float32).reshape(1, -1)


def _call(kernel, names, x, weights, extra_inputs, *, sc, n_heads, d_k,
          tile_n, int8_pv, interpret):
    B, N, d = x.shape
    arrays = []
    for name in names:
        a = weights[name]
        arrays.append(a if a.ndim == 2 and a.dtype == jnp.int8 else _row(a))
    in_specs = [
        pl.BlockSpec((1, N, d), lambda b: (b, 0, 0), memory_space=pltpu.VMEM)
    ]
    inputs = [x]
    for e in extra_inputs:
        in_specs.append(
            pl.BlockSpec((1, e.shape[1], e.shape[2]), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM)
        )
        inputs.append(e)
    for a in arrays:
        in_specs.append(
            pl.BlockSpec(a.shape, lambda b: (0, 0), memory_space=pltpu.VMEM)
        )
        inputs.append(a)
    flops_att = 2 * 2 * N * N * d * (2 if kernel is _dec_kernel else 1)
    flops = 2 * N * d * (4 * d + 2 * 4 * d) + flops_att  # per item, order-of
    return pl.pallas_call(
        functools.partial(
            kernel, sc=sc, n_heads=n_heads, d_k=d_k, tile_n=tile_n,
            int8_pv=int8_pv,
        ),
        grid=(B,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, N, d), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, N, d), x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=B * flops,
            bytes_accessed=B * (2 * N * d * 2) + sum(a.size for a in arrays),
            transcendentals=B * N * N * (3 if kernel is _dec_kernel else 2),
        ),
        # Whole-layer kernels keep several (N, d) f32 intermediates live on
        # the kernel stack (x, x2, attention output, FF tiles): ~18 MB bf16 /
        # ~26 MB f32 at the DCP shape — over Mosaic's 16 MB default scoped
        # limit (the round-4 driver-bench compile failure). v5e has 128 MB
        # VMEM; raise the scoped cap and let fused_layer_ok bound the shapes.
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(*inputs)


def encoder_layer_int8(x, weights, sc: LayerScales, *, n_heads=4, tile_n=256,
                       int8_pv=True, interpret=False):
    """One fused pre-norm encoder layer (self-attn + FF, both residual).

    x (B, N, d) bf16/f32; ``weights`` maps _ENC_NAMES to arrays: int8
    (d, d)/(d, d_ff) matrices, f32 per-column weight scales, biases and
    LN params. Returns (B, N, d) in x.dtype.
    """
    d = x.shape[-1]
    return _call(
        _enc_kernel, _ENC_NAMES, x, weights, (), sc=sc, n_heads=n_heads,
        d_k=d // n_heads, tile_n=tile_n, int8_pv=int8_pv, interpret=interpret,
    )


def decoder_layer_int8(x, memory, weights, sc: LayerScales, *, n_heads=4,
                       tile_n=256, int8_pv=True, interpret=False):
    """One fused pre-norm decoder layer (self-attn + cross-attn + FF)."""
    d = x.shape[-1]
    return _call(
        _dec_kernel, _DEC_NAMES, x, weights, (memory,), sc=sc,
        n_heads=n_heads, d_k=d // n_heads, tile_n=tile_n, int8_pv=int8_pv,
        interpret=interpret,
    )


def _plain_weights(names, weights):
    w = {}
    for name in names:
        a = jnp.asarray(weights[name])
        core = name[1:] if name.startswith("x") else name
        is_mat = core[0] == "w" and core[1] in "qkvo12"
        w[name] = a if is_mat else a.reshape(-1).astype(jnp.float32)
    return w


def encoder_layer_int8_reference(x, weights, sc: LayerScales, *, n_heads=4,
                                 tile_n=256, int8_pv=True):
    """The kernel body as plain jnp (no pallas_call): bit-identical math,
    used as the parity oracle. A compiled kernel can differ from this by
    1-ULP FMA scheduling, which flips int8 rounding ties downstream —
    tests pin THIS path exactly and the pallas path to tie-flip
    tolerance."""
    w = _plain_weights(_ENC_NAMES, weights)
    d_k = x.shape[-1] // n_heads
    scd = _scale_dict(sc)

    def one(xb):
        x32 = xb.astype(jnp.float32)
        y_q = _quant(_ln(x32, w["ln1a"], w["ln1b"]), sc.s_y)
        x2 = _mha_block(x32, y_q, sc.s_y, y_q, sc.s_y, w, scd,
                        n_heads, d_k, tile_n, int8_pv)
        return _ff_block(x2, w, sc.s_ff, sc.s_h, tile_n,
                         w["ln2a"], w["ln2b"]).astype(x.dtype)

    return jnp.stack([one(x[b]) for b in range(x.shape[0])])


def decoder_layer_int8_reference(x, memory, weights, sc: LayerScales, *,
                                 n_heads=4, tile_n=256, int8_pv=True):
    """Plain-jnp oracle of decoder_layer_int8 (see encoder reference)."""
    w = _plain_weights(_DEC_NAMES, weights)
    d_k = x.shape[-1] // n_heads
    scd = _scale_dict(sc)

    def one(xb, mb):
        x32 = xb.astype(jnp.float32)
        mem = mb.astype(jnp.float32)
        y_q = _quant(_ln(x32, w["ln1a"], w["ln1b"]), sc.s_y)
        x2 = _mha_block(x32, y_q, sc.s_y, y_q, sc.s_y, w, scd,
                        n_heads, d_k, tile_n, int8_pv)
        y2_q = _quant(_ln(x2, w["ln2a"], w["ln2b"]), sc.s_y2)
        mem_q = _quant(mem, sc.s_mem)
        x3 = _mha_block(x2, y2_q, sc.s_y2, mem_q, sc.s_mem, w, scd,
                        n_heads, d_k, tile_n, int8_pv, prefix="x")
        return _ff_block(x3, w, sc.s_ff, sc.s_h, tile_n,
                         w["ln3a"], w["ln3b"]).astype(x.dtype)

    return jnp.stack([one(x[b], memory[b]) for b in range(x.shape[0])])


def fused_layer_ok(N, d, n_heads, tile_n=256):
    """Dispatch guard: DCP-scale shapes whose buffers fit VMEM and whose
    dims are MXU-aligned."""
    d_k = d // n_heads
    return (
        d % 128 == 0
        and d_k % 128 == 0
        and N % tile_n == 0
        and 256 <= N <= 2048
        and d <= 1024
    )
