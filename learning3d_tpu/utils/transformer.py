"""Co-attention Transformer pointer for DCP/PRNet.

Capability parity with the reference's Annotated-Transformer-style module
(utils/transformer.py:219-243): a pre-norm encoder/decoder pair run twice
with swapped roles to produce co-attended residual embeddings. Channel-last
(B, N, E); attention is plain jnp einsum + softmax (XLA flash-fuses at the
N <= 2048 regime this operates in; dropout is 0 in the reference config).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import nnx


def _attention(q, k, v):
    # Attention kernel history (measured, v5e, DCP shape B=32 h=4 N=1024
    # d=128): the GENERIC Pallas flash kernel is ~2x slower than the
    # einsum chain (round 2 — its streaming/online-softmax machinery
    # costs more than it saves when K/V fit VMEM); the shape-specialized
    # kernels/attention.py (whole K/V VMEM-resident, one score tile, no
    # streaming) is 2.45x FASTER (0.58 vs 1.43 ms per attention,
    # round 3). Dispatch it on TPU; training gets exact grads through
    # its identical-math custom-VJP oracle.
    from learning3d_tpu.kernels.attention import attention_fused, attention_pallas_ok

    if attention_pallas_ok(q, k, v):
        return attention_fused(q, k, v)
    d_k = q.shape[-1]
    scores = jnp.einsum("bhnd,bhmd->bhnm", q, k) / jnp.sqrt(jnp.asarray(d_k, q.dtype))
    return jnp.einsum("bhnm,bhmd->bhnd", jax.nn.softmax(scores, axis=-1), v)


class AnnotatedLayerNorm(nnx.Module):
    """The Annotated-Transformer LayerNorm the reference uses
    (utils/transformer.py:109-120): a * (x - mean) / (std + eps) + b with
    UNBIASED std and eps added to the std (torch's nn.LayerNorm — and
    nnx.LayerNorm — use biased var and eps inside the sqrt; at d=512 the
    difference is ~1e-3, enough to break golden parity)."""

    def __init__(self, features, eps=1e-6, *, dtype=None, rngs: nnx.Rngs):
        self.a = nnx.Param(jnp.ones((features,), jnp.float32))
        self.b = nnx.Param(jnp.zeros((features,), jnp.float32))
        self.eps = eps

    def __call__(self, x):
        # stats in f32 (params are f32), result cast back to the stream
        # dtype: without the cast every post-norm tensor silently upcasts
        # to f32 and the whole transformer runs f32 (2x LN/matmul traffic).
        xf = x.astype(jnp.float32)
        mean = jnp.mean(xf, axis=-1, keepdims=True)
        var = jnp.var(xf, axis=-1, keepdims=True) * (x.shape[-1] / (x.shape[-1] - 1))
        std = jnp.sqrt(var)
        return (self.a[...] * (xf - mean) / (std + self.eps) + self.b[...]).astype(
            x.dtype
        )


class MultiHeadedAttention(nnx.Module):
    def __init__(self, n_heads, d_model, *, dtype=None, rngs: nnx.Rngs):
        assert d_model % n_heads == 0
        self.h = n_heads
        self.d_k = d_model // n_heads
        self.wq = nnx.Linear(d_model, d_model, dtype=dtype, rngs=rngs)
        self.wk = nnx.Linear(d_model, d_model, dtype=dtype, rngs=rngs)
        self.wv = nnx.Linear(d_model, d_model, dtype=dtype, rngs=rngs)
        self.wo = nnx.Linear(d_model, d_model, dtype=dtype, rngs=rngs)

    def __call__(self, query, key, value):
        B, N, _ = query.shape

        def split(x):
            return jnp.swapaxes(x.reshape(B, x.shape[1], self.h, self.d_k), 1, 2)

        out = _attention(split(self.wq(query)), split(self.wk(key)), split(self.wv(value)))
        out = jnp.swapaxes(out, 1, 2).reshape(B, N, self.h * self.d_k)
        return self.wo(out)


class FeedForward(nnx.Module):
    def __init__(self, d_model, d_ff, *, dtype=None, rngs: nnx.Rngs):
        self.w1 = nnx.Linear(d_model, d_ff, dtype=dtype, rngs=rngs)
        self.w2 = nnx.Linear(d_ff, d_model, dtype=dtype, rngs=rngs)

    def __call__(self, x):
        return self.w2(jax.nn.relu(self.w1(x)))


class _EncoderLayer(nnx.Module):
    def __init__(self, d_model, n_heads, d_ff, *, dtype=None, rngs: nnx.Rngs):
        self.self_attn = MultiHeadedAttention(n_heads, d_model, dtype=dtype, rngs=rngs)
        self.ff = FeedForward(d_model, d_ff, dtype=dtype, rngs=rngs)
        self.norm1 = AnnotatedLayerNorm(d_model, dtype=dtype, rngs=rngs)
        self.norm2 = AnnotatedLayerNorm(d_model, dtype=dtype, rngs=rngs)

    def __call__(self, x):
        y = self.norm1(x)
        x = x + self.self_attn(y, y, y)
        return x + self.ff(self.norm2(x))


class _DecoderLayer(nnx.Module):
    def __init__(self, d_model, n_heads, d_ff, *, dtype=None, rngs: nnx.Rngs):
        self.self_attn = MultiHeadedAttention(n_heads, d_model, dtype=dtype, rngs=rngs)
        self.cross_attn = MultiHeadedAttention(n_heads, d_model, dtype=dtype, rngs=rngs)
        self.ff = FeedForward(d_model, d_ff, dtype=dtype, rngs=rngs)
        self.norm1 = AnnotatedLayerNorm(d_model, dtype=dtype, rngs=rngs)
        self.norm2 = AnnotatedLayerNorm(d_model, dtype=dtype, rngs=rngs)
        self.norm3 = AnnotatedLayerNorm(d_model, dtype=dtype, rngs=rngs)

    def __call__(self, x, memory):
        y = self.norm1(x)
        x = x + self.self_attn(y, y, y)
        y = self.norm2(x)
        x = x + self.cross_attn(y, memory, memory)
        return x + self.ff(self.norm3(x))


class Transformer(nnx.Module):
    """Run encoder(src)->decoder(tgt) and the swapped pair, producing
    co-attended residuals (reference utils/transformer.py:234-243)."""

    def __init__(
        self,
        emb_dims: int = 512,
        n_blocks: int = 1,
        dropout: float = 0.0,
        ff_dims: int = 1024,
        n_heads: int = 4,
        *,
        dtype=None,
        rngs: nnx.Rngs,
    ):
        self.emb_dims = emb_dims
        self.enc_layers = nnx.List([
            _EncoderLayer(emb_dims, n_heads, ff_dims, dtype=dtype, rngs=rngs)
            for _ in range(n_blocks)
        ])
        self.dec_layers = nnx.List([
            _DecoderLayer(emb_dims, n_heads, ff_dims, dtype=dtype, rngs=rngs)
            for _ in range(n_blocks)
        ])
        self.enc_norm = AnnotatedLayerNorm(emb_dims, dtype=dtype, rngs=rngs)
        self.dec_norm = AnnotatedLayerNorm(emb_dims, dtype=dtype, rngs=rngs)

    def _encode(self, x):
        for layer in self.enc_layers:
            x = layer(x)
        return self.enc_norm(x)

    def _decode(self, x, memory):
        for layer in self.dec_layers:
            x = layer(x, memory)
        return self.dec_norm(x)

    def __call__(self, src_emb, tgt_emb):
        """(B, N, E) x 2 -> (src_residual, tgt_residual).

        The reference runs encoder/decoder twice with swapped roles
        (utils/transformer.py:236-243); the two passes share weights, so
        they COULD be stacked into one 2B-batch call. Measured (round 3,
        v5e, B=32 N=1024 E=512 h=4): the 2B-batched variant runs 12.9 ms
        vs 5.4 ms for two sequential B=32 passes — at 2B XLA stops keeping
        the softmax(QK^T)V chain VMEM-resident and spills the (2B, h, N,
        N) score tensors to HBM. Keep the two-pass form."""
        tgt_residual = self._decode(tgt_emb, self._encode(src_emb))
        src_residual = self._decode(src_emb, self._encode(tgt_emb))
        return src_residual, tgt_residual


class Identity(nnx.Module):
    """Pass-through pointer (reference utils/transformer.py:211-216)."""

    def __call__(self, *args):
        return args
