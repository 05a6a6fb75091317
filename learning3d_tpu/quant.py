"""Post-training int8 quantization for TPU inference serving.

The v5e MXU executes int8 x int8 -> int32 at twice the bf16 rate
(~394 TOPS vs ~197 TFLOPS). The bf16 PointNet classifier forward already
runs at ~77% of bf16 peak (BENCH_NOTES round 2) — the remaining headroom
to the >=10x north star (BASELINE.md) is a precision change, not more
fusion. This module provides the TPU-native PTQ recipe:

* symmetric per-output-channel int8 weights (s_w = max|W_col| / 127),
* static per-tensor activation scales calibrated from a batch
  (symmetric abs-max; activations here are post-ReLU so the dynamic
  range is one-sided and well covered),
* BN folded into the conv weights before quantization (eval mode), same
  fold as kernels/pointnet_fused.fold_conv_bn,
* the first conv (3 -> 64) and the final logits layer stay bf16 — they
  are <0.5% of the FLOPs and the most precision-sensitive ends of the
  chain.

Reference workload being served: PointNet(emb 1024) + Classifier
(/root/reference/models/pointnet.py:7-73, classifier.py:6-29, eval loop
 examples/test_pointnet.py:25-60). Accuracy parity of the quantized path
is pinned by tests/test_quant.py (trained-model top-1 agreement and
logit error) — not just claimed.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
from flax import nnx


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class QuantLinear:
    """One int8 GEMM layer: y = (x_q @ w_q) * (s_x * s_w) + b."""

    w_q: Any  # (in, out) int8
    s_w: Any  # (out,) f32
    b: Any  # (out,) f32
    s_x: Any  # () f32 static input scale

    def tree_flatten(self):
        return (self.w_q, self.s_w, self.b, self.s_x), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    def __call__(self, x, *, relu=True):
        x_q = quantize_activation(x, self.s_x)
        z = jax.lax.dot_general(
            x_q,
            self.w_q,
            (((x.ndim - 1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        y = z.astype(jnp.float32) * (self.s_x * self.s_w) + self.b
        return jax.nn.relu(y) if relu else y


def quantize_weight(w):
    """Symmetric per-output-channel int8: returns (w_q int8, s_w (out,))."""
    w = w.astype(jnp.float32)
    s = jnp.maximum(jnp.max(jnp.abs(w), axis=0), 1e-12) / 127.0
    w_q = jnp.clip(jnp.round(w / s), -127, 127).astype(jnp.int8)
    return w_q, s


def quantize_activation(x, s_x):
    return jnp.clip(jnp.round(x.astype(jnp.float32) / s_x), -127, 127).astype(jnp.int8)


def _act_scale(x, percentile=99.99):
    """Static symmetric activation scale from a calibration tensor."""
    a = jnp.percentile(jnp.abs(x.astype(jnp.float32)).ravel(), percentile)
    return jnp.maximum(a, 1e-6) / 127.0


def _folded_stack(convs, bns):
    from learning3d_tpu.kernels.pointnet_fused import fold_conv_bn

    return [fold_conv_bn(c, bn) for c, bn in zip(convs, bns)]


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class QuantPointNetClassifier:
    """Quantized eval forward of Classifier(PointNet(global_feat=True)).

    Layout: encoder conv1 bf16 -> conv2..conv5 int8 -> relu/max-pool
    (f32) -> head fc1/fc2 int8 -> logits layer bf16. Dropout is an
    eval no-op (reference classifier.py:22-29).
    """

    w1: Any  # (3, 64) f32 — first conv stays high precision
    b1: Any
    enc: Any  # list[QuantLinear] conv2..conv5
    head: Any  # list[QuantLinear] fc1, fc2
    w_out: Any  # (256, num_classes)
    b_out: Any

    def tree_flatten(self):
        return (self.w1, self.b1, self.enc, self.head, self.w_out, self.b_out), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    def __call__(self, x):
        """x (B, N, 3) -> logits (B, num_classes)."""
        h = jax.nn.relu(
            jax.lax.dot_general(
                x.astype(jnp.bfloat16),
                self.w1.astype(jnp.bfloat16),
                (((2,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            + self.b1
        )
        for i, q in enumerate(self.enc):
            last = i == len(self.enc) - 1
            h = q(h, relu=not last)
        # relu and max commute; padding-free pool over N
        g = jax.nn.relu(jnp.max(h, axis=1))  # (B, emb) f32
        for q in self.head:
            g = q(g, relu=True)
        logits = (
            jax.lax.dot_general(
                g.astype(jnp.bfloat16),
                self.w_out.astype(jnp.bfloat16),
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            + self.b_out
        )
        return logits


@jax.jit
def quant_forward(qm, x):
    """Jitted entry: the QuantPointNetClassifier pytree is a traced arg
    (jit(qm) directly would try to hash the dataclass as a static fn)."""
    return qm(x)


def make_fused_quant_forward(qm):
    """Serving entry using the fused Pallas int8 kernel
    (kernels/pointnet_fused.pointnet_pooled_int8): the whole encoder
    chain + pool stays VMEM-resident with int8 MXU dots. Activation
    scales are baked as static constants (one host fetch here)."""
    import functools

    from learning3d_tpu.kernels.pointnet_fused import pointnet_pooled_int8

    sx = tuple(float(q.s_x) for q in qm.enc)

    @jax.jit
    def fwd(qm, x):
        qlayers = [(q.w_q, q.s_w, q.b, s) for q, s in zip(qm.enc, sx)]
        g = pointnet_pooled_int8(x, qm.w1, qm.b1, qlayers)
        for q in qm.head:
            g = q(g, relu=True)
        return (
            jax.lax.dot_general(
                g.astype(jnp.bfloat16),
                qm.w_out.astype(jnp.bfloat16),
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            + qm.b_out
        )

    return functools.partial(fwd, qm)


# ---------------------------------------------------------------- DCP ---


class QuantizedLinear(nnx.Module):
    """nnx.Linear drop-in running int8 x int8 -> int32 on the MXU.
    A real nnx.Module so the surgically-modified clone stays
    split/merge/jit-compatible (its arrays are nnx.Variables)."""

    def __init__(self, linear, s_x):
        w = linear.kernel[...].astype(jnp.float32)
        w_q, s_w = quantize_weight(w)
        self.w_q = nnx.Variable(w_q)
        self.s_w = nnx.Variable(s_w)
        self.b = nnx.Variable(
            linear.bias[...].astype(jnp.float32)
            if linear.bias is not None
            else jnp.zeros((w.shape[1],), jnp.float32)
        )
        self.s_x = nnx.Variable(jnp.asarray(s_x, jnp.float32))
        self.out_dtype = linear.dtype or jnp.float32

    def __call__(self, x):
        x_q = quantize_activation(x, self.s_x[...])
        acc = jax.lax.dot_general(
            x_q,
            self.w_q[...],
            (((x.ndim - 1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        y = acc.astype(jnp.float32) * (self.s_x[...] * self.s_w[...]) + self.b[...]
        return y.astype(self.out_dtype)


class _AmaxRecorder:
    """Wraps a Linear during the calibration pass, recording max|input|
    and max|output| (the output amax is the post-projection activation
    scale the int8 attention core needs)."""

    def __init__(self, inner):
        self.inner = inner
        self.amax = 0.0
        self.amax_out = 0.0

    def __call__(self, x):
        self.amax = max(self.amax, float(jnp.max(jnp.abs(x.astype(jnp.float32)))))
        y = self.inner(x)
        self.amax_out = max(
            self.amax_out, float(jnp.max(jnp.abs(y.astype(jnp.float32))))
        )
        return y


def _requant(y, s):
    """f32 -> int8 at static scale s (fused by XLA into the producing
    GEMM's epilogue)."""
    return jnp.clip(jnp.round(y / s), -127, 127).astype(jnp.int8)


class QuantMHA(nnx.Module):
    """Serving-mode int8 multi-head attention (drop-in for
    utils.transformer.MultiHeadedAttention, eval only).

    The whole block runs on the int8 MXU (2x the bf16 rate on v5e):
      * ONE quantization of the block input feeds both the Q and the
        merged KV projection (the per-Linear surgery this replaces paid
        one f32 quantization HBM pass per projection — 4 per MHA);
      * projections requantize to int8 in their GEMM epilogue, so the
        attention core (kernels/attention.attention_int8) takes int8
        q/k/v directly: int8 QK^T, exact f32 softmax, P requantized per
        row at the exact scale 127 (rowmax(P) == 1), int8 PV;
      * the output projection consumes the attention output as int8.
    Static scales are calibrated by _AmaxRecorder during the float
    calibration pass. Training never sees this module — the bf16
    custom-VJP oracle path stays (utils/transformer._attention).
    Reference semantics: utils/transformer.py:219-243 (DCP pointer).
    """

    def __init__(self, mha, rec_q, rec_k, rec_v, rec_o, int8_pv=False):
        self.h = mha.h
        self.d_k = mha.d_k
        self.int8_pv = bool(int8_pv)  # int8 PV matmul (fast, lossy on flat rows)
        wq = mha.wq.kernel[...].astype(jnp.float32)
        wk = mha.wk.kernel[...].astype(jnp.float32)
        wv = mha.wv.kernel[...].astype(jnp.float32)
        wo = mha.wo.kernel[...].astype(jnp.float32)

        def bias(lin, d):
            return (
                lin.bias[...].astype(jnp.float32)
                if lin.bias is not None
                else jnp.zeros((d,), jnp.float32)
            )

        wq_q, s_wq = quantize_weight(wq)
        wkv_q, s_wkv = quantize_weight(jnp.concatenate([wk, wv], axis=1))
        wo_q, s_wo = quantize_weight(wo)
        self.wq_q = nnx.Variable(wq_q)
        self.s_wq = nnx.Variable(s_wq)
        self.bq = nnx.Variable(bias(mha.wq, wq.shape[1]))
        self.wkv_q = nnx.Variable(wkv_q)
        self.s_wkv = nnx.Variable(s_wkv)
        self.bkv = nnx.Variable(
            jnp.concatenate([bias(mha.wk, wk.shape[1]), bias(mha.wv, wv.shape[1])])
        )
        self.wo_q = nnx.Variable(wo_q)
        self.s_wo = nnx.Variable(s_wo)
        self.bo = nnx.Variable(bias(mha.wo, wo.shape[1]))
        # static python-float activation scales (baked into the jaxpr and
        # the Pallas kernel closure — nnx treats them as graphdef statics)
        self.s_in_q = max(rec_q.amax, 1e-6) / 127.0
        self.s_in_kv = max(rec_k.amax, 1e-6) / 127.0
        self.s_q = max(rec_q.amax_out, 1e-6) / 127.0
        self.s_k = max(rec_k.amax_out, 1e-6) / 127.0
        self.s_v = max(rec_v.amax_out, 1e-6) / 127.0
        self.s_att = max(rec_o.amax, 1e-6) / 127.0
        self.out_dtype = mha.wo.dtype or jnp.float32

    def _project(self, x_q, s_in, w_q, s_w, b, s_out):
        acc = jax.lax.dot_general(
            x_q, w_q, (((x_q.ndim - 1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        return _requant(acc.astype(jnp.float32) * (s_in * s_w) + b, s_out)

    def __call__(self, query, key, value):
        from learning3d_tpu.kernels.attention import attention_int8

        B, N, _ = query.shape
        d = self.h * self.d_k
        x_q = quantize_activation(query, self.s_in_q)
        if key is query:  # self-attention: reuse the quantized input
            kv_src, s_in = x_q, self.s_in_q
        else:  # cross-attention: quantize the memory once for K and V
            kv_src, s_in = quantize_activation(key, self.s_in_kv), self.s_in_kv
        # K and V share one merged int8 GEMM; the requant epilogue has
        # per-section scales so the attention core gets clean int8 heads
        s_kv = jnp.concatenate(
            [jnp.full((d,), self.s_k, jnp.float32), jnp.full((d,), self.s_v, jnp.float32)]
        )
        acc = jax.lax.dot_general(
            kv_src, self.wkv_q[...], (((kv_src.ndim - 1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        kv = _requant(
            (acc.astype(jnp.float32) * (s_in * self.s_wkv[...]) + self.bkv[...]) / s_kv,
            1.0,
        )
        q_i8 = self._project(
            x_q, self.s_in_q, self.wq_q[...], self.s_wq[...], self.bq[...], self.s_q
        )

        def split(t, n):
            return jnp.swapaxes(t.reshape(B, n, self.h, self.d_k), 1, 2)

        M = key.shape[1]
        o = attention_int8(
            split(q_i8, N), split(kv[..., :d], M), split(kv[..., d:], M),
            self.s_q, self.s_k, self.s_v, int8_pv=self.int8_pv,
        )  # (B, h, N, d_k) bf16
        o = jnp.swapaxes(o, 1, 2).reshape(B, N, d)
        o_q = quantize_activation(o, self.s_att)
        acc = jax.lax.dot_general(
            o_q, self.wo_q[...], (((2,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        out = acc.astype(jnp.float32) * (self.s_att * self.s_wo[...]) + self.bo[...]
        return out.astype(self.out_dtype)


class QuantFF(nnx.Module):
    """Serving-mode int8 feed-forward (drop-in for
    utils.transformer.FeedForward, eval only): quantize once -> int8
    GEMM -> relu+requant epilogue -> int8 GEMM -> stream dtype."""

    def __init__(self, ff, rec1, rec2):
        w1 = ff.w1.kernel[...].astype(jnp.float32)
        w2 = ff.w2.kernel[...].astype(jnp.float32)
        w1_q, s_w1 = quantize_weight(w1)
        w2_q, s_w2 = quantize_weight(w2)
        self.w1_q = nnx.Variable(w1_q)
        self.s_w1 = nnx.Variable(s_w1)
        self.b1 = nnx.Variable(
            ff.w1.bias[...].astype(jnp.float32)
            if ff.w1.bias is not None
            else jnp.zeros((w1.shape[1],), jnp.float32)
        )
        self.w2_q = nnx.Variable(w2_q)
        self.s_w2 = nnx.Variable(s_w2)
        self.b2 = nnx.Variable(
            ff.w2.bias[...].astype(jnp.float32)
            if ff.w2.bias is not None
            else jnp.zeros((w2.shape[1],), jnp.float32)
        )
        self.s_in = max(rec1.amax, 1e-6) / 127.0
        self.s_h = max(rec2.amax, 1e-6) / 127.0
        self.out_dtype = ff.w2.dtype or jnp.float32

    def __call__(self, x):
        x_q = quantize_activation(x, self.s_in)
        acc = jax.lax.dot_general(
            x_q, self.w1_q[...], (((x.ndim - 1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        h = jax.nn.relu(
            acc.astype(jnp.float32) * (self.s_in * self.s_w1[...]) + self.b1[...]
        )
        h_q = _requant(h, self.s_h)
        acc = jax.lax.dot_general(
            h_q, self.w2_q[...], (((x.ndim - 1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        out = acc.astype(jnp.float32) * (self.s_h * self.s_w2[...]) + self.b2[...]
        return out.astype(self.out_dtype)


def quantize_transformer_layer(layer, calib_fn, int8_pv=False):
    """Per-layer PTQ surgery on ONE _EncoderLayer/_DecoderLayer: record
    activation amax on a calibration pass, then swap the layer's MHA
    blocks for QuantMHA and its feed-forward for QuantFF — the same
    transformation quantize_dcp_pointer applies across the whole pointer,
    exposed at single-layer granularity for tests and the on-TPU kernel
    validator (tools/check_tpu_kernels.py).

    ``calib_fn(layer)`` must run one representative forward pass."""
    sites = [("self_attn", "mha"), ("ff", "ff")]
    if hasattr(layer, "cross_attn"):
        sites.insert(1, ("cross_attn", "mha"))
    recs = {}
    for attr, kind in sites:
        inner = getattr(layer, attr)
        names = ("wq", "wk", "wv", "wo") if kind == "mha" else ("w1", "w2")
        r = {a: _AmaxRecorder(getattr(inner, a)) for a in names}
        for a, rec in r.items():
            setattr(inner, a, rec)
        recs[attr] = (inner, r, kind)
    calib_fn(layer)
    for attr, (inner, r, kind) in recs.items():
        for a, rec in r.items():
            setattr(inner, a, rec.inner)
        if kind == "mha":
            setattr(
                layer, attr,
                QuantMHA(inner, r["wq"], r["wk"], r["wv"], r["wo"], int8_pv=int8_pv),
            )
        else:
            setattr(layer, attr, QuantFF(inner, r["w1"], r["w2"]))
    return layer


def _fused_weights_mha(qmha, prefix=""):
    """Weight-dict entries of one QuantMHA for the fused layer kernel.
    QuantMHA merges K|V into one int8 GEMM; per-output-channel scales
    split back exactly (column-separable)."""
    d = qmha.h * qmha.d_k
    p = prefix
    return {
        p + "wq": qmha.wq_q[...], p + "swq": qmha.s_wq[...], p + "bq": qmha.bq[...],
        p + "wk": qmha.wkv_q[...][:, :d], p + "swk": qmha.s_wkv[...][:d],
        p + "bk": qmha.bkv[...][:d],
        p + "wv": qmha.wkv_q[...][:, d:], p + "swv": qmha.s_wkv[...][d:],
        p + "bv": qmha.bkv[...][d:],
        p + "wo": qmha.wo_q[...], p + "swo": qmha.s_wo[...], p + "bo": qmha.bo[...],
    }


def _fused_weights_ff(qff):
    return {
        "w1": qff.w1_q[...], "sw1": qff.s_w1[...], "b1": qff.b1[...],
        "w2": qff.w2_q[...], "sw2": qff.s_w2[...], "b2": qff.b2[...],
    }


def _fused_ok(x, n_heads):
    from learning3d_tpu.kernels.transformer_int8 import fused_layer_ok

    return (
        jax.default_backend() == "tpu"
        and not __import__("os").environ.get("L3D_NO_FUSED_LAYER")
        and fused_layer_ok(x.shape[1], x.shape[2], n_heads)
    )


class QuantEncoderLayerFused(nnx.Module):
    """Drop-in for transformer._EncoderLayer whose blocks have been
    quantized: on TPU the WHOLE layer (LN1 -> int8 MHA -> residual ->
    LN2 -> int8 FF -> residual) runs as one VMEM-resident Pallas kernel
    (kernels/transformer_int8.encoder_layer_int8) — the inter-block
    f32 activations never touch HBM. Elsewhere (and for off-guard
    shapes) it composes the module path, which is the kernel's
    identical-math oracle."""

    def __init__(self, layer, int8_pv=True):
        from learning3d_tpu.kernels.transformer_int8 import LayerScales

        assert isinstance(layer.self_attn, QuantMHA)
        assert isinstance(layer.ff, QuantFF)
        self.inner = layer
        self.int8_pv = bool(int8_pv)
        m, f = layer.self_attn, layer.ff
        self.scales = LayerScales(
            s_y=m.s_in_q, s_q=m.s_q, s_k=m.s_k, s_v=m.s_v, s_att=m.s_att,
            s_ff=f.s_in, s_h=f.s_h,
        )

    def _weights(self):
        lyr = self.inner
        w = _fused_weights_mha(lyr.self_attn)
        w.update(_fused_weights_ff(lyr.ff))
        w.update({
            "ln1a": lyr.norm1.a[...], "ln1b": lyr.norm1.b[...],
            "ln2a": lyr.norm2.a[...], "ln2b": lyr.norm2.b[...],
        })
        return w

    @property
    def self_attn(self):  # introspection passthrough (tests, surgery)
        return self.inner.self_attn

    @property
    def ff(self):
        return self.inner.ff

    def __call__(self, x):
        if _fused_ok(x, self.inner.self_attn.h):
            from learning3d_tpu.kernels.transformer_int8 import encoder_layer_int8

            return encoder_layer_int8(
                x, self._weights(), self.scales,
                n_heads=self.inner.self_attn.h, int8_pv=self.int8_pv,
            )
        return self.inner(x)


class QuantDecoderLayerFused(nnx.Module):
    """Drop-in for transformer._DecoderLayer (self-attn + cross-attn +
    FF in one VMEM-resident kernel); see QuantEncoderLayerFused."""

    def __init__(self, layer, int8_pv=True):
        from learning3d_tpu.kernels.transformer_int8 import LayerScales

        assert isinstance(layer.self_attn, QuantMHA)
        assert isinstance(layer.cross_attn, QuantMHA)
        assert isinstance(layer.ff, QuantFF)
        self.inner = layer
        self.int8_pv = bool(int8_pv)
        m, c, f = layer.self_attn, layer.cross_attn, layer.ff
        self.scales = LayerScales(
            s_y=m.s_in_q, s_q=m.s_q, s_k=m.s_k, s_v=m.s_v, s_att=m.s_att,
            s_ff=f.s_in, s_h=f.s_h,
            s_y2=c.s_in_q, s_mem=c.s_in_kv,
            s_q2=c.s_q, s_k2=c.s_k, s_v2=c.s_v, s_att2=c.s_att,
        )

    def _weights(self):
        lyr = self.inner
        w = _fused_weights_mha(lyr.self_attn)
        w.update(_fused_weights_mha(lyr.cross_attn, prefix="x"))
        w.update(_fused_weights_ff(lyr.ff))
        w.update({
            "ln1a": lyr.norm1.a[...], "ln1b": lyr.norm1.b[...],
            "ln2a": lyr.norm2.a[...], "ln2b": lyr.norm2.b[...],
            "ln3a": lyr.norm3.a[...], "ln3b": lyr.norm3.b[...],
        })
        return w

    @property
    def self_attn(self):  # introspection passthrough (tests, surgery)
        return self.inner.self_attn

    @property
    def cross_attn(self):
        return self.inner.cross_attn

    @property
    def ff(self):
        return self.inner.ff

    def __call__(self, x, memory):
        if (
            _fused_ok(x, self.inner.self_attn.h)
            and memory.shape[1] == x.shape[1]
        ):
            from learning3d_tpu.kernels.transformer_int8 import decoder_layer_int8

            return decoder_layer_int8(
                x, memory, self._weights(), self.scales,
                n_heads=self.inner.self_attn.h, int8_pv=self.int8_pv,
            )
        return self.inner(x, memory)


def _pointer_blocks(pointer):
    """(owner, attr, kind) triples of every MHA/FF block in the pointer."""
    out = []
    for layer in list(pointer.enc_layers):
        out += [(layer, "self_attn", "mha"), (layer, "ff", "ff")]
    for layer in list(pointer.dec_layers):
        out += [
            (layer, "self_attn", "mha"),
            (layer, "cross_attn", "mha"),
            (layer, "ff", "ff"),
        ]
    return out


def quantize_dcp_pointer(model, calib_template, calib_source, int8_pv=False,
                         fused_layers=True):
    """Serving-mode DCP: int8 co-attention pointer (the FULL compute
    core, not just the Linears).

    Returns a CLONE of ``model`` (eval mode) whose pointer MHA blocks are
    QuantMHA (merged int8 KV projection, int8 QK^T / PV attention core
    via kernels/attention.attention_int8, int8 output projection) and
    whose feed-forwards are QuantFF — together ~1.1 TFLOP of the 1.35
    TFLOP DCP forward at B=32 N=1024 moves to the int8 MXU. LayerNorms
    and the SVD head stay f32/bf16 (<1% of FLOPs, precision-critical).

    Accuracy evidence: tests/test_quant_dcp.py pins output closeness; the
    registration-metric delta of a TRAINED DCP is recorded in docs/runs/
    (round-3: int8 matched bf16 Rot_RMSE to the 3rd decimal)."""
    clone = nnx.merge(*nnx.split(model))
    clone.eval()
    sites = _pointer_blocks(clone.pointer)
    recs = {}
    for owner, attr, kind in sites:
        inner = getattr(owner, attr)
        if kind == "mha":
            r = {a: _AmaxRecorder(getattr(inner, a)) for a in ("wq", "wk", "wv", "wo")}
            for a, rec in r.items():
                setattr(inner, a, rec)
        else:
            r = {a: _AmaxRecorder(getattr(inner, a)) for a in ("w1", "w2")}
            for a, rec in r.items():
                setattr(inner, a, rec)
        recs[id(inner)] = (inner, r)
    # Calibration pass. The recorders need host floats, so the pointer
    # runs eagerly — but ONLY the pointer: the encoder pass is jitted
    # (an eager full-DCP forward costs one tunnel RTT per op on proxied
    # TPU attachments — minutes; the pointer alone is ~10x fewer ops).
    from learning3d_tpu.utils.layers import to_bnc

    enc_gd, enc_st = nnx.split(clone.emb_nn)

    @jax.jit
    def _enc(st, x):
        return nnx.merge(enc_gd, st)(x)

    tgt_emb = _enc(enc_st, to_bnc(calib_template, clone.input_shape))
    src_emb = _enc(enc_st, to_bnc(calib_source, clone.input_shape))
    clone.pointer(src_emb, tgt_emb)  # what DCP._register feeds the pointer
    for owner, attr, kind in sites:
        inner = getattr(owner, attr)
        _, r = recs[id(inner)]
        if kind == "mha":
            for a, rec in r.items():  # restore before wrapping
                setattr(inner, a, rec.inner)
            setattr(
                owner, attr,
                QuantMHA(inner, r["wq"], r["wk"], r["wv"], r["wo"], int8_pv=int8_pv),
            )
        else:
            for a, rec in r.items():
                setattr(inner, a, rec.inner)
            setattr(owner, attr, QuantFF(inner, r["w1"], r["w2"]))
    if fused_layers:
        # wrap whole layers so the TPU path runs one VMEM-resident
        # Pallas kernel per layer (falls back to the module path off-TPU
        # or off-guard — the wrapper keeps the blocks as `inner`)
        for i, layer in enumerate(list(clone.pointer.enc_layers)):
            clone.pointer.enc_layers[i] = QuantEncoderLayerFused(layer, int8_pv=int8_pv)
        for i, layer in enumerate(list(clone.pointer.dec_layers)):
            clone.pointer.dec_layers[i] = QuantDecoderLayerFused(layer, int8_pv=int8_pv)
    return clone


def quantize_pointnet_classifier(model, calib_x, percentile=99.99):
    """PTQ a trained Classifier(PointNet) into a QuantPointNetClassifier.

    ``model`` must be in eval mode (BN running stats); ``calib_x``
    (B, N, 3) is the calibration batch for the static activation scales.
    """
    from learning3d_tpu.kernels.pointnet_fused import fold_conv_bn

    pn = model.feature_model
    enc_folded = _folded_stack(pn.convs, pn.bns)
    (w1, b1) = enc_folded[0]

    # classifier head: linear1/bn1, linear2/bn2, logits linear3
    head_folded = [
        fold_conv_bn(model.linear1, model.bn1),
        fold_conv_bn(model.linear2, model.bn2),
    ]
    w_out = model.linear3.kernel[...].astype(jnp.float32)
    b_out = (
        model.linear3.bias[...].astype(jnp.float32)
        if model.linear3.bias is not None
        else jnp.zeros((w_out.shape[1],), jnp.float32)
    )

    # --- calibrate: replay the f32 folded chain on the calib batch ----
    h = jax.nn.relu(calib_x.astype(jnp.float32) @ w1 + b1)
    enc = []
    for i, (w, b) in enumerate(enc_folded[1:]):
        s_x = _act_scale(h, percentile)
        w_q, s_w = quantize_weight(w)
        enc.append(QuantLinear(w_q, s_w, b, s_x))
        z = h @ w + b
        h = z if i == len(enc_folded[1:]) - 1 else jax.nn.relu(z)
    g = jax.nn.relu(jnp.max(h, axis=1))
    head = []
    for w, b in head_folded:
        s_x = _act_scale(g, percentile)
        w_q, s_w = quantize_weight(w)
        head.append(QuantLinear(w_q, s_w, b, s_x))
        g = jax.nn.relu(g @ w + b)
    return QuantPointNetClassifier(w1, b1, enc, head, w_out, b_out)


def quantize_dcp(model, calib_template, calib_source, int8_pv=False,
                 fused_layers=True):
    """Full int8 DCP serving mode: int8 co-attention pointer
    (quantize_dcp_pointer: int8 projections/FF + int8 QK^T attention
    core) + the int8 fused DGCNN encoder kernel
    (kernels/dgcnn_fused.dgcnn_encode_fused_int8, dispatched on TPU when
    the clone's encoder carries ``int8_scales``). Returns a clone; the
    original model is untouched."""
    from learning3d_tpu.kernels.dgcnn_fused import calibrate_dgcnn_int8
    from learning3d_tpu.models.dgcnn import DGCNN

    clone = quantize_dcp_pointer(model, calib_template, calib_source,
                                 int8_pv=int8_pv, fused_layers=fused_layers)
    if isinstance(clone.emb_nn, DGCNN):
        calib = jnp.concatenate([calib_template, calib_source], axis=0)
        clone.emb_nn.int8_scales = calibrate_dgcnn_int8(
            clone.emb_nn.convs, clone.emb_nn.bns, clone.emb_nn.k, calib
        )
    return clone
