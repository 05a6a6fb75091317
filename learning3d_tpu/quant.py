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
    """Wraps a Linear during the calibration pass, recording max|input|."""

    def __init__(self, inner):
        self.inner = inner
        self.amax = 0.0

    def __call__(self, x):
        self.amax = max(self.amax, float(jnp.max(jnp.abs(x.astype(jnp.float32)))))
        return self.inner(x)


def _pointer_linears(pointer):
    """(owner, attr) pairs of every Linear in the co-attention pointer."""
    out = []
    for layer in list(pointer.enc_layers):
        out += [(layer.self_attn, a) for a in ("wq", "wk", "wv", "wo")]
        out += [(layer.ff, a) for a in ("w1", "w2")]
    for layer in list(pointer.dec_layers):
        out += [(layer.self_attn, a) for a in ("wq", "wk", "wv", "wo")]
        out += [(layer.cross_attn, a) for a in ("wq", "wk", "wv", "wo")]
        out += [(layer.ff, a) for a in ("w1", "w2")]
    return out


def quantize_dcp_pointer(model, calib_template, calib_source):
    """Serving-mode DCP: int8 projections/FF in the co-attention pointer.

    Returns a CLONE of ``model`` (eval mode) whose pointer Linears are
    QuantizedLinear (per-channel int8 weights, static activation scales
    calibrated on one forward over the calib pair). The attention
    softmax chain, DGCNN encoder and SVD head keep their existing
    (bf16/Pallas) paths — the projections and feed-forwards are 687 of
    the pointer's 1100 GFLOP at B=32 N=1024.

    Accuracy evidence: tests/test_quant.py pins output closeness; the
    registration-metric delta of a TRAINED DCP is recorded in
    docs/runs/ (round-3 campaign)."""
    clone = nnx.merge(*nnx.split(model))
    clone.eval()
    sites = _pointer_linears(clone.pointer)
    recorders = []
    for owner, attr in sites:
        recorders.append(_AmaxRecorder(getattr(owner, attr)))
    for (owner, attr), rec in zip(sites, recorders):
        setattr(owner, attr, rec)
    clone(calib_template, calib_source)  # calibration pass (eager)
    for (owner, attr), rec in zip(sites, recorders):
        s_x = max(rec.amax, 1e-6) / 127.0
        setattr(owner, attr, QuantizedLinear(rec.inner, s_x))
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


def quantize_dcp(model, calib_template, calib_source):
    """Full int8 DCP serving mode: int8 pointer projections/FF
    (quantize_dcp_pointer) + the int8 fused DGCNN encoder kernel
    (kernels/dgcnn_fused.dgcnn_encode_fused_int8, dispatched on TPU when
    the clone's encoder carries ``int8_scales``). Returns a clone; the
    original model is untouched."""
    from learning3d_tpu.kernels.dgcnn_fused import calibrate_dgcnn_int8
    from learning3d_tpu.models.dgcnn import DGCNN

    clone = quantize_dcp_pointer(model, calib_template, calib_source)
    if isinstance(clone.emb_nn, DGCNN):
        calib = jnp.concatenate([calib_template, calib_source], axis=0)
        clone.emb_nn.int8_scales = calibrate_dgcnn_int8(
            clone.emb_nn.convs, clone.emb_nn.bns, clone.emb_nn.k, calib
        )
    return clone
