"""Import PyTorch ``learning3d`` checkpoints into learning3d_tpu models.

The reference ships per-model ``.t7``/``.pth`` checkpoints (reference
README.md:47-60, pretrained/) and its train scripts save either a raw
``state_dict`` (``model.t7``) or a resume snap ``{'model': state_dict,
'optimizer': ..., 'epoch': ...}`` (reference examples/train_pointnet.py:
132-142). This module maps those torch-named tensors onto the
corresponding flax.nnx modules of this framework, so a user migrating
from the reference can keep their trained weights.

Layout conversions (torch -> here):
- ``nn.Conv1d`` 1x1   weight (O, I, 1)    -> ``nnx.Linear`` kernel (I, O)
- ``nn.Conv2d`` 1x1   weight (O, I, 1, 1) -> ``nnx.Linear`` kernel (I, O)
- ``nn.Linear``       weight (O, I)       -> ``nnx.Linear`` kernel (I, O)
- ``nn.BatchNorm*``   weight/bias/running_mean/running_var
                      -> ``nnx.BatchNorm`` scale/bias/mean/var
- ``nn.GroupNorm``    weight/bias -> ``nnx.GroupNorm`` scale/bias
- reference ``LayerNorm`` (utils/transformer.py:12-23) a_2/b_2
                      -> ``AnnotatedLayerNorm`` a/b

Entry points:
- :func:`import_torch_state_dict` — install a state_dict (torch tensors
  or numpy arrays) into a model instance; returns an :class:`ImportReport`.
- :func:`load_torch_checkpoint` — ``torch.load`` a checkpoint file
  (handles both raw state_dicts and resume snaps) and import it.

``nn.Sequential`` children are located by *shape*, not by hard-coded
index: a parametered child with a >=2-D weight is a conv/linear, a 1-D
weight with a ``running_mean`` sibling is a BatchNorm, without one a
GroupNorm. This keeps the mapping robust to interleaved activations
(reference Sequentials put ReLU/Dropout at varying offsets).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

import jax.numpy as jnp
import numpy as np

__all__ = ["ImportReport", "import_torch_state_dict", "load_torch_checkpoint"]


# --------------------------------------------------------------------------
# state-dict view with consumption tracking


def _to_numpy(v):
    if isinstance(v, np.ndarray):
        return v
    # torch tensor (avoid importing torch for the isinstance check)
    detach = getattr(v, "detach", None)
    if detach is not None:
        return detach().cpu().numpy()
    return np.asarray(v)


@dataclass
class ImportReport:
    """What an import actually did. ``unused`` keys usually mean a
    mismatched architecture (or a snap dict passed without unwrapping);
    ``num_batches_tracked`` bookkeeping is excluded."""

    used: list = field(default_factory=list)
    unused: list = field(default_factory=list)

    def raise_if_unused(self):
        if self.unused:
            raise KeyError(
                "torch checkpoint keys not consumed by the import "
                f"({len(self.unused)}): {sorted(self.unused)[:12]}..."
            )


class _View:
    """Prefix-scoped window over a flat state_dict with used-key marks."""

    def __init__(self, store: dict, used: set, prefix: str = ""):
        self.store = store
        self.used = used
        self.prefix = prefix

    def sub(self, name: str) -> "_View":
        return _View(self.store, self.used, self.prefix + name + ".")

    def has(self, name: str) -> bool:
        return self.prefix + name in self.store

    def peek(self, name: str) -> np.ndarray:
        return self.store[self.prefix + name]

    def get(self, name: str) -> np.ndarray:
        k = self.prefix + name
        self.used.add(k)
        return self.store[k]

    def mark(self, name: str):
        k = self.prefix + name
        if k in self.store:
            self.used.add(k)

    def child_indices(self, name: str = "") -> list:
        """Sorted integer child names of a Sequential/ModuleList at
        ``prefix + name`` (children that own at least one tensor)."""
        base = self.prefix + name + "." if name else self.prefix
        idx = set()
        pat = re.compile(re.escape(base) + r"(\d+)\.")
        for k in self.store:
            m = pat.match(k)
            if m:
                idx.add(int(m.group(1)))
        return sorted(idx)


# --------------------------------------------------------------------------
# leaf setters


def _set_kernel(lin, w: np.ndarray):
    if w.ndim == 4:  # Conv2d (O, I, 1, 1)
        k = w[..., 0, 0].T
    elif w.ndim == 3:  # Conv1d (O, I, 1)
        k = w[..., 0].T
    else:  # Linear (O, I)
        k = w.T
    if lin.kernel.shape != k.shape:
        raise ValueError(
            f"kernel shape mismatch: checkpoint {k.shape} vs model "
            f"{lin.kernel.shape}"
        )
    lin.kernel[...] = jnp.asarray(k)


def set_conv(lin, view: _View, name: str):
    """Conv1d/Conv2d/Linear -> nnx.Linear (dispatch on weight ndim)."""
    _set_kernel(lin, view.get(f"{name}.weight"))
    if view.has(f"{name}.bias"):
        if getattr(lin, "bias", None) is None or not getattr(lin, "use_bias", True):
            raise ValueError(f"checkpoint has bias for bias-free layer {name!r}")
        lin.bias[...] = jnp.asarray(view.get(f"{name}.bias"))


def _set_exact(var, value, what: str):
    """Assign with an explicit shape check (like _set_kernel) so a
    broadcast-compatible mismatch from a wrong checkpoint raises instead
    of installing silently."""
    value = jnp.asarray(value)
    if tuple(var.shape) != tuple(value.shape):
        raise ValueError(f"shape mismatch for {what}: {value.shape} vs {var.shape}")
    var[...] = value


def set_bn(bn, view: _View, name: str):
    _set_exact(bn.scale, view.get(f"{name}.weight"), f"{name}.weight")
    _set_exact(bn.bias, view.get(f"{name}.bias"), f"{name}.bias")
    _set_exact(bn.mean, view.get(f"{name}.running_mean"), f"{name}.running_mean")
    _set_exact(bn.var, view.get(f"{name}.running_var"), f"{name}.running_var")
    view.mark(f"{name}.num_batches_tracked")


def set_gn(gn, view: _View, name: str):
    _set_exact(gn.scale, view.get(f"{name}.weight"), f"{name}.weight")
    _set_exact(gn.bias, view.get(f"{name}.bias"), f"{name}.bias")


def set_ln(ln, view: _View, name: str):
    """Reference transformer LayerNorm (a_2/b_2)."""
    _set_exact(ln.a, view.get(f"{name}.a_2"), f"{name}.a_2")
    _set_exact(ln.b, view.get(f"{name}.b_2"), f"{name}.b_2")


def _seq_children(view: _View, name: str):
    """Classify the parametered children of a torch Sequential as
    ('conv'|'bn'|'gn', index) in order. 'conv' covers Linear too."""
    out = []
    for i in view.child_indices(name):
        w = f"{name}.{i}.weight"
        if not view.has(w):
            continue
        nd = view.peek(w).ndim
        if nd >= 2:
            out.append(("conv", i))
        elif view.has(f"{name}.{i}.running_mean"):
            out.append(("bn", i))
        else:
            out.append(("gn", i))
    return out


def seq_convs(view: _View, name: str) -> list:
    return [f"{name}.{i}" for kind, i in _seq_children(view, name) if kind == "conv"]


def seq_norms(view: _View, name: str, kind: str = "bn") -> list:
    return [f"{name}.{i}" for k, i in _seq_children(view, name) if k == kind]


def set_seq_conv_bn(blk, view: _View, name: str, lin_attr="lin", bn_attr="bn"):
    """Sequential(Conv, BatchNorm, activation...) -> block with .lin/.bn."""
    convs = seq_convs(view, name)
    bns = seq_norms(view, name, "bn")
    set_conv(getattr(blk, lin_attr), view, convs[0])
    if bns:
        set_bn(getattr(blk, bn_attr), view, bns[0])


# --------------------------------------------------------------------------
# per-model importers (dispatched on class name so imports stay lazy)


def _import_pointnet(m, v: _View):
    """Reference models/pointnet.py:22-49 (conv1..5 / bn1..5)."""
    for i in range(5):
        set_conv(m.convs[i], v, f"conv{i+1}")
        if m.bns[i] is not None and v.has(f"bn{i+1}.weight"):
            set_bn(m.bns[i], v, f"bn{i+1}")


def _import_dgcnn(m, v: _View):
    """Reference models/dgcnn.py:8-23 (conv1..5 Conv2d / bn1..5)."""
    for i in range(5):
        set_conv(m.convs[i], v, f"conv{i+1}")
        set_bn(m.bns[i], v, f"bn{i+1}")


def _import_classifier(m, v: _View):
    """Reference models/classifier.py:6-21."""
    _import_any(m.feature_model, v.sub("feature_model"))
    for j in (1, 2, 3):
        set_conv(getattr(m, f"linear{j}"), v, f"linear{j}")
    set_bn(m.bn1, v, "bn1")
    set_bn(m.bn2, v, "bn2")


def _import_segmentation(m, v: _View):
    """Reference models/segmentation.py:6-20."""
    _import_any(m.feature_model, v.sub("feature_model"))
    for j in (1, 2, 3, 4):
        set_conv(getattr(m, f"conv{j}"), v, f"conv{j}")
    for j in (1, 2, 3):
        set_bn(getattr(m, f"bn{j}"), v, f"bn{j}")


def _import_pcn(m, v: _View):
    """Reference models/pcn.py:27-109 (conv1..4, linear1..3, conv5..7)."""
    for j in (1, 2, 3, 4):
        set_conv(getattr(m, f"conv{j}"), v, f"conv{j}")
    for j in (1, 2, 3):
        set_conv(getattr(m, f"linear{j}"), v, f"linear{j}")
    if m.detailed_output:
        for j in (5, 6, 7):
            set_conv(getattr(m, f"conv{j}"), v, f"conv{j}")


def _import_ipcrnet(m, v: _View):
    """Reference models/pcrnet.py:9-26 (feature_model + 'linear' Sequential
    of 5 Linears + the 7-dof head as its last element)."""
    _import_any(m.feature_model, v.sub("feature_model"))
    lins = seq_convs(v, "linear")
    targets = list(m.linears) + [m.head]
    if len(lins) != len(targets):
        raise ValueError(f"iPCRNet head: {len(lins)} checkpoint Linears vs {len(targets)} layers")
    for tgt, name in zip(targets, lins):
        set_conv(tgt, v, name)


def _import_pointnetlk(m, v: _View):
    """Reference models/pointnetlk.py:10-31 (feature_model + optional
    learnable delta)."""
    _import_any(m.feature_model, v.sub("feature_model"))
    if v.has("dt"):
        m.dt[...] = jnp.asarray(v.get("dt")).reshape(m.dt.shape)


def _import_attention(t, v: _View):
    """Reference utils/transformer.py EncoderDecoder under ``<v>`` (the
    ``.model`` prefix): encoder/decoder layers with 4-linear attention,
    position-wise FF, sublayer LayerNorms."""

    def attn(block, name):
        for w, j in zip((block.wq, block.wk, block.wv, block.wo), range(4)):
            set_conv(w, v, f"{name}.linears.{j}")

    for li, layer in enumerate(t.enc_layers):
        base = f"encoder.layers.{li}"
        attn(layer.self_attn, f"{base}.self_attn")
        set_conv(layer.ff.w1, v, f"{base}.feed_forward.w_1")
        set_conv(layer.ff.w2, v, f"{base}.feed_forward.w_2")
        set_ln(layer.norm1, v, f"{base}.sublayer.0.norm")
        set_ln(layer.norm2, v, f"{base}.sublayer.1.norm")
    set_ln(t.enc_norm, v, "encoder.norm")
    for li, layer in enumerate(t.dec_layers):
        base = f"decoder.layers.{li}"
        attn(layer.self_attn, f"{base}.self_attn")
        attn(layer.cross_attn, f"{base}.src_attn")
        set_conv(layer.ff.w1, v, f"{base}.feed_forward.w_1")
        set_conv(layer.ff.w2, v, f"{base}.feed_forward.w_2")
        set_ln(layer.norm1, v, f"{base}.sublayer.0.norm")
        set_ln(layer.norm2, v, f"{base}.sublayer.1.norm")
        set_ln(layer.norm3, v, f"{base}.sublayer.2.norm")
    set_ln(t.dec_norm, v, "decoder.norm")


def _import_transformer(m, v: _View):
    _import_attention(m, v.sub("model"))


def _import_mlphead(m, v: _View):
    """Reference models/dcp.py:58-82 (nn Sequential + proj_rot/proj_trans)."""
    lins = seq_convs(v, "nn")
    bns = seq_norms(v, "nn", "bn")
    for tgt, name in zip(m.layers, lins):
        set_conv(tgt, v, name)
    for tgt, name in zip(m.bns, bns):
        set_bn(tgt, v, name)
    set_conv(m.proj_rot, v, "proj_rot")
    set_conv(m.proj_trans, v, "proj_trans")


def _import_dcp(m, v: _View):
    """Reference models/dcp.py:10-29."""
    _import_any(m.emb_nn, v.sub("emb_nn"))
    if v.has("pointer.model.encoder.norm.a_2"):
        _import_attention(m.pointer, v.sub("pointer.model"))
    if v.has("head.reflect"):  # SVDHead's constant reflection buffer
        v.mark("head.reflect")
    if v.has("head.proj_rot.weight"):
        _import_mlphead(m.head, v.sub("head"))


def _import_masknet_mask(m, v: _View):
    """Reference models/masknet.py PointNetMask (feature_model + h3
    Sequential of 5 Conv1d with interleaved ReLU)."""
    if v.has("feature_model.conv1.weight"):
        _import_any(m.feature_model, v.sub("feature_model"))
    convs = seq_convs(v, "h3")
    targets = list(m.h3) + [m.out]
    if len(convs) != len(targets):
        raise ValueError(f"MaskNet h3: {len(convs)} checkpoint convs vs {len(targets)} layers")
    for tgt, name in zip(targets, convs):
        set_conv(tgt, v, name)


def _import_masknet(m, v: _View):
    """Reference models/masknet.py:37-60: the wrapper holds the feature
    model only through maskNet."""
    _import_masknet_mask(m.maskNet, v.sub("maskNet"))


def _import_basicconv1d(blk, v: _View, name: str):
    """MaskNet2 BasicConv1D (bias-free conv + bn), reference
    models/masknet2.py:24-37."""
    set_conv(blk.conv, v, f"{name}.conv")
    set_bn(blk.bn, v, f"{name}.bn")


def _import_selfattn(blk, v: _View, name: str):
    _import_basicconv1d(blk.query_conv, v, f"{name}.query_conv")
    blk.beta[...] = jnp.asarray(v.get(f"{name}.beta")).reshape(blk.beta.shape)


def _import_masknet2_mask(m, v: _View):
    """Reference models/masknet2.py PointNetMask (5 SelfAttn feature
    stages, 3 coupled-attention FC stages, h3 BasicConv1D stack + out)."""
    for i in range(1, 6):
        _import_selfattn(getattr(m.feature_model, f"conv{i}"), v, f"feature_model.conv{i}")
    for j in (1, 2, 3):
        _import_selfattn(getattr(m, f"global_feat_{j}"), v, f"global_feat_{j}")
    basics = [i for i in v.child_indices("h3") if v.has(f"h3.{i}.conv.weight")]
    finals = [i for i in v.child_indices("h3") if v.has(f"h3.{i}.weight")]
    for blk, i in zip(m.h3, basics):
        _import_basicconv1d(blk, v, f"h3.{i}")
    set_conv(m.out, v, f"h3.{finals[0]}")


def _import_masknet2(m, v: _View):
    _import_masknet2_mask(m.maskNet, v.sub("maskNet"))


def _import_ppfnet(m, v: _View):
    """Reference models/ppfnet.py:15-69 (prepool Conv2d+GN stack, postpool
    Conv1d+GN stack with a final norm-free conv)."""
    pre_convs, pre_gns = seq_convs(v, "prepool"), seq_norms(v, "prepool", "gn")
    for blk, c, g in zip(m.prepool, pre_convs, pre_gns):
        set_conv(blk.lin, v, c)
        set_gn(blk.gn, v, g)
    post_convs, post_gns = seq_convs(v, "postpool"), seq_norms(v, "postpool", "gn")
    for blk, c, g in zip(m.postpool, post_convs[:-1], post_gns):
        set_conv(blk.lin, v, c)
        set_gn(blk.gn, v, g)
    set_conv(m.post_final, v, post_convs[-1])


def _import_parameter_prediction(m, v: _View):
    """Reference models/rpmnet.py:14-61 ParameterPredictionNet."""
    pre_convs, pre_gns = seq_convs(v, "prepool"), seq_norms(v, "prepool", "gn")
    for blk, c, g in zip(m.prepool, pre_convs, pre_gns):
        set_conv(blk.lin, v, c)
        set_gn(blk.gn, v, g)
    post_convs, post_gns = seq_convs(v, "postpool"), seq_norms(v, "postpool", "gn")
    for blk, c, g in zip((m.post1, m.post2), post_convs[:2], post_gns):
        set_conv(blk.lin, v, c)
        set_gn(blk.gn, v, g)
    set_conv(m.head, v, post_convs[2])


def _import_rpmnet(m, v: _View):
    """Reference models/rpmnet.py:256-281."""
    _import_parameter_prediction(m.weights_net, v.sub("weights_net"))
    _import_ppfnet(m.feat_extractor, v.sub("feat_extractor"))


def _import_conv1dbnrelu(blk, v: _View, name: str):
    """DeepGMR Conv1dBNReLU / FCBNReLU (reference models/deepgmr.py:57-70)."""
    set_seq_conv_bn(blk, v, name)


def _import_deepgmr_tnet(m, v: _View):
    for i, blk in enumerate(m.encoder):
        _import_conv1dbnrelu(blk, v, f"encoder.{i}")
    _import_conv1dbnrelu(m.fc1, v, "decoder.0")
    _import_conv1dbnrelu(m.fc2, v, "decoder.1")
    set_conv(m.head, v, "decoder.2")


def _import_deepgmr_backbone(m, v: _View):
    """Reference models/deepgmr.py:101-116 (encoder/decoder of
    Conv1dBNReLU with a plain final conv)."""
    if m.tnet is not None and v.has("tnet.encoder.0.0.weight"):
        _import_deepgmr_tnet(m.tnet, v.sub("tnet"))
    for i, blk in enumerate(m.encoder):
        _import_conv1dbnrelu(blk, v, f"encoder.{i}")
    for i, blk in enumerate(m.decoder):
        _import_conv1dbnrelu(blk, v, f"decoder.{i}")
    set_conv(m.head, v, f"decoder.{len(m.decoder)}")


def _import_deepgmr(m, v: _View):
    _import_deepgmr_backbone(m.backbone, v.sub("backbone"))


def _import_pointconv_sa(sa, v: _View):
    """Reference utils/pointconv_util.py:265-380 set abstraction."""
    for blk, i in zip(sa.mlp_blocks, v.child_indices("mlp_convs")):
        set_conv(blk.lin, v, f"mlp_convs.{i}")
        set_bn(blk.bn, v, f"mlp_bns.{i}")
    for blk, i in zip(sa.weightnet.blocks, v.child_indices("weightnet.mlp_convs")):
        set_conv(blk.lin, v, f"weightnet.mlp_convs.{i}")
        set_bn(blk.bn, v, f"weightnet.mlp_bns.{i}")
    for blk, i in zip(sa.densitynet.blocks, v.child_indices("densitynet.mlp_convs")):
        set_conv(blk.lin, v, f"densitynet.mlp_convs.{i}")
        set_bn(blk.bn, v, f"densitynet.mlp_bns.{i}")
    set_conv(sa.linear, v, "linear")
    set_bn(sa.bn_linear, v, "bn_linear")


def _import_pointconv(m, v: _View):
    """Reference models/pointconv.py:18-66."""
    for name in ("sa1", "sa2", "sa3"):
        _import_pointconv_sa(getattr(m, name), v.sub(name))
    if m.classifier:
        for j in (1, 2, 3):
            set_conv(getattr(m, f"fc{j}"), v, f"fc{j}")
        set_bn(m.bn1, v, "bn1")
        set_bn(m.bn2, v, "bn2")


def _import_lpfa(m, v: _View):
    """Reference utils/curvenet_util.py:229-290."""
    if not m.initial:
        cs, bs = seq_convs(v, "xyz2feature"), seq_norms(v, "xyz2feature", "bn")
        set_conv(m.xyz2feat_lin, v, cs[0])
        set_bn(m.xyz2feat_bn, v, bs[0])
    for blk, i in zip(m.mlp, v.child_indices("mlp")):
        set_seq_conv_bn(blk, v, f"mlp.{i}")


def _import_cic(m, v: _View):
    """Reference utils/curvenet_util.py:357-428."""
    set_seq_conv_bn(m.conv1, v, "conv1")
    set_seq_conv_bn(m.conv2, v, "conv2")
    if m.shortcut is not None:
        set_seq_conv_bn(m.shortcut, v, "shortcut")
    _import_lpfa(m.lpfa, v.sub("lpfa"))
    if m.use_curve:
        ca = m.curveaggregation
        cav = v.sub("curveaggregation")
        for name in ("conva", "convb", "convc", "convn", "convl"):
            set_conv(getattr(ca, name), cav, name)
        set_conv(ca.line_conv_att, cav, "line_conv_att")
        cs, bs = seq_convs(cav, "convd"), seq_norms(cav, "convd", "bn")
        set_conv(ca.convd_lin, cav, cs[0])
        set_bn(ca.convd_bn, cav, bs[0])
        cg = m.curvegrouping
        cgv = v.sub("curvegrouping")
        set_conv(cg.att, cgv, "att")
        wcs, wbs = seq_convs(cgv, "walk.agent_mlp"), seq_norms(cgv, "walk.agent_mlp", "bn")
        set_conv(cg.walk.agent_lin, cgv, wcs[0])
        set_bn(cg.walk.agent_bn, cgv, wbs[0])
        mcs, mbs = seq_convs(cgv, "walk.momentum_mlp"), seq_norms(cgv, "walk.momentum_mlp", "bn")
        set_conv(cg.walk.momentum_lin, cgv, mcs[0])
        set_bn(cg.walk.momentum_bn, cgv, mbs[0])


def _import_curvenet(m, v: _View):
    """Reference models/curvenet.py:37-112."""
    _import_lpfa(m.lpfa, v.sub("lpfa"))
    for name in ("cic11", "cic12", "cic21", "cic22", "cic31", "cic32", "cic41", "cic42"):
        _import_cic(getattr(m, name), v.sub(name))
    cs, bs = seq_convs(v, "conv0"), seq_norms(v, "conv0", "bn")
    set_conv(m.conv0_lin, v, cs[0])
    set_bn(m.conv0_bn, v, bs[0])
    set_conv(m.conv1, v, "conv1")
    set_bn(m.bn1, v, "bn1")
    set_conv(m.conv2, v, "conv2")


def _import_prnet(m, v: _View):
    """Reference models/prnet.py:246-316 (emb_nn, attention, temp_net,
    SVD-head temperature; KeyPointNet has no parameters)."""
    for i in range(5):
        set_conv(m.emb_nn.convs[i], v, f"emb_nn.conv{i+1}")
        if v.has(f"emb_nn.bn{i+1}.weight"):
            set_bn(m.emb_nn.bns[i], v, f"emb_nn.bn{i+1}")
    if v.has("attention.model.encoder.norm.a_2"):
        _import_attention(m.attention, v.sub("attention.model"))
    lins = seq_convs(v, "temp_net.nn")
    bns = seq_norms(v, "temp_net.nn", "bn")
    for tgt, name in zip(list(m.temp_net.layers) + [m.temp_net.head], lins):
        set_conv(tgt, v, name)
    for tgt, name in zip(m.temp_net.bns, bns):
        set_bn(tgt, v, name)
    if v.has("head.temperature"):
        m.head.temperature[...] = jnp.asarray(v.get("head.temperature")).reshape(
            m.head.temperature.shape
        )
    v.mark("head.reflect")  # constant reflection buffer (reference prnet.py:163)


def _import_flownet_convbn_list(blocks, v: _View, conv_name: str, bn_name: str):
    for blk, i in zip(blocks, v.child_indices(conv_name)):
        set_conv(blk.lin, v, f"{conv_name}.{i}")
        set_bn(blk.bn, v, f"{bn_name}.{i}")


def _import_flownet_seq_list(blocks, v: _View, name: str):
    for blk, i in zip(blocks, v.child_indices(name)):
        set_seq_conv_bn(blk, v, f"{name}.{i}", lin_attr="lin", bn_attr="bn")


def _import_flownet3d(m, v: _View):
    """Reference models/flownet3d.py:289-307 (original FlowNet3D repo
    checkpoints use this exact naming: saX.mlp_convs/mlp_bns,
    fe_layer.mlp_convs, suX.mlp1_convs/mlp2_convs Sequentials, fp)."""
    for name in ("sa1", "sa2", "sa3", "sa4"):
        _import_flownet_convbn_list(getattr(m, name).blocks, v.sub(name), "mlp_convs", "mlp_bns")
    _import_flownet_convbn_list(m.fe_layer.blocks, v.sub("fe_layer"), "mlp_convs", "mlp_bns")
    for name in ("su1", "su2", "su3"):
        su = getattr(m, name)
        _import_flownet_seq_list(su.blocks1, v.sub(name), "mlp1_convs")
        _import_flownet_seq_list(su.blocks2, v.sub(name), "mlp2_convs")
    _import_flownet_convbn_list(m.fp.blocks, v.sub("fp"), "mlp_convs", "mlp_bns")
    set_conv(m.conv1, v, "conv1")
    set_bn(m.bn1, v, "bn1")
    set_conv(m.conv2, v, "conv2")


_IMPORTERS = {
    "PointNet": _import_pointnet,
    "DGCNN": _import_dgcnn,
    "PRPointNet": _import_pointnet,  # same conv1..5 naming, no bns
    "PRDGCNN": _import_dgcnn,
    "Classifier": _import_classifier,
    "Segmentation": _import_segmentation,
    "PCN": _import_pcn,
    "iPCRNet": _import_ipcrnet,
    "PointNetLK": _import_pointnetlk,
    "DCP": _import_dcp,
    "Transformer": _import_transformer,
    "MLPHead": _import_mlphead,
    "MaskNet": _import_masknet,
    "PointNetMask": _import_masknet_mask,
    "MaskNet2": _import_masknet2,
    "PointNetMask2": _import_masknet2_mask,
    "PPFNet": _import_ppfnet,
    "ParameterPredictionNet": _import_parameter_prediction,
    "RPMNet": _import_rpmnet,
    "DeepGMR": _import_deepgmr,
    "ClusterNet": _import_deepgmr_backbone,
    "PointConvDensityClsSsg": _import_pointconv,
    "CurveNet": _import_curvenet,
    "PRNet": _import_prnet,
    "FlowNet3D": _import_flownet3d,
}


def _import_any(model, v: _View):
    name = type(model).__name__
    fn = _IMPORTERS.get(name)
    if fn is None:
        raise TypeError(f"no torch importer registered for {name}")
    fn(model, v)


# --------------------------------------------------------------------------
# public API


def import_torch_state_dict(model, state_dict, *, strict: bool = True) -> ImportReport:
    """Install a reference-named torch ``state_dict`` into ``model``.

    ``state_dict`` values may be torch tensors or numpy arrays. With
    ``strict=True`` (default) every checkpoint tensor must be consumed
    (``num_batches_tracked`` counters excluded)."""
    store = {k: _to_numpy(val) for k, val in state_dict.items()}
    used: set = set()
    _import_any(model, _View(store, used))
    unused = [
        k for k in store if k not in used and not k.endswith("num_batches_tracked")
    ]
    report = ImportReport(used=sorted(used), unused=sorted(unused))
    if strict:
        report.raise_if_unused()
    return report


def load_torch_checkpoint(model, path, *, strict: bool = True) -> ImportReport:
    """``torch.load`` a reference checkpoint file and import it.

    Accepts both raw state_dicts (``model.t7`` / ``model.pth``) and the
    reference train scripts' resume snaps ``{'model': state_dict, ...}``
    (reference examples/train_pointnet.py:132-142)."""
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=True)
    if isinstance(obj, dict) and "model" in obj and hasattr(obj["model"], "items"):
        first = next(iter(obj["model"].values()), None)
        if first is not None and hasattr(first, "ndim"):
            obj = obj["model"]
    return import_torch_state_dict(model, obj, strict=strict)
