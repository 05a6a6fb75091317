"""Torch-checkpoint importer: cases not covered by the parity suite.

The parity suite (test_torch_parity.py) drives the importer end-to-end
for every architecture the torch reference can execute; here we cover
(a) models whose torch reference cannot even be constructed in this
environment (FlowNet3D needs the CUDA extension, DeepGMR's reference
constructor has latent bugs — SURVEY.md §2.1), using synthesized
state_dicts with the reference's exact key naming, and (b) the
file-level entry point and strictness contract.
"""

import numpy as np
import pytest

from flax import nnx

from learning3d_tpu import models
from learning3d_tpu.utils.torch_import import (
    ImportReport,
    import_torch_state_dict,
    load_torch_checkpoint,
)


class _FakeSD:
    """Builds a reference-named state_dict with shapes derived from our
    modules (inverse of the importer's layout mapping)."""

    def __init__(self, seed=0):
        self.rng = np.random.default_rng(seed)
        self.store = {}

    def conv(self, name, lin, ndim=3, bias=None):
        i, o = lin.kernel.value.shape
        shape = (o, i) + (1,) * (ndim - 2)
        self.store[f"{name}.weight"] = self.rng.standard_normal(shape).astype(np.float32) * 0.1
        has_bias = getattr(lin, "bias", None) is not None and lin.bias.value is not None
        if bias is None:
            bias = has_bias
        if bias:
            self.store[f"{name}.bias"] = self.rng.standard_normal(o).astype(np.float32) * 0.1

    def bn(self, name, c):
        self.store[f"{name}.weight"] = self.rng.uniform(0.5, 1.5, c).astype(np.float32)
        self.store[f"{name}.bias"] = self.rng.standard_normal(c).astype(np.float32) * 0.1
        self.store[f"{name}.running_mean"] = self.rng.standard_normal(c).astype(np.float32) * 0.1
        self.store[f"{name}.running_var"] = self.rng.uniform(0.5, 1.5, c).astype(np.float32)
        self.store[f"{name}.num_batches_tracked"] = np.array(7)


class TestFlowNet3DImport:
    def test_synthesized_reference_checkpoint_imports(self):
        """Original FlowNet3D-repo naming (reference models/flownet3d.py:
        289-307): saX.mlp_convs/mlp_bns, fe_layer, suX.mlp1/mlp2
        Sequentials, fp, conv1/bn1/conv2."""
        m = models.FlowNet3D(rngs=nnx.Rngs(0))
        f = _FakeSD(1)
        for name in ("sa1", "sa2", "sa3", "sa4"):
            sa = getattr(m, name)
            for i, blk in enumerate(sa.blocks):
                f.conv(f"{name}.mlp_convs.{i}", blk.lin, ndim=4, bias=False)
                f.bn(f"{name}.mlp_bns.{i}", blk.bn.scale.value.shape[0])
        for i, blk in enumerate(m.fe_layer.blocks):
            f.conv(f"fe_layer.mlp_convs.{i}", blk.lin, ndim=4, bias=False)
            f.bn(f"fe_layer.mlp_bns.{i}", blk.bn.scale.value.shape[0])
        for name in ("su1", "su2", "su3"):
            su = getattr(m, name)
            for i, blk in enumerate(su.blocks1):
                f.conv(f"{name}.mlp1_convs.{i}.0", blk.lin, ndim=4, bias=False)
                f.bn(f"{name}.mlp1_convs.{i}.1", blk.bn.scale.value.shape[0])
            for i, blk in enumerate(su.blocks2):
                f.conv(f"{name}.mlp2_convs.{i}.0", blk.lin, ndim=3, bias=False)
                f.bn(f"{name}.mlp2_convs.{i}.1", blk.bn.scale.value.shape[0])
        for i, blk in enumerate(m.fp.blocks):
            f.conv(f"fp.mlp_convs.{i}", blk.lin, ndim=3, bias=False)
            f.bn(f"fp.mlp_bns.{i}", blk.bn.scale.value.shape[0])
        f.conv("conv1", m.conv1, ndim=3, bias=False)
        f.bn("bn1", 128)
        f.conv("conv2", m.conv2, ndim=3, bias=True)

        report = import_torch_state_dict(m, f.store)
        assert isinstance(report, ImportReport) and not report.unused
        # layout: conv weight (O, I, 1, 1) landed transposed in the kernel
        w = f.store["sa1.mlp_convs.0.weight"]
        np.testing.assert_allclose(
            np.asarray(m.sa1.blocks[0].lin.kernel.value), w[..., 0, 0].T, atol=0
        )
        np.testing.assert_allclose(
            np.asarray(m.bn1.mean.value), f.store["bn1.running_mean"], atol=0
        )


class TestDeepGMRImport:
    def test_synthesized_reference_checkpoint_imports(self):
        """Reference deepgmr.py naming: backbone.encoder.{i} Conv1dBNReLU
        Sequentials (conv at .0 bias-free, bn at .1), decoder with a plain
        final conv."""
        m = models.DeepGMR(use_rri=True, nearest_neighbors=8, d_model=64, n_clusters=8,
                           rngs=nnx.Rngs(0))
        f = _FakeSD(2)
        bb = m.backbone
        for i, blk in enumerate(bb.encoder):
            f.conv(f"backbone.encoder.{i}.0", blk.lin, ndim=3, bias=False)
            f.bn(f"backbone.encoder.{i}.1", blk.bn.scale.value.shape[0])
        for i, blk in enumerate(bb.decoder):
            f.conv(f"backbone.decoder.{i}.0", blk.lin, ndim=3, bias=False)
            f.bn(f"backbone.decoder.{i}.1", blk.bn.scale.value.shape[0])
        f.conv("backbone.decoder.3", bb.head, ndim=3, bias=True)

        report = import_torch_state_dict(m, f.store)
        assert not report.unused
        w = f.store["backbone.encoder.0.0.weight"]
        np.testing.assert_allclose(
            np.asarray(bb.encoder[0].lin.kernel.value), w[..., 0].T, atol=0
        )
        # forward still runs with imported weights
        import jax

        xyz = jax.random.normal(jax.random.PRNGKey(0), (2, 32, 3))
        from learning3d_tpu.ops.geometry import get_rri

        feats = get_rri(xyz, k=8)
        out = m(
            np.concatenate([np.asarray(xyz), np.asarray(feats)], axis=-1),
            np.concatenate([np.asarray(xyz), np.asarray(feats)], axis=-1),
        )
        assert np.asarray(out["est_T"]).shape == (2, 4, 4)


class TestCheckpointFile:
    def test_snap_dict_roundtrip(self, tmp_path):
        torch = pytest.importorskip("torch")
        mine = models.PointNet(emb_dims=32, use_bn=False, rngs=nnx.Rngs(0))
        f = _FakeSD(3)
        for i in range(5):
            f.conv(f"conv{i+1}", mine.convs[i], ndim=3, bias=True)
        snap = {
            "model": {k: torch.tensor(v) for k, v in f.store.items()},
            "optimizer": {"state": {}},
            "epoch": 3,
            "min_loss": 0.5,
        }
        path = tmp_path / "model_snap.t7"
        torch.save(snap, path)
        report = load_torch_checkpoint(mine, path)
        assert not report.unused
        np.testing.assert_allclose(
            np.asarray(mine.convs[0].kernel.value), f.store["conv1.weight"][..., 0].T, atol=0
        )

    def test_strict_rejects_unknown_keys(self):
        mine = models.PointNet(emb_dims=32, use_bn=False, rngs=nnx.Rngs(0))
        f = _FakeSD(4)
        for i in range(5):
            f.conv(f"conv{i+1}", mine.convs[i], ndim=3, bias=True)
        f.store["mystery.weight"] = np.zeros((4, 4), np.float32)
        with pytest.raises(KeyError):
            import_torch_state_dict(mine, f.store)
        report = import_torch_state_dict(mine, f.store, strict=False)
        assert report.unused == ["mystery.weight"]

    def test_shape_mismatch_raises(self):
        mine = models.PointNet(emb_dims=32, use_bn=False, rngs=nnx.Rngs(0))
        f = _FakeSD(5)
        for i in range(5):
            f.conv(f"conv{i+1}", mine.convs[i], ndim=3, bias=True)
        f.store["conv1.weight"] = np.zeros((7, 3, 1), np.float32)
        with pytest.raises(ValueError):
            import_torch_state_dict(mine, f.store)


class TestConvertCheckpoint:
    def test_torch_file_to_orbax_round_trip(self, tmp_path):
        """tools/convert_checkpoint.py: torch .t7 state_dict -> converted
        orbax artifact -> identical logits (VERDICT r2 missing #3)."""
        torch = pytest.importorskip("torch")
        import sys

        sys.path.insert(0, "/root")
        ref_models = pytest.importorskip("reference.models")
        import argparse

        import jax.numpy as jnp

        from tools.convert_checkpoint import convert

        tref = ref_models.Classifier(
            feature_model=ref_models.PointNet(emb_dims=64, use_bn=True, global_feat=True)
        )
        tref.eval()
        ckpt_file = tmp_path / "model.t7"
        torch.save(tref.state_dict(), ckpt_file)

        # same construction as build_model("pointnet") (Classifier wrap)
        args = argparse.Namespace(emb_dims=64, nearest_neighbors=20, num_points=64)
        convert("pointnet", str(ckpt_file), "conv_rt", str(tmp_path / "ck"), args)

        # fresh model + Trainer.load of the converted artifact
        from examples.train import build_model
        from learning3d_tpu.train import TrainConfig, Trainer

        fresh = build_model("pointnet", args, nnx.Rngs(7))
        tr = Trainer(
            TrainConfig(exp_name="conv_rt", task="classification", ckpt_dir=str(tmp_path / "ck")),
            fresh,
            loss_fn=lambda *a, **k: (0.0, {}),
        )
        tr.load("converted")
        fresh.eval()

        torch.manual_seed(3)
        x = torch.randn(2, 64, 3)
        want = tref(x).detach().numpy()  # (B, num_classes)
        got = np.asarray(fresh(jnp.asarray(x.numpy())))
        np.testing.assert_allclose(got, want, atol=2e-5)
