"""int8 PTQ path (learning3d_tpu/quant.py): numerical closeness to the
f32 forward and — the claim that matters — accuracy parity of a TRAINED
classifier after quantization."""

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx

from learning3d_tpu import models
from learning3d_tpu.quant import quant_forward, quantize_pointnet_classifier


def _random_eval_model(emb=128, num_classes=10, seed=0):
    pn = models.PointNet(emb_dims=emb, use_bn=True, rngs=nnx.Rngs(seed))
    model = models.Classifier(pn, num_classes=num_classes, rngs=nnx.Rngs(seed + 1))
    model.eval()
    # non-trivial running stats so the BN fold is actually exercised
    for bn in list(pn.bns) + [model.bn1, model.bn2]:
        if bn is None:
            continue
        c = bn.mean[...].shape[0]
        bn.mean[...] = 0.05 * jnp.arange(c, dtype=jnp.float32) / c
        bn.var[...] = 1.0 + 0.3 * jnp.arange(c, dtype=jnp.float32) / c
    return model


class TestQuantPointNet:
    def test_logits_close_to_f32(self):
        model = _random_eval_model()
        x = jax.random.normal(jax.random.PRNGKey(2), (8, 256, 3))
        qm = quantize_pointnet_classifier(model, x)
        q_logits = np.asarray(quant_forward(qm, x))
        f_logits = np.asarray(model(x), np.float32)
        # int8 static-scale path on an UNTRAINED model (worst case: logits
        # are small and near-uniform, so relative error is inflated —
        # the trained-parity test below is the real accuracy claim)
        scale = np.abs(f_logits).mean()
        rel = np.abs(q_logits - f_logits).mean() / scale
        assert rel < 0.15, rel

    def test_fused_int8_kernel_matches_xla_path(self):
        """The Pallas VMEM-resident int8 kernel (pointnet_pooled_int8)
        computes the same quantized chain as the XLA QuantLinear path."""
        from jax.experimental.pallas import tpu as pltpu

        from learning3d_tpu.quant import make_fused_quant_forward

        model = _random_eval_model(emb=128)
        x = jax.random.normal(jax.random.PRNGKey(4), (3, 256, 3))
        qm = quantize_pointnet_classifier(model, x)
        want = np.asarray(quant_forward(qm, x))
        with pltpu.force_tpu_interpret_mode():
            got = np.asarray(make_fused_quant_forward(qm)(x))
        # same int8 dots; only the stage-1 bf16 vs interpret-f32 dot and
        # x*(1/s) vs x/s requant rounding can differ by 1 ulp
        scale = np.abs(want).mean()
        assert np.abs(got - want).mean() / scale < 0.02

    def test_trained_accuracy_parity(self):
        """Train a small classifier to high accuracy, quantize, and pin
        the PTQ accuracy drop — the evidence behind using the int8 path
        as the serving configuration (bench.py)."""
        from learning3d_tpu.data import ClassificationData, SyntheticModelNet40
        from learning3d_tpu.train import TrainConfig, Trainer

        ds = ClassificationData(SyntheticModelNet40(num_points=64, size=48, num_classes=4))
        cfg = TrainConfig(
            task="classification", batch_size=8, epochs=8, lr=3e-3,
            ckpt_dir="/tmp/l3d_test_ckpt", exp_name="quant_smoke",
        )
        pn = models.PointNet(emb_dims=96, use_bn=True, rngs=nnx.Rngs(0))
        model = models.Classifier(pn, num_classes=4, rngs=nnx.Rngs(1))
        tr = Trainer(cfg, model)
        tr.fit(ds, test_data=None, epochs=8)
        model.eval()

        xs, ys = [], []
        for i in range(len(ds)):
            pts, lbl = ds[i]
            xs.append(np.asarray(pts))
            ys.append(lbl)
        x = jnp.asarray(np.stack(xs))
        y = np.asarray(ys)

        f_logits = np.asarray(model(x), np.float32)
        qm = quantize_pointnet_classifier(model, x)
        q_logits = np.asarray(quant_forward(qm, x))

        f_acc = float((f_logits.argmax(-1) == y).mean())
        q_acc = float((q_logits.argmax(-1) == y).mean())
        agree = float((f_logits.argmax(-1) == q_logits.argmax(-1)).mean())
        assert f_acc > 0.5, f_acc  # the float model actually learned
        assert q_acc >= f_acc - 0.05, (f_acc, q_acc)  # PTQ parity
        assert agree >= 0.9, agree
