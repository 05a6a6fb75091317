"""int8 DCP pointer quantization (quant.quantize_dcp_pointer): module
surgery correctness, jit-ability of the quantized clone, and output
closeness to the float model."""

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx

from learning3d_tpu.models import DCP, DGCNN
from learning3d_tpu.quant import QuantizedLinear, quantize_dcp_pointer


class TestQuantDCP:
    def test_pointer_surgery_and_closeness(self):
        model = DCP(DGCNN(emb_dims=128, rngs=nnx.Rngs(0)), rngs=nnx.Rngs(1))
        model.eval()
        t = jax.random.normal(jax.random.PRNGKey(2), (2, 128, 3))
        s = jax.random.normal(jax.random.PRNGKey(3), (2, 128, 3))
        ref = model(t, s)
        qmodel = quantize_dcp_pointer(model, t, s)

        # every pointer Linear was replaced
        for layer in list(qmodel.pointer.enc_layers):
            for a in ("wq", "wk", "wv", "wo"):
                assert isinstance(getattr(layer.self_attn, a), QuantizedLinear)
            assert isinstance(layer.ff.w1, QuantizedLinear)
            assert isinstance(layer.ff.w2, QuantizedLinear)
        for layer in list(qmodel.pointer.dec_layers):
            for attn in (layer.self_attn, layer.cross_attn):
                for a in ("wq", "wk", "wv", "wo"):
                    assert isinstance(getattr(attn, a), QuantizedLinear)

        # the original model is untouched (surgery on a clone)
        assert not isinstance(model.pointer.enc_layers[0].self_attn.wq, QuantizedLinear)

        # jit-able through split/merge
        gd, st = nnx.split(qmodel)

        @jax.jit
        def fwd(st, t, s):
            return nnx.merge(gd, st)(t, s)["est_R"]

        qR = np.asarray(fwd(st, t, s))
        np.testing.assert_allclose(
            np.asarray(qmodel(t, s)["est_R"]), qR, atol=1e-5
        )

        # int8 pointer stays close to the float model: rotations within a
        # few degrees on an untrained model (trained-model registration
        # deltas are recorded in docs/runs by the campaign eval)
        dR = np.asarray(ref["est_R"]) @ np.swapaxes(qR, -1, -2)
        tr = np.clip((np.trace(dR, axis1=-2, axis2=-1) - 1) / 2, -1, 1)
        deg = np.degrees(np.arccos(tr))
        assert deg.max() < 5.0, deg

    def test_full_quantize_dcp(self):
        """quantize_dcp = pointer surgery + encoder int8_scales; on CPU
        the encoder guard keeps the float path (int8 encoder is
        TPU-dispatch), but the scales are installed and the clone runs."""
        from learning3d_tpu.quant import quantize_dcp

        model = DCP(DGCNN(emb_dims=128, rngs=nnx.Rngs(0)), rngs=nnx.Rngs(1))
        model.eval()
        t = jax.random.normal(jax.random.PRNGKey(4), (2, 128, 3))
        s = jax.random.normal(jax.random.PRNGKey(5), (2, 128, 3))
        qmodel = quantize_dcp(model, t, s)
        assert qmodel.emb_nn.int8_scales is not None
        assert len(qmodel.emb_nn.int8_scales) == 4
        assert model.emb_nn.int8_scales is None  # original untouched
        out = qmodel(t, s)
        assert np.isfinite(np.asarray(out["est_T"], np.float32)).all()
