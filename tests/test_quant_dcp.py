"""int8 DCP pointer quantization (quant.quantize_dcp_pointer): module
surgery correctness, jit-ability of the quantized clone, output
closeness to the float model, and the int8 attention-core math."""

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx

from learning3d_tpu.models import DCP, DGCNN
from learning3d_tpu.quant import QuantFF, QuantMHA, quantize_dcp_pointer


class TestQuantDCP:
    def test_pointer_surgery_and_closeness(self):
        model = DCP(DGCNN(emb_dims=128, rngs=nnx.Rngs(0)), rngs=nnx.Rngs(1))
        model.eval()
        t = jax.random.normal(jax.random.PRNGKey(2), (2, 128, 3))
        s = jax.random.normal(jax.random.PRNGKey(3), (2, 128, 3))
        ref = model(t, s)
        qmodel = quantize_dcp_pointer(model, t, s)

        # every pointer MHA/FF block was replaced by its int8 serving twin
        for layer in list(qmodel.pointer.enc_layers):
            assert isinstance(layer.self_attn, QuantMHA)
            assert isinstance(layer.ff, QuantFF)
        for layer in list(qmodel.pointer.dec_layers):
            assert isinstance(layer.self_attn, QuantMHA)
            assert isinstance(layer.cross_attn, QuantMHA)
            assert isinstance(layer.ff, QuantFF)

        # the original model is untouched (surgery on a clone)
        assert not isinstance(model.pointer.enc_layers[0].self_attn, QuantMHA)

        # jit-able through split/merge
        gd, st = nnx.split(qmodel)

        @jax.jit
        def fwd(st, t, s):
            return nnx.merge(gd, st)(t, s)["est_R"]

        # eager vs jit: XLA fuses the requant epilogues differently, so a
        # borderline round() can flip an int8 level — sub-1e-3 rotation
        # entries, not bit-exactness, is the contract here
        qR = np.asarray(fwd(st, t, s))
        np.testing.assert_allclose(
            np.asarray(qmodel(t, s)["est_R"]), qR, atol=2e-3
        )

        # int8 pointer stays close to the float model: rotations within a
        # few degrees on an untrained model (trained-model registration
        # deltas are recorded in docs/runs by the campaign eval)
        dR = np.asarray(ref["est_R"]) @ np.swapaxes(qR, -1, -2)
        tr = np.clip((np.trace(dR, axis1=-2, axis2=-1) - 1) / 2, -1, 1)
        deg = np.degrees(np.arccos(tr))
        assert deg.max() < 5.0, deg

    def test_quant_mha_matches_float_mha(self):
        """QuantMHA output tracks the float MultiHeadedAttention closely
        (self- and cross-attention paths), and the int8 attention-core
        oracle is exact against a hand-rolled requant chain."""
        from learning3d_tpu.quant import _AmaxRecorder

        from learning3d_tpu.utils.transformer import MultiHeadedAttention

        d, h, B, N, M = 128, 4, 2, 64, 96
        mha = MultiHeadedAttention(h, d, rngs=nnx.Rngs(0))
        x = jax.random.normal(jax.random.PRNGKey(1), (B, N, d)) * 0.5
        mem = jax.random.normal(jax.random.PRNGKey(2), (B, M, d)) * 0.5

        for args in [(x, x, x), (x, mem, mem)]:
            recs = {a: _AmaxRecorder(getattr(mha, a)) for a in ("wq", "wk", "wv", "wo")}
            for a, r in recs.items():
                setattr(mha, a, r)
            ref = mha(*args)
            for a, r in recs.items():
                setattr(mha, a, r.inner)
            qmha = QuantMHA(mha, recs["wq"], recs["wk"], recs["wv"], recs["wo"])
            got = qmha(*args)
            err = float(jnp.max(jnp.abs(got.astype(jnp.float32) - ref.astype(jnp.float32))))
            scale = float(jnp.max(jnp.abs(ref.astype(jnp.float32)))) + 1e-9
            assert err / scale < 0.1, (err, scale)

    def test_attention_int8_oracle_math(self):
        """attention_int8 (CPU -> oracle path) equals the reference
        requant chain computed step by step in numpy."""
        from learning3d_tpu.kernels.attention import attention_int8

        B, H, N, D = 1, 2, 32, 128
        rng = np.random.default_rng(0)
        q = rng.integers(-127, 128, (B, H, N, D)).astype(np.int8)
        k = rng.integers(-127, 128, (B, H, N, D)).astype(np.int8)
        v = rng.integers(-127, 128, (B, H, N, D)).astype(np.int8)
        s_q, s_k, s_v = 0.01, 0.02, 0.03
        out = np.asarray(
            attention_int8(
                jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), s_q, s_k, s_v,
                int8_pv=True,
            )
        ).astype(np.float32)

        s = (q.astype(np.int32) @ k.astype(np.int32).transpose(0, 1, 3, 2)).astype(
            np.float32
        ) * (s_q * s_k / np.sqrt(D))
        p = np.exp(s - s.max(-1, keepdims=True))
        l = p.sum(-1, keepdims=True)
        p_q = np.round(p / p.max(-1, keepdims=True) * 127)  # rowmax == 1
        o = (p_q.astype(np.int32) @ v.astype(np.int32)).astype(np.float32)
        ref = o * (s_v / 127.0) / l
        np.testing.assert_allclose(out, ref.astype(np.float32), rtol=0.02, atol=0.02)

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
