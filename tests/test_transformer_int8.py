"""Fused int8 transformer-layer kernel vs the composed module path.

The module path (AnnotatedLayerNorm + QuantMHA + QuantFF composed exactly
as transformer._EncoderLayer/_DecoderLayer) is the kernel's
identical-math oracle; kernels/transformer_int8 must reproduce it to f32
rounding. Run in Pallas interpret mode on the CPU mesh; the on-TPU
equivalence of the compiled kernel is checked by
tools/check_tpu_kernels.py.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import nnx

from learning3d_tpu.quant import (
    QuantDecoderLayerFused,
    QuantEncoderLayerFused,
    quantize_transformer_layer as _quantize_blocks,
)
from learning3d_tpu.utils.transformer import _DecoderLayer, _EncoderLayer


def _assert_tieflip_close(got, want, atol=2e-4, max_abs=0.08, frac=0.01):
    """Parity up to int8 rounding tie-flips: a compiled/interpreted kernel
    can differ from the module path by 1-ULP FMA scheduling in the f32
    residual stream, which flips round(x/s) at exact .5 ties and shows up
    as SPARSE O(quant-step) diffs. Identical math is pinned bit-exactly by
    the *_reference tests; here we require the diff profile of tie-flips
    only: almost all elements at f32 rounding, few and bounded outliers."""
    got = np.asarray(got, np.float64)
    want = np.asarray(want, np.float64)
    d = np.abs(got - want)
    assert d.max() < max_abs, d.max()
    assert (d > atol).mean() < frac, (d > atol).mean()


@pytest.mark.parametrize("int8_pv", [True, False])
def test_encoder_layer_fused_matches_module_path(int8_pv):
    from learning3d_tpu.kernels.transformer_int8 import (
        encoder_layer_int8,
        encoder_layer_int8_reference,
    )

    rngs = nnx.Rngs(0)
    layer = _EncoderLayer(256, 2, 512, rngs=rngs)
    x = jnp.asarray(
        np.random.default_rng(1).standard_normal((2, 256, 256)), jnp.float32
    )
    layer = _quantize_blocks(layer, lambda l: l(x), int8_pv)
    wrapper = QuantEncoderLayerFused(layer, int8_pv=int8_pv)

    want = wrapper.inner(x)  # composed module path (CPU oracle)
    # identical math: the plain-jnp kernel body is BIT-EXACT vs the module
    ref = encoder_layer_int8_reference(
        x, wrapper._weights(), wrapper.scales, n_heads=2, tile_n=128,
        int8_pv=int8_pv,
    )
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(want))
    # the pallas execution may differ by FMA-induced int8 tie-flips only
    got = encoder_layer_int8(
        x, wrapper._weights(), wrapper.scales, n_heads=2, tile_n=128,
        int8_pv=int8_pv, interpret=True,
    )
    _assert_tieflip_close(got, want)


@pytest.mark.parametrize("int8_pv", [True, False])
def test_decoder_layer_fused_matches_module_path(int8_pv):
    from learning3d_tpu.kernels.transformer_int8 import (
        decoder_layer_int8,
        decoder_layer_int8_reference,
    )

    rngs = nnx.Rngs(0)
    layer = _DecoderLayer(256, 2, 512, rngs=rngs)
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((2, 256, 256)), jnp.float32)
    mem = jnp.asarray(rng.standard_normal((2, 256, 256)), jnp.float32)
    layer = _quantize_blocks(layer, lambda l: l(x, mem), int8_pv)
    wrapper = QuantDecoderLayerFused(layer, int8_pv=int8_pv)

    want = wrapper.inner(x, mem)
    ref = decoder_layer_int8_reference(
        x, mem, wrapper._weights(), wrapper.scales, n_heads=2, tile_n=128,
        int8_pv=int8_pv,
    )
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(want))
    got = decoder_layer_int8(
        x, mem, wrapper._weights(), wrapper.scales, n_heads=2, tile_n=128,
        int8_pv=int8_pv, interpret=True,
    )
    _assert_tieflip_close(got, want)


def test_wrapper_falls_back_off_tpu():
    """On the CPU mesh the wrapper must route through the module path
    (identical object), so quantize_dcp stays correct everywhere."""
    rngs = nnx.Rngs(3)
    layer = _EncoderLayer(256, 2, 512, rngs=rngs)
    x = jnp.asarray(
        np.random.default_rng(4).standard_normal((1, 256, 256)), jnp.float32
    )
    layer = _quantize_blocks(layer, lambda l: l(x), True)
    wrapper = QuantEncoderLayerFused(layer, int8_pv=True)
    np.testing.assert_allclose(
        np.asarray(wrapper(x)), np.asarray(wrapper.inner(x)), atol=0
    )


def test_quantize_dcp_pointer_fused_wrappers_installed():
    """quantize_dcp_pointer(fused_layers=True) must wrap every pointer
    layer and still run end-to-end (module fallback on CPU), matching the
    unfused clone's output exactly."""
    from learning3d_tpu import models
    from learning3d_tpu.quant import quantize_dcp_pointer

    rngs = nnx.Rngs(0)
    model = models.DCP(models.DGCNN(emb_dims=512, rngs=rngs), rngs=rngs)
    rng = np.random.default_rng(5)
    t = jnp.asarray(rng.standard_normal((2, 256, 3)), jnp.float32)
    s = jnp.asarray(rng.standard_normal((2, 256, 3)), jnp.float32)
    qf = quantize_dcp_pointer(model, t, s, fused_layers=True)
    qm = quantize_dcp_pointer(model, t, s, fused_layers=False)
    assert all(isinstance(l, QuantEncoderLayerFused) for l in qf.pointer.enc_layers)
    assert all(isinstance(l, QuantDecoderLayerFused) for l in qf.pointer.dec_layers)
    out_f = qf(t, s)
    out_m = qm(t, s)
    np.testing.assert_allclose(
        np.asarray(out_f["est_T"]), np.asarray(out_m["est_T"]), atol=1e-6
    )
