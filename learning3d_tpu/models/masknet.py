"""MaskNet — inlier mask estimation.

Capability parity with reference models/masknet.py:7-77: shared PointNet
on both clouds, pooled source global feature tiled over template point
features, 1x1-conv mask MLP with sigmoid. Point selection: 'topk' keeps
the top-N_source scoring template points (static shape — the jittable
path, used during training by the reference too); 'threshold' (ragged,
B=1 evaluation) is the host-side helper ``select_by_threshold``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import nnx

from learning3d_tpu.models.pooling import Pooling
from learning3d_tpu.ops.geometry import index_points
from learning3d_tpu.utils.layers import to_bnc, validate_input_shape


class PointNetMask(nnx.Module):
    def __init__(
        self,
        template_feature_size: int = 1024,
        source_feature_size: int = 1024,
        feature_model: nnx.Module = None,
        *,
        dtype=None,
        rngs: nnx.Rngs,
    ):
        self.feature_model = feature_model
        self.pooling = Pooling("max")
        input_size = template_feature_size + source_feature_size
        dims = [input_size, 1024, 512, 256, 128]
        self.h3 = nnx.List([
            nnx.Linear(i, o, dtype=dtype, rngs=rngs) for i, o in zip(dims[:-1], dims[1:])
        ])
        self.out = nnx.Linear(128, 1, dtype=dtype, rngs=rngs)

    def __call__(self, template, source):
        """-> per-template-point inlier probability (B, N_t)."""
        template_features = self.feature_model(template)
        if hasattr(self.feature_model, "pooled_features"):
            # only the POOLED source features are used — fused tail
            g = self.feature_model.pooled_features(source)  # (B, C)
        else:
            g = self.pooling(self.feature_model(source))
        g = jnp.broadcast_to(g[:, None, :], template_features.shape[:2] + g.shape[-1:])
        x = jnp.concatenate([template_features, g], axis=-1)
        for lin in self.h3:
            x = jax.nn.relu(lin(x))
        return jax.nn.sigmoid(self.out(x))[..., 0]  # (B, N_t)


class MaskNet(nnx.Module):
    def __init__(self, feature_model: nnx.Module, is_training: bool = True, input_shape: str = "bnc", *, dtype=None, rngs: nnx.Rngs):
        self.input_shape = validate_input_shape(input_shape)
        emb = feature_model.emb_dims
        self.maskNet = PointNetMask(
            template_feature_size=emb, source_feature_size=emb,
            feature_model=feature_model, dtype=dtype, rngs=rngs,
        )
        self.is_training = is_training

    def __call__(self, template, source, point_selection: str = "topk"):
        """-> (masked_template (B, N_s, 3), mask (B, N_t)).

        Static-shape top-N_source selection (reference masknet.py:68-77's
        training path). For the reference's ragged threshold evaluation use
        ``select_by_threshold``.
        """
        template = to_bnc(template, self.input_shape)
        source = to_bnc(source, self.input_shape)
        mask = self.maskNet(template, source)
        _, idx = jax.lax.top_k(mask, source.shape[1])
        masked_template = index_points(template, idx)
        return masked_template, mask


def select_by_threshold(template, mask, threshold=0.5):
    """Ragged threshold selection for single-pair evaluation (host-side;
    reference masknet.py:63-66). Returns numpy arrays."""
    import numpy as np

    m = np.asarray(mask[0]) > threshold
    return np.asarray(template[0])[m][None], m[None]
