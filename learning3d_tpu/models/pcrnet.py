"""iPCRNet — iterative single-pass-alignment registration.

Capability parity with reference models/pcrnet.py:9-65: pooled PointNet
features of template + current source -> MLP -> 7-D pose (quaternion +
translation), composed over ``max_iteration`` refinement steps. The
iteration count is static, so the loop unrolls into one XLA program.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import nnx

from learning3d_tpu.models.pooling import Pooling
from learning3d_tpu.ops import quaternion as quat
from learning3d_tpu.ops import se3
from learning3d_tpu.utils.layers import to_bnc, validate_input_shape


class iPCRNet(nnx.Module):
    def __init__(
        self,
        feature_model: nnx.Module,
        droput: float = 0.0,  # (sic) reference keeps this spelling
        pooling: str = "max",
        input_shape: str = "bnc",
        *,
        dtype=None,
        rngs: nnx.Rngs,
    ):
        self.input_shape = validate_input_shape(input_shape)
        self.feature_model = feature_model
        self.pooling = Pooling(pooling)
        # serving-time default for __call__'s max_iteration (reference
        # iPCRNet forward defaults to 8, pcrnet.py; evaluate.py
        # --num_iters overrides this attr without retraining)
        self.default_iterations = 8
        emb = feature_model.emb_dims
        dims = [emb * 2, 1024, 1024, 512, 512, 256]
        self.linears = nnx.List([
            nnx.Linear(i, o, dtype=dtype, rngs=rngs) for i, o in zip(dims[:-1], dims[1:])
        ])
        self.dropout = nnx.Dropout(droput, rngs=rngs) if droput > 0.0 else None
        self.head = nnx.Linear(256, 7, dtype=dtype, rngs=rngs)

    def _pool_feat(self, points):
        if self.pooling.pool_type == "max" and hasattr(self.feature_model, "pooled_features"):
            return self.feature_model.pooled_features(points)
        return self.pooling(self.feature_model(points))

    def _spam(self, template_features, source, est_R, est_t):
        source_features = self._pool_feat(source)
        y = jnp.concatenate([template_features, source_features], axis=-1)
        for lin in self.linears:
            y = jax.nn.relu(lin(y))
        if self.dropout is not None:
            y = self.dropout(y)
        pose = self.head(y)  # (B, 7)
        q = quat.qnormalize(pose[:, :4])
        t = pose[:, 4:]
        R_step = quat.quat2mat(q)
        # Compose: new = step ∘ old (reference models/pcrnet.py:42-46).
        est_t = jnp.einsum("bij,bj->bi", R_step, est_t) + t
        est_R = R_step @ est_R
        source = jnp.einsum("bij,bnj->bni", R_step, source) + t[:, None, :]
        return est_R, est_t, source, source_features

    def __call__(self, template, source, max_iteration: int | None = None):
        if max_iteration is None:
            max_iteration = self.default_iterations
        template = to_bnc(template, self.input_shape)
        source = to_bnc(source, self.input_shape)
        B = template.shape[0]
        est_R = jnp.broadcast_to(jnp.eye(3, dtype=template.dtype), (B, 3, 3))
        est_t = jnp.zeros((B, 3), dtype=template.dtype)
        template_features = self._pool_feat(template)

        source_features = None
        for _ in range(max_iteration):
            est_R, est_t, source, source_features = self._spam(
                template_features, source, est_R, est_t
            )

        return {
            "est_R": est_R,  # source -> template
            "est_t": est_t,
            "est_T": se3.from_rt(est_R, est_t),
            "r": template_features - source_features,
            "transformed_source": source,
        }
