"""RPMNet — robust point matching registration.

Capability parity with reference models/rpmnet.py:14-351: annealing
parameter prediction (alpha, beta), PPFNet features, hybrid affinity,
slack-padded log-domain Sinkhorn, weighted Kabsch, iterated with a
gradient cut between iterations (transform detached before re-transforming
the source, reference :326).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import nnx

from learning3d_tpu.models.ppfnet import PPFNet, _ConvGN
from learning3d_tpu.ops.geometry import square_distance
from learning3d_tpu.utils.layers import to_bnc, validate_input_shape
from learning3d_tpu.utils.rigid import se3_transform_34, sinkhorn_log, weighted_kabsch

_EPS = 1e-5


class ParameterPredictionNet(nnx.Module):
    """Predicts the annealing parameters (beta, alpha) from both clouds
    (reference rpmnet.py:14-87). Clouds are tagged with a 0/1 indicator
    channel, concatenated along points, PointNet-pooled."""

    def __init__(self, weights_dim=(0,), *, dtype=None, rngs: nnx.Rngs):
        import numpy as np

        self.weights_dim = tuple(weights_dim)
        extra = int(np.prod(self.weights_dim)) if self.weights_dim else 0
        self.prepool = nnx.List([
            _ConvGN(4, 64, 8, dtype=dtype, rngs=rngs),
            _ConvGN(64, 64, 8, dtype=dtype, rngs=rngs),
            _ConvGN(64, 64, 8, dtype=dtype, rngs=rngs),
            _ConvGN(64, 128, 8, dtype=dtype, rngs=rngs),
            _ConvGN(128, 1024, 16, dtype=dtype, rngs=rngs),
        ])
        self.post1 = _ConvGN(1024, 512, 16, dtype=dtype, rngs=rngs)
        self.post2 = _ConvGN(512, 256, 16, dtype=dtype, rngs=rngs)
        self.head = nnx.Linear(256, 2 + extra, dtype=dtype, rngs=rngs)

    def __call__(self, src, ref):
        src_pad = jnp.pad(src, ((0, 0), (0, 0), (0, 1)), constant_values=0.0)
        ref_pad = jnp.pad(ref, ((0, 0), (0, 0), (0, 1)), constant_values=1.0)
        x = jnp.concatenate([src_pad, ref_pad], axis=1)  # (B, J+K, 4)
        for blk in self.prepool:
            x = blk(x)
        pooled = jnp.max(x, axis=1)  # (B, 1024)
        raw = self.head(self.post2(self.post1(pooled)))
        beta = jax.nn.softplus(raw[:, 0])
        alpha = jax.nn.softplus(raw[:, 1])
        return beta, alpha


def match_features(feat_src, feat_ref):
    """Squared-L2 feature distance matrix (reference rpmnet.py:130-154)."""
    return square_distance(feat_src, feat_ref)


class RPMNet(nnx.Module):
    def __init__(self, feature_model: nnx.Module | None = None, input_shape: str = "bnc", *, dtype=None, rngs: nnx.Rngs):
        self.input_shape = validate_input_shape(input_shape)
        self.add_slack = True
        self.num_sk_iter = 5
        # default for __call__'s max_iterations, used by BOTH the training
        # task (train/tasks.py::rpmnet) and serving. 2 is a deliberate
        # deviation from the reference forward's 1-iteration default
        # (rpmnet.py:298): the 1-iteration recipe diverged here and the
        # 2-iteration runs converged (docs/runs/r4b_rpmnet.log). The
        # iterations share weights; evaluate.py --num_iters overrides this
        # attr for refinement-at-eval without retraining.
        self.default_iterations = 2
        self.weights_net = ParameterPredictionNet((0,), dtype=dtype, rngs=rngs)
        self.feat_extractor = feature_model or PPFNet(dtype=dtype, rngs=rngs)

    @staticmethod
    def compute_affinity(beta, feat_distance, alpha):
        return -beta[:, None, None] * (feat_distance - alpha[:, None, None])

    @staticmethod
    def split_normals(data):
        if data.shape[2] == 6:
            return data[..., :3], data[..., 3:6]
        return data, jnp.zeros_like(data)

    def _spam(self, xyz_template, norm_template, xyz_source, norm_source, feat_template):
        beta, alpha = self.weights_net(xyz_source, xyz_template)
        feat_source = self.feat_extractor(xyz_source, norm_source)
        feat_distance = match_features(feat_source, feat_template)
        affinity = self.compute_affinity(beta, feat_distance, alpha)
        log_perm = sinkhorn_log(affinity, n_iters=self.num_sk_iter, slack=self.add_slack)
        perm = jnp.exp(log_perm)  # (B, J, K)
        weighted_template = jnp.einsum("bjk,bkc->bjc", perm, xyz_template) / (
            jnp.sum(perm, axis=2, keepdims=True) + _EPS
        )
        return weighted_template, perm, affinity, beta, alpha, feat_template - feat_source

    def __call__(self, template, source, max_iterations: int | None = None):
        if max_iterations is None:
            max_iterations = self.default_iterations
        template = to_bnc(template, self.input_shape)
        source = to_bnc(source, self.input_shape)
        xyz_template, norm_template = self.split_normals(template)
        xyz_source, norm_source = self.split_normals(source)
        xyz_source_t, norm_source_t = xyz_source, norm_source

        transforms_hist, perms, gammas, weighted_hist, betas, alphas = [], [], [], [], [], []
        transform = None
        r = None
        # the template never moves: extract its features once outside the
        # loop (the reference re-extracts per iteration, rpmnet.py:283-296;
        # identical math — and explicit hoisting doesn't rely on XLA
        # CSE-ing the Pallas grouping kernel inside PPFNet)
        feat_template = self.feat_extractor(xyz_template, norm_template)
        for _ in range(max_iterations):
            weighted_template, perm, affinity, beta, alpha, r = self._spam(
                xyz_template, norm_template, xyz_source_t, norm_source_t, feat_template
            )
            transform = weighted_kabsch(
                xyz_source, weighted_template, jnp.sum(perm, axis=2)
            )  # (B, 3, 4), always from the ORIGINAL source
            cut = jax.lax.stop_gradient(transform)  # grad cut between iterations
            xyz_source_t = se3_transform_34(cut, xyz_source)
            norm_source_t = jnp.einsum("bij,bnj->bni", cut[:, :, :3], norm_source)

            transforms_hist.append(transform)
            perms.append(perm)
            gammas.append(jnp.exp(affinity))
            weighted_hist.append(weighted_template)
            betas.append(beta)
            alphas.append(alpha)

        R = transform[:, :3, :3]
        t = transform[:, :3, 3]
        bottom = jnp.zeros((R.shape[0], 1, 4), dtype=R.dtype).at[:, 0, 3].set(1.0)
        est_T = jnp.concatenate([transform, bottom], axis=1)
        transformed_source = se3_transform_34(transform, source[..., :3])
        return {
            "est_R": R,
            "est_t": t,
            "est_T": est_T,
            "r": r,  # feature residual (the reference's train script consumes it)
            "transformed_source": transformed_source,
            "perm_matrices_init": gammas,
            "perm_matrices": perms,
            "weighted_template": weighted_hist,
            "beta": jnp.stack(betas),
            "alpha": jnp.stack(alphas),
            "transforms": transforms_hist,
        }
