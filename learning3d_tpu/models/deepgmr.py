"""DeepGMR — GMM-based closed-form registration.

Capability parity with reference models/deepgmr.py:13-165 with its latent
bugs fixed per SURVEY.md §2.1: ``d_model``/``n_clusters`` are constructor
arguments (the reference reads a free ``args`` global, deepgmr.py:111-116)
and the forward has no undefined ``igt``/``est_T`` locals (:152-163).
The per-batch ``torch.svd`` on CPU becomes a batched on-device SVD.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import nnx

from learning3d_tpu.ops import se3, transforms
from learning3d_tpu.utils.layers import to_bnc, validate_input_shape


def gmm_params(gamma, pts):
    """Soft-assignment GMM statistics (reference deepgmr.py:13-31).

    gamma (B, N, J), pts (B, N, 3) -> pi (B, J), mu (B, J, 3),
    sigma (B, J, 3, 3) (isotropic, as in the reference).
    """
    N = gamma.shape[1]
    pi = jnp.mean(gamma, axis=1)  # (B, J)
    Npi = pi * N
    mu = jnp.einsum("bnj,bnc->bjc", gamma, pts) / Npi[..., None]
    diff = pts[:, :, None, :] - mu[:, None, :, :]  # (B, N, J, 3)
    var = jnp.einsum("bnjc,bnjc,bnj->bj", diff, diff, gamma) / Npi  # (B, J)
    eye = jnp.eye(3, dtype=pts.dtype)
    return pi, mu, var[..., None, None] * eye


def gmm_register(pi_s, mu_s, mu_t, sigma_t):
    """Closed-form weighted registration between two mixtures
    (reference deepgmr.py:34-54). Returns (B, 4, 4)."""
    c_s = jnp.einsum("bj,bjc->bc", pi_s, mu_s)[:, None, :]  # (B, 1, 3)
    c_t = jnp.einsum("bj,bjc->bc", pi_s, mu_t)[:, None, :]
    sigma_inv = jnp.linalg.inv(sigma_t.astype(jnp.float32))
    Ms = jnp.einsum(
        "bjc,bjd,bjde->bce",
        pi_s[..., None] * (mu_s - c_s),
        (mu_t - c_t),
        sigma_inv,
    )  # (B, 3, 3)
    from learning3d_tpu.utils.svd3 import kabsch_rotation_3x3

    R = kabsch_rotation_3x3(Ms.astype(jnp.float32))
    t = c_t[:, 0, :] - jnp.einsum("bij,bj->bi", R, c_s[:, 0, :])
    return se3.from_rt(R, t)


class Conv1dBNReLU(nnx.Module):
    def __init__(self, i, o, *, dtype=None, rngs: nnx.Rngs):
        self.lin = nnx.Linear(i, o, use_bias=False, dtype=dtype, rngs=rngs)
        self.bn = nnx.BatchNorm(o, use_running_average=False, momentum=0.9, dtype=dtype, rngs=rngs)

    def __call__(self, x):
        return jax.nn.relu(self.bn(self.lin(x)))


class TNet(nnx.Module):
    """6-param Gram-Schmidt rotation regressor (reference deepgmr.py:73-98)."""

    def __init__(self, *, dtype=None, rngs: nnx.Rngs):
        self.encoder = nnx.List([
            Conv1dBNReLU(3, 64, dtype=dtype, rngs=rngs),
            Conv1dBNReLU(64, 128, dtype=dtype, rngs=rngs),
            Conv1dBNReLU(128, 256, dtype=dtype, rngs=rngs),
        ])
        self.fc1 = Conv1dBNReLU(256, 128, dtype=dtype, rngs=rngs)
        self.fc2 = Conv1dBNReLU(128, 64, dtype=dtype, rngs=rngs)
        self.head = nnx.Linear(64, 6, dtype=dtype, rngs=rngs)

    @staticmethod
    def f2R(f):
        def normalize(v):
            return v / jnp.maximum(jnp.linalg.norm(v, axis=-1, keepdims=True), 1e-8)

        r1 = normalize(f[:, :3])
        proj = jnp.sum(r1 * f[:, 3:], axis=-1, keepdims=True)
        r2 = normalize(f[:, 3:] - proj * r1)
        r3 = jnp.cross(r1, r2)
        return jnp.stack([r1, r2, r3], axis=2)  # rows as columns, (B, 3, 3)

    def __call__(self, pts):
        """pts (B, N, 3) -> rotated pts. (BatchNorm on (B, C) vectors is
        torch-BatchNorm1d-equivalent: nnx reduces over batch only.)"""
        f = pts
        for blk in self.encoder:
            f = blk(f)
        f = jnp.max(f, axis=1)  # (B, 256)
        f = self.head(self.fc2(self.fc1(f)))
        R = self.f2R(f)
        return jnp.einsum("bij,bnj->bni", R, pts)


class ClusterNet(nnx.Module):
    """DeepGMR's backbone: PointNet with global-local concat decoder ->
    per-point cluster logits (reference deepgmr.py:101-124)."""

    def __init__(
        self,
        use_rri: bool = True,
        use_tnet: bool = False,
        nearest_neighbors: int = 20,
        d_model: int = 1024,
        n_clusters: int = 16,
        *,
        dtype=None,
        rngs: nnx.Rngs,
    ):
        self.use_tnet = use_tnet
        self.tnet = TNet(dtype=dtype, rngs=rngs) if use_tnet else None
        d_input = nearest_neighbors * 4 if use_rri else 3
        self.encoder = nnx.List([
            Conv1dBNReLU(d_input, 64, dtype=dtype, rngs=rngs),
            Conv1dBNReLU(64, 128, dtype=dtype, rngs=rngs),
            Conv1dBNReLU(128, 256, dtype=dtype, rngs=rngs),
            Conv1dBNReLU(256, d_model, dtype=dtype, rngs=rngs),
        ])
        self.decoder = nnx.List([
            Conv1dBNReLU(d_model * 2, 512, dtype=dtype, rngs=rngs),
            Conv1dBNReLU(512, 256, dtype=dtype, rngs=rngs),
            Conv1dBNReLU(256, 128, dtype=dtype, rngs=rngs),
        ])
        self.head = nnx.Linear(128, n_clusters, dtype=dtype, rngs=rngs)

    def __call__(self, feats):
        """feats (B, N, d_input) -> cluster logits (B, N, J)."""
        x = self.tnet(feats) if self.use_tnet else feats
        for blk in self.encoder:
            x = blk(x)
        # Fusion fence: XLA's TPU fusion pass CHECK-crashes when it fuses
        # this max-pool + broadcast-concat with the surrounding matmuls
        # (fusion_util.cc TransformWindow) at some (B, N) shapes — same
        # workaround as models/pcn.py:58-61.
        x = jax.lax.optimization_barrier(x)
        g = jnp.max(x, axis=1, keepdims=True)
        y = jnp.concatenate([x, jnp.broadcast_to(g, x.shape)], axis=-1)
        for blk in self.decoder:
            y = blk(y)
        return self.head(y)


class DeepGMR(nnx.Module):
    def __init__(
        self,
        use_rri: bool = True,
        feature_model: nnx.Module | None = None,
        nearest_neighbors: int = 20,
        d_model: int = 1024,
        n_clusters: int = 16,
        input_shape: str = "bnc",
        *,
        dtype=None,
        rngs: nnx.Rngs,
    ):
        self.input_shape = validate_input_shape(input_shape)
        self.use_rri = use_rri
        self.nearest_neighbors = nearest_neighbors
        self.backbone = feature_model or ClusterNet(
            use_rri=use_rri,
            nearest_neighbors=nearest_neighbors,
            d_model=d_model,
            n_clusters=n_clusters,
            dtype=dtype,
            rngs=rngs,
        )

    def __call__(self, template, source):
        """Clouds are (B, N, 3) or (B, N, 3 + 4k) with RRI features
        appended (the dataloader contract, dataloaders.py:317-321)."""
        template = to_bnc(template, self.input_shape)
        source = to_bnc(source, self.input_shape)
        if self.use_rri and template.shape[-1] == 3:
            # TPU-native path: RRI computed on device INSIDE the jitted
            # step, batched over B. The reference precomputes RRI per
            # item in the DataLoader (dataloaders.py:317-321); on a
            # tunneled accelerator that host path costs a device round
            # trip per cloud and serializes with compute. Same features
            # (ops.geometry.get_rri, centered like the host contract).
            from learning3d_tpu.ops.geometry import get_rri

            k = self.nearest_neighbors
            template = jnp.concatenate(
                [template, get_rri(template - template.mean(1, keepdims=True), k)], -1
            )
            source = jnp.concatenate(
                [source, get_rri(source - source.mean(1, keepdims=True), k)], -1
            )
        if self.use_rri:
            template_xyz, template_feats = template[..., :3], template[..., 3:]
            source_xyz, source_feats = source[..., :3], source[..., 3:]
        else:
            template_xyz = source_xyz = None
            template_xyz, source_xyz = template, source
            template_feats = template - jnp.mean(template, axis=1, keepdims=True)
            source_feats = source - jnp.mean(source, axis=1, keepdims=True)

        template_gamma = jax.nn.softmax(self.backbone(template_feats), axis=-1)
        source_gamma = jax.nn.softmax(self.backbone(source_feats), axis=-1)
        t_pi, t_mu, t_sigma = gmm_params(template_gamma, template_xyz)
        s_pi, s_mu, s_sigma = gmm_params(source_gamma, source_xyz)

        est_T_inverse = gmm_register(t_pi, t_mu, s_mu, s_sigma)
        est_T = gmm_register(s_pi, s_mu, t_mu, t_sigma)  # source -> template

        transformed_source = se3.transform(est_T, source_xyz)
        return {
            "est_R": est_T[:, :3, :3],
            "est_t": est_T[:, :3, 3],
            "est_R_inverse": est_T_inverse[:, :3, :3],
            "est_t_inverse": est_T_inverse[:, :3, 3],
            "est_T": est_T,
            "est_T_inverse": est_T_inverse,
            "r": template_feats - source_feats,
            "transformed_source": transformed_source,
        }
