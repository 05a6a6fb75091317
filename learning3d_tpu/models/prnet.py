"""PRNet — partial-to-partial registration with keypoints and Gumbel/softmax
correspondence sampling.

Capability parity with reference models/prnet.py:39-396: self-contained
LeakyReLU PointNet/DGCNN encoders (PRNet's DGCNN recomputes the dynamic
graph each stage, unlike models/dgcnn.py), KeyPointNet top-k-by-norm
selection, TemperatureNet, its own SVD head with temperature-scaled
softmax or straight-through Gumbel correspondence sampling, and the
3-iteration outer loop that composes transforms and (optionally) computes
its own discounted loss in forward. The reference's per-item CPU SVD loop
(:200-215) is a batched on-device SVD.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
from flax import nnx

from learning3d_tpu.ops import quaternion as quat
from learning3d_tpu.ops import se3, transforms
from learning3d_tpu.ops.geometry import index_points, knn
from learning3d_tpu.utils.svd import procrustes_from_correspondence
from learning3d_tpu.utils.transformer import Identity, Transformer
from learning3d_tpu.utils.layers import to_bnc, validate_input_shape


def cycle_consistency(R_ab, t_ab, R_ba, t_ba):
    """MSE(R_ab R_ba, I) + MSE(t_ab, -t_ba) (reference prnet.py:33-36)."""
    eye = jnp.eye(3, dtype=R_ab.dtype)
    return jnp.mean((R_ab @ R_ba - eye) ** 2) + jnp.mean((t_ab + t_ba) ** 2)


def _lrelu(x):
    return jax.nn.leaky_relu(x, 0.2)


class PRPointNet(nnx.Module):
    """PRNet-local PointNet: bias-free convs + BN + LeakyReLU? — the
    reference uses plain ReLU here (prnet.py:53-59)."""

    def __init__(self, emb_dims=512, *, dtype=None, rngs: nnx.Rngs):
        self.emb_dims = emb_dims
        dims = [3, 64, 64, 64, 128, emb_dims]
        self.convs = nnx.List([
            nnx.Linear(i, o, use_bias=False, dtype=dtype, rngs=rngs)
            for i, o in zip(dims[:-1], dims[1:])
        ])
        self.bns = nnx.List([
            nnx.BatchNorm(o, use_running_average=False, momentum=0.9, dtype=dtype, rngs=rngs)
            for o in dims[1:]
        ])

    def __call__(self, x):
        for conv, bn in zip(self.convs, self.bns):
            x = jax.nn.relu(bn(conv(x)))
        return x


class PRDGCNN(nnx.Module):
    """PRNet's dynamic-graph DGCNN: graph features recomputed per stage,
    LeakyReLU(0.2) (reference prnet.py:62-97)."""

    def __init__(self, emb_dims=512, k=20, approx_knn=False, *, dtype=None, rngs: nnx.Rngs):
        self.emb_dims = emb_dims
        self.k = k
        self.approx_knn = approx_knn
        dims = [(6, 64), (128, 64), (128, 128), (256, 256), (512, emb_dims)]
        self.convs = nnx.List([
            nnx.Linear(i, o, use_bias=False, dtype=dtype, rngs=rngs) for i, o in dims
        ])
        self.bns = nnx.List([
            nnx.BatchNorm(o, use_running_average=False, momentum=0.9, dtype=dtype, rngs=rngs)
            for _, o in dims
        ])

    def __call__(self, x):
        stage_outputs = []
        h = x
        for conv, bn in zip(self.convs[:4], self.bns[:4]):
            # EdgeConv on concat(neighbors, center) split into two small
            # matmuls: conv([h_j ; h_i]) == h_j @ Wn + h_i @ Wc (bias-free),
            # so the per-point products are computed once and *then*
            # gathered — k x fewer MXU FLOPs and no (B, N, k, 2C) edge
            # tensor. Identical math to
            # conv(get_graph_feature(h)) (reference prnet.py:73-97).
            idx = knn(h, self.k, approx=self.approx_knn)  # (B, N, k)
            C = h.shape[-1]
            # cast like nnx.Linear.__call__ would — using conv.kernel
            # directly bypasses the module's compute-dtype promotion and
            # would silently run every matmul (and everything downstream)
            # in f32
            # match nnx.Linear's promote_dtype semantics: with
            # dtype=None the compute dtype is the promotion of the input
            # and kernel dtypes (an f32 kernel keeps bf16 inputs in f32)
            dt = conv.dtype or jnp.promote_types(h.dtype, conv.kernel.value.dtype)
            hd = h.astype(dt)
            kern = conv.kernel.value.astype(dt)
            zn = hd @ kern[:C]  # neighbor term (B, N, Co)
            zc = hd @ kern[C:]  # center term (B, N, Co)
            if bn.use_running_average:
                # Eval: BN is the per-channel affine s*z + b and lrelu is
                # monotone, so max_j lrelu(s*(zn_j + zc) + b) = lrelu
                # applied to the per-channel max (s >= 0) / min (s < 0)
                # of the gathered neighbor features — the affine + lrelu
                # run on (B, N, Co), never on the (B, N, k, Co) edge
                # tensor. Selects the same element per channel, so the
                # values are identical to the train-shape path.
                s = (bn.scale.value * jax.lax.rsqrt(bn.var.value + bn.epsilon)).astype(zn.dtype)
                b = (bn.bias.value - bn.mean.value * bn.scale.value
                     * jax.lax.rsqrt(bn.var.value + bn.epsilon)).astype(zn.dtype)
                g = index_points(zn, idx)  # (B, N, k, Co)
                v = jnp.where(s >= 0, jnp.max(g, axis=2), jnp.min(g, axis=2))
                h = _lrelu(s * (v + zc) + b)
            else:
                z = index_points(zn, idx) + zc[:, :, None, :]
                e = _lrelu(bn(z))
                h = jnp.max(e, axis=2)  # (B, N, C)
            stage_outputs.append(h)
        cat = jnp.concatenate(stage_outputs, axis=-1)  # (B, N, 512)
        return _lrelu(self.bns[4](self.convs[4](cat)))


class TemperatureNet(nnx.Module):
    def __init__(self, emb_dims, temp_factor=100.0, *, dtype=None, rngs: nnx.Rngs):
        self.temp_factor = temp_factor
        dims = [emb_dims, 128, 128, 128]
        self.layers = nnx.List([
            nnx.Linear(i, o, dtype=dtype, rngs=rngs) for i, o in zip(dims[:-1], dims[1:])
        ])
        self.bns = nnx.List([
            nnx.BatchNorm(o, use_running_average=False, momentum=0.9, dtype=dtype, rngs=rngs)
            for o in dims[1:]
        ])
        self.head = nnx.Linear(128, 1, dtype=dtype, rngs=rngs)

    def __call__(self, src_embedding, tgt_embedding):
        residual = jnp.abs(
            jnp.mean(src_embedding, axis=1) - jnp.mean(tgt_embedding, axis=1)
        )
        x = residual
        for lin, bn in zip(self.layers, self.bns):
            x = jax.nn.relu(bn(lin(x)))
        temp = jax.nn.relu(self.head(x))
        return jnp.clip(temp, 1.0 / self.temp_factor, self.temp_factor), residual


class PRSVDHead(nnx.Module):
    """Temperature-scaled softmax / straight-through Gumbel correspondence
    + batched Procrustes (reference prnet.py:158-215)."""

    def __init__(self, emb_dims, cat_sampler="softmax", *, rngs: nnx.Rngs | None = None):
        self.cat_sampler = cat_sampler
        self.temperature = nnx.Param(0.5 * jnp.ones((1,)))
        self.rngs = rngs

    def __call__(self, src_emb, tgt_emb, src, tgt, temperature):
        d_k = src_emb.shape[-1]
        scores = jnp.einsum("bne,bme->bnm", src_emb, tgt_emb) / math.sqrt(d_k)
        temp = temperature.reshape(-1, 1, 1)
        if self.cat_sampler == "softmax":
            probs = jax.nn.softmax(temp * scores, axis=-1)
        elif self.cat_sampler == "gumbel_softmax":
            key = self.rngs.gumbel() if self.rngs is not None else jax.random.PRNGKey(0)
            g = -jnp.log(-jnp.log(jax.random.uniform(key, scores.shape) + 1e-20) + 1e-20)
            soft = jax.nn.softmax((scores + g) / temp, axis=-1)
            hard = jax.nn.one_hot(jnp.argmax(soft, -1), scores.shape[-1], dtype=soft.dtype)
            probs = jax.lax.stop_gradient(hard - soft) + soft  # straight-through
        else:
            raise ValueError(self.cat_sampler)
        src_corr = jnp.einsum("bnm,bmc->bnc", probs, tgt)
        R, t = procrustes_from_correspondence(
            src.astype(jnp.float32), src_corr.astype(jnp.float32)
        )
        return R, t


class KeyPointNet(nnx.Module):
    """Select top-k points by embedding norm (reference prnet.py:218-243)."""

    def __init__(self, num_keypoints):
        self.num_keypoints = num_keypoints

    def __call__(self, src, tgt, src_emb, tgt_emb):
        src_norm = jnp.linalg.norm(src_emb, axis=-1)
        tgt_norm = jnp.linalg.norm(tgt_emb, axis=-1)
        _, src_idx = jax.lax.top_k(src_norm, self.num_keypoints)
        _, tgt_idx = jax.lax.top_k(tgt_norm, self.num_keypoints)
        return (
            index_points(src, src_idx),
            index_points(tgt, tgt_idx),
            index_points(src_emb, src_idx),
            index_points(tgt_emb, tgt_idx),
        )


class PRNet(nnx.Module):
    # PRNet's forward estimates src -> tgt from (source, template) — the
    # opposite argument order of every other registration model's
    # (template, source). Declared here so eval tooling doesn't hardcode
    # a per-task special case (reference examples/test_prnet.py flow).
    forward_arg_order = "source_template"

    def __init__(
        self,
        emb_nn: str = "dgcnn",
        attention: str = "transformer",
        head: str = "svd",
        emb_dims: int = 512,
        num_keypoints: int = 512,
        num_subsampled_points: int = 768,
        num_iters: int = 3,
        cycle_consistency_loss: float = 0.1,
        feature_alignment_loss: float = 0.1,
        discount_factor: float = 0.9,
        input_shape: str = "bnc",
        approx_knn: bool = False,
        *,
        dtype=None,
        rngs: nnx.Rngs,
    ):
        self.emb_dims = emb_dims
        self.num_keypoints = num_keypoints
        self.num_iters = num_iters
        self.discount_factor = discount_factor
        self.feature_alignment_loss = feature_alignment_loss
        self.cycle_consistency_loss = cycle_consistency_loss
        self.input_shape = validate_input_shape(input_shape)

        if emb_nn == "pointnet":
            self.emb_nn = PRPointNet(emb_dims, dtype=dtype, rngs=rngs)
        elif emb_nn == "dgcnn":
            self.emb_nn = PRDGCNN(emb_dims, approx_knn=approx_knn, dtype=dtype, rngs=rngs)
        else:
            raise ValueError(emb_nn)

        if attention == "identity":
            self.attention = Identity()
        elif attention == "transformer":
            self.attention = Transformer(
                emb_dims, n_blocks=1, dropout=0.0, ff_dims=1024, n_heads=4,
                dtype=dtype, rngs=rngs,
            )
        else:
            raise ValueError(attention)

        self.temp_net = TemperatureNet(emb_dims, 100.0, dtype=dtype, rngs=rngs)
        if head == "svd":
            self.head = PRSVDHead(emb_dims, "softmax", rngs=rngs)
        else:
            raise ValueError(head)
        self.keypointnet = (
            KeyPointNet(num_keypoints) if num_keypoints != num_subsampled_points else None
        )

    def _predict_embedding(self, src, tgt, tgt_emb):
        src_emb = self.emb_nn(src)
        src_p, tgt_p = self.attention(src_emb, tgt_emb)
        src_emb = src_emb + src_p
        tgt_emb = tgt_emb + tgt_p
        if self.keypointnet is not None:
            src, tgt, src_emb, tgt_emb = self.keypointnet(src, tgt, src_emb, tgt_emb)
        temperature, disparity = self.temp_net(src_emb, tgt_emb)
        return src, tgt, src_emb, tgt_emb, temperature, disparity

    def _spam(self, src, tgt, tgt_emb_raw):
        s, t, src_emb, tgt_emb, temp, disparity = self._predict_embedding(src, tgt, tgt_emb_raw)
        R_ab, t_ab = self.head(src_emb, tgt_emb, s, t, temp)
        R_ba, t_ba = self.head(tgt_emb, src_emb, t, s, temp)
        return R_ab, t_ab, R_ba, t_ba, disparity

    def __call__(self, source, template, igt=None):
        """source/template (B, N, 3) ('bnc'); pass igt (B, 4, 4) (or an
        (R, t) tuple) to also get the reference's internal discounted
        training loss in result['loss'] (prnet.py:349-375)."""
        source = to_bnc(source, self.input_shape)
        template = to_bnc(template, self.input_shape)
        src, tgt = source, template
        calculate_loss = igt is not None
        if calculate_loss:
            if isinstance(igt, tuple):
                R_gt, t_gt = igt
            else:
                R_gt, t_gt = igt[:, :3, :3], igt[:, :3, 3]

        B = src.shape[0]
        eye = jnp.eye(3, dtype=src.dtype)
        R_ab_pred = jnp.broadcast_to(eye, (B, 3, 3))
        t_ab_pred = jnp.zeros((B, 3), dtype=src.dtype)
        R_ba_pred = jnp.broadcast_to(eye, (B, 3, 3))
        t_ba_pred = jnp.zeros((B, 3), dtype=src.dtype)

        # The template never moves, so its embedding is loop-invariant:
        # compute it once instead of once per iteration (the reference
        # re-embeds tgt each iteration, prnet.py:322-347 — identical
        # output, since train-mode BN normalizes each call with its own
        # batch stats; only BN running-average update counts differ).
        # With kNN as a Pallas call XLA can no longer CSE the repeats:
        # this is 2 of 6 DGCNN passes at num_iters=3.
        tgt_emb_raw = self.emb_nn(tgt)

        total_loss = 0.0
        for i in range(self.num_iters):
            R_ab_i, t_ab_i, R_ba_i, t_ba_i, disparity = self._spam(src, tgt, tgt_emb_raw)
            R_ab_pred = R_ab_i @ R_ab_pred
            t_ab_pred = jnp.einsum("bij,bj->bi", R_ab_i, t_ab_pred) + t_ab_i
            R_ba_pred = R_ba_i @ R_ba_pred
            t_ba_pred = jnp.einsum("bij,bj->bi", R_ba_i, t_ba_pred) + t_ba_i

            if calculate_loss:
                d = self.discount_factor**i
                loss = (
                    jnp.mean((jnp.swapaxes(R_ab_pred, -1, -2) @ R_gt - eye) ** 2)
                    + jnp.mean((t_ab_pred - t_gt) ** 2)
                ) * d
                fa = jnp.mean(disparity) * self.feature_alignment_loss * d
                cc = (
                    cycle_consistency(R_ab_i, t_ab_i, R_ba_i, t_ba_i)
                    * self.cycle_consistency_loss
                    * d
                )
                total_loss = total_loss + loss + fa + cc

            src = transforms.transform_point_cloud(src, R_ab_i, t_ab_i)

        result = {
            "est_R": R_ab_pred,
            "est_t": t_ab_pred,
            "est_T": se3.from_rt(R_ab_pred, t_ab_pred),
            "transformed_source": src,
        }
        if calculate_loss:
            result["loss"] = total_loss
        return result
