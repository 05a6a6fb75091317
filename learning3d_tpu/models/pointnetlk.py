"""PointNetLK — inverse-compositional Lucas-Kanade registration.

Capability parity with reference models/pointnetlk.py:10-164, TPU-first:

* the per-batch python loop building the 6 finite-difference twist
  transforms (reference :122-125) collapses to one constant (6, 4, 4)
  stack (dt is shared across the batch);
* the 6 perturbed clouds embed in a single batched encoder pass;
* (J^T J)^{-1} J^T is a batched solve with optional Tikhonov damping
  replacing the reference's try/except-singular -> identity fallback;
* the data-dependent xtol early exit (:81-83) becomes a fixed-trip
  ``lax.scan`` with a converged mask that freezes updates — differentiable
  (unlike lax.while_loop) and static-shaped;
* the BatchNorm warm-then-freeze trick (:158-164) is a per-call
  ``use_running_average`` override instead of runtime module mutation.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import nnx

from learning3d_tpu.models.pooling import Pooling
from learning3d_tpu.ops import mean_shift, se3
from learning3d_tpu.utils.layers import to_bnc, validate_input_shape


class PointNetLK(nnx.Module):
    def __init__(
        self,
        feature_model: nnx.Module,
        delta: float = 1.0e-2,
        learn_delta: bool = False,
        xtol: float = 1.0e-7,
        p0_zero_mean: bool = True,
        p1_zero_mean: bool = True,
        pooling: str = "max",
        damping: float = 1e-6,
        input_shape: str = "bnc",
    ):
        # damping: Tikhonov term on J^T J. The reference instead catches the
        # singular-matrix RuntimeError and returns identity
        # (pointnetlk.py:138-156); a tiny damping keeps the solve finite
        # without the data-dependent control flow.
        self.input_shape = validate_input_shape(input_shape)
        self.feature_model = feature_model
        self.pooling = Pooling(pooling)
        dt = jnp.full((1, 6), delta, dtype=jnp.float32)
        self.dt = nnx.Param(dt) if learn_delta else nnx.Variable(dt)
        self.xtol = xtol
        self.p0_zero_mean = p0_zero_mean
        self.p1_zero_mean = p1_zero_mean
        self.damping = damping

    def _embed(self, points, frozen=True):
        ura = True if frozen else None
        if self.pooling.pool_type == "max" and hasattr(self.feature_model, "pooled_features"):
            return self.feature_model.pooled_features(points, use_running_average=ura)
        return self.pooling(self.feature_model(points, use_running_average=ura))

    def _approx_jac(self, template, template_features):
        """J[b, k, i] = (f0 - f(exp(-dt_i e_i) p0))_k / dt_i."""
        B, N, _ = template.shape
        dt = self.dt[0]  # (6,)
        twists = -jnp.diag(dt)  # (6, 6)
        transf = se3.exp(twists)  # (6, 4, 4), shared across batch
        p = se3.transform(transf[None, :, None, :, :], template[:, None])  # (B,6,N,3)
        f = self._embed(p.reshape(B * 6, N, 3)).reshape(B, 6, -1)  # (B, 6, K)
        df = template_features[:, None, :] - f  # (B, 6, K)
        return jnp.swapaxes(df, 1, 2) / dt[None, None, :]  # (B, K, 6)

    def _pinv(self, J):
        Jt = jnp.swapaxes(J, 1, 2)  # (B, 6, K)
        H = Jt @ J  # (B, 6, 6)
        if self.damping:
            H = H + self.damping * jnp.eye(6, dtype=J.dtype)
        return jnp.linalg.solve(H, Jt)  # (B, 6, K)

    def __call__(self, template, source, maxiter: int = 10):
        template = to_bnc(template, self.input_shape)
        source = to_bnc(source, self.input_shape)
        if self.p0_zero_mean or self.p1_zero_mean:
            t0, s0, a0, a1 = mean_shift.mean_shift(template, source)
            if not self.p0_zero_mean:
                t0, a0 = template, jnp.broadcast_to(jnp.eye(4, template.dtype), a0.shape)
            if not self.p1_zero_mean:
                s0, a1 = source, jnp.broadcast_to(jnp.eye(4, source.dtype), a1.shape)
        else:
            t0, s0 = template, source
            a0 = a1 = None

        est_T0, r, series0 = self._iclk(t0, s0, maxiter)

        if a0 is not None:
            est_T = mean_shift.postprocess(est_T0, a0, a1)
            series = jax.vmap(lambda g: mean_shift.postprocess(g, a0, a1))(series0)
        else:
            est_T, series = est_T0, series0

        return {
            "est_R": est_T[:, :3, :3],
            "est_t": est_T[:, :3, 3],
            "est_T": est_T,
            "r": r,
            "transformed_source": se3.transform(est_T[:, None], source),
            "est_T_series": series,  # (maxiter+1, B, 4, 4)
        }

    def _iclk(self, template, source, maxiter):
        B = template.shape[0]
        est_T = jnp.broadcast_to(jnp.eye(4, dtype=template.dtype), (B, 4, 4))

        # Warm-up passes update BN stats only when BN exists and is in train
        # mode (static python check — mirrors reference handle_batchNorm);
        # every later embedding uses frozen running statistics.
        bns = [b for b in getattr(self.feature_model, "bns", []) if b is not None]
        if any(not b.use_running_average for b in bns):
            self._embed(template, frozen=False)
            self._embed(source, frozen=False)
        f0 = self._embed(template)

        J = self._approx_jac(template, f0)
        pinv = self._pinv(J)

        def step(carry, _):
            est_T, r_prev, done = carry
            transformed = se3.transform(est_T[:, None], source)
            r = self._embed(transformed) - f0  # (B, K)
            pose = -jnp.einsum("bik,bk->bi", pinv, r)  # (B, 6)
            small = jnp.linalg.norm(pose, axis=-1) < self.xtol
            done_now = done | small
            new_T = se3.exp(pose) @ est_T
            est_T = jnp.where(done_now[:, None, None], est_T, new_T)
            r = jnp.where(done[:, None], r_prev, r)
            return (est_T, r, done_now), est_T

        init_r = jnp.zeros((B, f0.shape[-1]), dtype=f0.dtype)
        (est_T, r, _), series = jax.lax.scan(
            step, (est_T, init_r, jnp.zeros((B,), dtype=bool)), None, length=maxiter
        )
        series = jnp.concatenate(
            [jnp.broadcast_to(jnp.eye(4, dtype=est_T.dtype), (1, B, 4, 4)), series], axis=0
        )
        return est_T, r, series
