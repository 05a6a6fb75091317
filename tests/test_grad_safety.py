"""Gradient finiteness at degenerate inputs.

The r4 RPMNet run froze because the Kabsch backward emitted NaN once the
soft-correspondence covariance collapsed (every later step was skipped by
the trainer's non-finite guard): atan2's gradient is NaN at (0, 0), which
both the Jacobi sweep (equal diagonal + zero off-diagonal) and angle()
(zero normals / self-neighbor d=0) hit exactly. These tests pin the
guards in utils/svd3.py and ops/geometry.angle: values match the
unguarded math away from the degenerate set, gradients are finite ON it.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from learning3d_tpu.ops.geometry import angle
from learning3d_tpu.utils.svd3 import kabsch_rotation_3x3


class TestAngleGradSafety:
    def test_zero_vector_value_and_grad(self):
        # angle(0, d) must VALUE-match atan2(0,0)=0 (torch parity) with a
        # finite gradient
        d = jnp.array([0.5, -0.2, 0.3])
        z = jnp.zeros(3)
        assert float(angle(z, d)) == 0.0
        g = jax.grad(lambda v: angle(v, d))(z)
        assert bool(jnp.all(jnp.isfinite(g)))
        g2 = jax.grad(lambda v: angle(z, v))(d)
        assert bool(jnp.all(jnp.isfinite(g2)))

    def test_parallel_vectors_grad_finite(self):
        v = jnp.array([0.3, 0.4, 0.5])
        g = jax.grad(lambda a: angle(a, 2.0 * a))(v)
        assert bool(jnp.all(jnp.isfinite(g)))

    def test_generic_value_unchanged(self):
        rng = np.random.default_rng(0)
        v1 = rng.standard_normal((64, 3)).astype(np.float32)
        v2 = rng.standard_normal((64, 3)).astype(np.float32)
        got = np.asarray(angle(jnp.asarray(v1), jnp.asarray(v2)))
        cross = np.cross(v1, v2)
        want = np.arctan2(np.linalg.norm(cross, axis=-1), np.sum(v1 * v2, -1))
        np.testing.assert_allclose(got, want, atol=1e-6)


class TestKabschGradSafety:
    def _loss(self, H):
        return jnp.sum(kabsch_rotation_3x3(H) ** 2)

    def test_zero_covariance_grad_finite(self):
        g = jax.grad(self._loss)(jnp.zeros((3, 3)))
        assert bool(jnp.all(jnp.isfinite(g)))

    def test_isotropic_covariance_grad_finite(self):
        # equal singular values: the classic SVD-backward 1/(s_i^2-s_j^2)
        # blow-up point; the Jacobi path must stay finite
        g = jax.grad(self._loss)(jnp.eye(3) * 0.5)
        assert bool(jnp.all(jnp.isfinite(g)))

    def test_near_degenerate_batch_grad_finite(self):
        rng = np.random.default_rng(1)
        H = jnp.asarray(1e-7 * rng.standard_normal((8, 3, 3)).astype(np.float32))
        g = jax.grad(lambda h: jnp.sum(kabsch_rotation_3x3(h) ** 2))(H)
        assert bool(jnp.all(jnp.isfinite(g)))

    def test_generic_rotation_unchanged(self):
        # healthy covariances: the guard must not perturb the solution
        rng = np.random.default_rng(2)
        a = rng.standard_normal((4, 32, 3)).astype(np.float32)
        Rs = []
        for _ in range(4):
            q = rng.standard_normal(4)
            q /= np.linalg.norm(q)
            w, x, y, z = q
            Rs.append(np.array([
                [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
                [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
                [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
            ]))
        R = np.stack(Rs).astype(np.float32)
        b = np.einsum("bij,bnj->bni", R, a)
        H = jnp.einsum("bni,bnj->bij", jnp.asarray(a), jnp.asarray(b))
        R_est = kabsch_rotation_3x3(H)  # maps src (a) -> corr (b)
        np.testing.assert_allclose(np.asarray(R_est), R, atol=2e-3)

    def test_rpmnet_degenerate_weighted_template_grads(self):
        # end-to-end shape of the original failure: uniform soft
        # correspondence -> near-constant weighted template -> Kabsch;
        # grads w.r.t. the PERM (upstream of the covariance) stay finite
        rng = np.random.default_rng(3)
        src = jnp.asarray(rng.standard_normal((2, 16, 3)).astype(np.float32))
        tmpl = jnp.asarray(rng.standard_normal((2, 16, 3)).astype(np.float32))

        def loss(perm_logits):
            perm = jax.nn.softmax(perm_logits, -1)
            weighted = jnp.einsum("bjk,bkc->bjc", perm, tmpl)
            a = src - src.mean(1, keepdims=True)
            b = weighted - weighted.mean(1, keepdims=True)
            H = jnp.einsum("bni,bnj->bij", a, b)
            return jnp.sum(kabsch_rotation_3x3(H) ** 2)

        # all-equal logits = exactly uniform perm (the collapse state)
        g = jax.grad(loss)(jnp.zeros((2, 16, 16)))
        assert bool(jnp.all(jnp.isfinite(g)))
