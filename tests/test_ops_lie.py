"""Property + golden tests for the Lie-group / quaternion numerics core."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.spatial.transform import Rotation

from learning3d_tpu.ops import quaternion as quat
from learning3d_tpu.ops import se3, sinc, so3


def rand_w(key, n, scale=2.0, max_norm=3.0):
    """Random rotation vectors with |w| < max_norm (< pi for roundtrip
    tests: the principal log cannot recover |w| > pi)."""
    w = scale * jax.random.normal(key, (n, 3))
    nrm = jnp.linalg.norm(w, axis=-1, keepdims=True)
    return w * jnp.minimum(nrm, max_norm) / jnp.maximum(nrm, 1e-9)


class TestSinc:
    def test_values_match_analytic(self):
        # Avoid |t| ~ 0 where the float32 numpy reference itself cancels
        # catastrophically; t=0 is checked exactly below.
        # |t| >= 0.05: below that even the float64 oracle for sinc4's
        # O(t^4) numerator loses digits; t=0 is checked exactly below.
        tt = np.concatenate([np.linspace(-3.0, -0.05, 50), np.linspace(0.05, 3.0, 50)]).astype(
            np.float32
        )
        t = jnp.asarray(tt)
        ref = np.float64(tt)
        np.testing.assert_allclose(sinc.sinc1(t), np.sin(ref) / ref, atol=1e-5)
        np.testing.assert_allclose(sinc.sinc2(t), (1 - np.cos(ref)) / ref**2, atol=1e-5)
        np.testing.assert_allclose(sinc.sinc3(t), (ref - np.sin(ref)) / ref**3, atol=1e-5)
        np.testing.assert_allclose(
            sinc.sinc4(t), (ref**2 / 2 + np.cos(ref) - 1) / ref**4, atol=1e-5
        )
        # exact values at t = 0
        for f, v in [(sinc.sinc1, 1.0), (sinc.sinc2, 0.5), (sinc.sinc3, 1 / 6), (sinc.sinc4, 1 / 24)]:
            np.testing.assert_allclose(float(f(jnp.asarray(0.0))), v, atol=1e-7)

    def test_grads_finite_at_zero(self):
        for f in [sinc.sinc1, sinc.sinc2, sinc.sinc3, sinc.sinc4]:
            g = jax.grad(f)(0.0)
            assert np.isfinite(g), f
            gg = jax.grad(jax.grad(f))(0.0)
            assert np.isfinite(gg), f

    def test_grad_matches_numeric(self):
        t = jnp.array([0.5, 1.3, -2.1])
        for f in [sinc.sinc1, sinc.sinc2, sinc.sinc3, sinc.sinc4]:
            g = jax.vmap(jax.grad(f))(t)
            eps = 1e-3
            num = (jax.vmap(f)(t + eps) - jax.vmap(f)(t - eps)) / (2 * eps)
            np.testing.assert_allclose(g, num, atol=1e-3)


class TestSO3:
    def test_exp_matches_scipy(self):
        key = jax.random.PRNGKey(0)
        w = rand_w(key, 32)
        R = so3.exp(w)
        R_ref = Rotation.from_rotvec(np.asarray(w)).as_matrix()
        np.testing.assert_allclose(R, R_ref, atol=1e-5)

    def test_exp_log_roundtrip(self):
        key = jax.random.PRNGKey(1)
        w = rand_w(key, 64, scale=1.0, max_norm=3.0)
        np.testing.assert_allclose(so3.log(so3.exp(w)), w, atol=1e-4)

    def test_log_principal_for_large_angles(self):
        # |w| > pi: log returns the equivalent principal rotation vector.
        w = jnp.asarray([[4.0, 1.0, -2.0], [0.0, 5.0, 0.0]])
        w2 = so3.log(so3.exp(w))
        assert np.all(np.linalg.norm(np.asarray(w2), axis=-1) <= np.pi + 1e-4)
        np.testing.assert_allclose(so3.exp(w2), so3.exp(w), atol=1e-4)

    def test_log_near_pi(self):
        axis = np.array([[1.0, 0, 0], [0, 1.0, 0], [0.577, 0.577, 0.577]])
        axis = axis / np.linalg.norm(axis, axis=-1, keepdims=True)
        for ang in [np.pi - 1e-3, np.pi - 1e-5]:
            w = jnp.asarray(axis * ang)
            w2 = so3.log(so3.exp(w))
            np.testing.assert_allclose(w2, w, atol=1e-2)

    def test_log_identity(self):
        w = so3.log(jnp.eye(3)[None])
        np.testing.assert_allclose(w, np.zeros((1, 3)), atol=1e-6)

    def test_orthonormal_det1(self):
        key = jax.random.PRNGKey(2)
        R = so3.exp(rand_w(key, 16))
        np.testing.assert_allclose(R @ jnp.swapaxes(R, -1, -2), np.tile(np.eye(3), (16, 1, 1)), atol=1e-5)
        np.testing.assert_allclose(jnp.linalg.det(R), np.ones(16), atol=1e-5)

    def test_exp_grad_finite_at_zero(self):
        g = jax.jacobian(so3.exp)(jnp.zeros(3))
        assert np.all(np.isfinite(g))
        # d exp / d w at 0 should be the generators
        np.testing.assert_allclose(g, np.asarray(so3.genmat()).transpose(1, 2, 0), atol=1e-5)

    def test_hat_vee(self):
        key = jax.random.PRNGKey(3)
        w = rand_w(key, 8)
        np.testing.assert_allclose(so3.vec(so3.mat(w)), w, atol=1e-6)

    def test_inv_left_jacobian(self):
        key = jax.random.PRNGKey(4)
        w = rand_w(key, 16, scale=1.5)
        V = so3.left_jacobian(w)
        Vi = so3.inv_left_jacobian(w)
        np.testing.assert_allclose(V @ Vi, np.tile(np.eye(3), (16, 1, 1)), atol=1e-4)
        # Small-angle branch too.
        w0 = rand_w(key, 4, scale=1e-3)
        np.testing.assert_allclose(
            so3.left_jacobian(w0) @ so3.inv_left_jacobian(w0),
            np.tile(np.eye(3), (4, 1, 1)),
            atol=1e-5,
        )


class TestSE3:
    def test_exp_log_roundtrip(self):
        key = jax.random.PRNGKey(5)
        x = jax.random.normal(key, (32, 6))
        # keep rotation part below pi (principal-log domain)
        w = rand_w(jax.random.PRNGKey(50), 32, scale=1.0, max_norm=3.0)
        x = x.at[:, :3].set(w)
        np.testing.assert_allclose(se3.log(se3.exp(x)), x, atol=1e-4)

    def test_exp_identity(self):
        g = se3.exp(jnp.zeros((1, 6)))
        np.testing.assert_allclose(g[0], np.eye(4), atol=1e-6)

    def test_inverse(self):
        key = jax.random.PRNGKey(6)
        g = se3.exp(jax.random.normal(key, (16, 6)))
        np.testing.assert_allclose(g @ se3.inverse(g), np.tile(np.eye(4), (16, 1, 1)), atol=1e-5)

    def test_transform_points(self):
        key = jax.random.PRNGKey(7)
        k1, k2 = jax.random.split(key)
        g = se3.exp(jax.random.normal(k1, (4, 6)))
        p = jax.random.normal(k2, (4, 100, 3))
        out = se3.transform(g, p)
        ref = np.einsum("bij,bnj->bni", np.asarray(g[:, :3, :3]), np.asarray(p)) + np.asarray(
            g[:, None, :3, 3]
        )
        np.testing.assert_allclose(out, ref, atol=1e-5)

    def test_hat_vee(self):
        key = jax.random.PRNGKey(8)
        x = jax.random.normal(key, (8, 6))
        np.testing.assert_allclose(se3.vec(se3.mat(x)), x, atol=1e-6)


class TestQuaternion:
    def test_quat_mat_roundtrip(self):
        rot = Rotation.random(50, random_state=0)
        R = jnp.asarray(rot.as_matrix(), dtype=jnp.float32)
        q = quat.mat2quat(R)
        np.testing.assert_allclose(quat.quat2mat(q), R, atol=1e-5)

    def test_mat2quat_near_pi(self):
        rot = Rotation.from_rotvec(np.array([[np.pi - 1e-4, 0, 0], [0, 0, np.pi]]))
        R = jnp.asarray(rot.as_matrix(), dtype=jnp.float32)
        np.testing.assert_allclose(quat.quat2mat(quat.mat2quat(R)), R, atol=1e-4)

    def test_qrot_matches_matrix(self):
        rot = Rotation.random(8, random_state=1)
        q = jnp.asarray(rot.as_quat(scalar_first=True), dtype=jnp.float32)
        v = jax.random.normal(jax.random.PRNGKey(9), (8, 3))
        np.testing.assert_allclose(
            quat.qrot(q, v), np.einsum("bij,bj->bi", rot.as_matrix(), np.asarray(v)), atol=1e-5
        )

    def test_qmul_matches_scipy(self):
        r1, r2 = Rotation.random(8, random_state=2), Rotation.random(8, random_state=3)
        q1 = jnp.asarray(r1.as_quat(scalar_first=True), dtype=jnp.float32)
        q2 = jnp.asarray(r2.as_quat(scalar_first=True), dtype=jnp.float32)
        q12 = quat.qmul(q1, q2)
        ref = (r1 * r2).as_quat(scalar_first=True)
        # sign ambiguity
        sign = np.sign(np.sum(np.asarray(q12) * ref, axis=-1, keepdims=True))
        np.testing.assert_allclose(q12, ref * sign, atol=1e-5)

    def test_qfix_continuity(self):
        """qfix (reference ops/quaternion.py:127-144): greedy sign choice
        along axis 0. Pinned against the sequential spec and the
        continuity property (consecutive dots >= 0)."""
        rng = np.random.RandomState(7)
        # smooth random walk with adversarial sign flips injected
        q = Rotation.random(20, random_state=11).as_quat(scalar_first=True)
        q = q.reshape(20, 1, 4).astype(np.float32)
        q *= rng.choice([-1.0, 1.0], size=(20, 1, 1))

        fixed = np.asarray(quat.qfix(jnp.asarray(q)))
        # sequential spec: flip q[i] iff dot with the previous FIXED < 0
        want = q.copy()
        for i in range(1, len(q)):
            flip = np.sum(want[i] * want[i - 1], axis=-1, keepdims=True) < 0
            want[i] = np.where(flip, -want[i], want[i])
        np.testing.assert_allclose(fixed, want, atol=0)
        assert np.all(np.sum(fixed[1:] * fixed[:-1], axis=-1) >= 0)
        np.testing.assert_allclose(np.abs(fixed), np.abs(q), atol=0)

    def test_axis_angle_roundtrip(self):
        w = rand_w(jax.random.PRNGKey(10), 32, scale=2.0, max_norm=3.0)
        q = quat.axis_angle_to_quat(w)
        np.testing.assert_allclose(quat.quat_to_axis_angle(q), w, atol=1e-4)

    def test_axis_angle_grad_finite_at_zero(self):
        j = jax.jacobian(quat.axis_angle_to_quat)(jnp.zeros(3))
        assert np.all(np.isfinite(np.asarray(j)))

    def test_euler_matches_scipy(self):
        # euler_to_quat composes INTRINSICALLY in the given order — scipy's
        # uppercase convention (lowercase in scipy means extrinsic).
        e = np.random.RandomState(4).uniform(-1.0, 1.0, (16, 3)).astype(np.float32)
        q = quat.euler_to_quat(jnp.asarray(e), "zyx")
        ref = Rotation.from_euler("ZYX", e).as_quat(scalar_first=True)
        sign = np.sign(np.sum(np.asarray(q) * ref, axis=-1, keepdims=True))
        np.testing.assert_allclose(q, ref * sign, atol=1e-5)


class TestMeanShift:
    def test_postprocess_recovers_transform(self):
        from learning3d_tpu.ops import mean_shift

        key = jax.random.PRNGKey(11)
        k1, k2 = jax.random.split(key)
        template = jax.random.normal(k1, (4, 128, 3)) + 5.0
        g = se3.exp(0.5 * jax.random.normal(k2, (4, 6)))
        source = se3.transform(g, template)
        t0, s0, a0, a1 = mean_shift.mean_shift(template, source)
        # solve registration exactly in the zero-mean frame via Kabsch-free
        # check: est_T0 that maps s0->t0 exists; verify that composing
        # postprocess(est_T0) maps source->template.
        # Build est_T0 from the known g: t0 = A0 T, s0 = A1 S = A1 g T.
        # est_T0 = A0 g^{ -1} A1^{-1}.
        est_T0 = a0 @ se3.inverse(g) @ se3.inverse(a1)
        est_T = mean_shift.postprocess(est_T0, a0, a1)
        np.testing.assert_allclose(se3.transform(est_T, source), template, atol=1e-4)
