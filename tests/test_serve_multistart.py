"""Multi-start registration serving (learning3d_tpu.serve.multistart_register).

Chamfer-trained iterative registration has wrong-pose attractors 40-180deg
from the ground truth (tools/diagnose_ipcrnet_attractor.py); the serving-time
fix folds K coarse octahedral initial rotations into the batch and keeps the
lowest-chamfer start per item. These tests pin the pieces that make that
correct: the rotation grid is a valid spread cover of SO(3), the K=1 identity
start reproduces the plain forward exactly, the composed transform really maps
the ORIGINAL source onto the template, and per-item selection is independent.
"""

import numpy as np

import jax
import jax.numpy as jnp
from flax import nnx

from learning3d_tpu import models
from learning3d_tpu.serve import multistart_register, rotation_starts


class _IdentityRegistrar:
    """Registration stub that always predicts the identity transform —
    isolates multistart's pre-rotation composition + chamfer selection
    from any learned behavior."""

    def __call__(self, template, source):
        B = template.shape[0]
        eye = jnp.broadcast_to(jnp.eye(4, dtype=template.dtype), (B, 4, 4))
        return {"est_T": eye}


def _cloud(key, n=64):
    # anisotropic so no nontrivial octahedral rotation is a self-map
    pts = jax.random.normal(key, (n, 3)) * jnp.asarray([1.0, 0.55, 0.3])
    return pts - pts.mean(axis=0)


class TestRotationStarts:
    def test_valid_rotations_identity_first_and_spread(self):
        Rs = np.asarray(rotation_starts(8))
        assert Rs.shape == (8, 3, 3)
        np.testing.assert_allclose(Rs[0], np.eye(3), atol=0)
        for R in Rs:
            np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-6)
            assert np.linalg.det(R) > 0.5
        # pairwise distinct (trace of R_a^T R_b < 3 off the diagonal)
        for a in range(8):
            for b in range(a + 1, 8):
                assert np.trace(Rs[a].T @ Rs[b]) < 3.0 - 1e-3
        # greedy farthest-point: the second start is maximally far from
        # identity (a 180deg element, trace -1)
        assert np.trace(Rs[1]) < -1.0 + 1e-5

    def test_full_group_and_bounds(self):
        assert np.asarray(rotation_starts(24)).shape == (24, 3, 3)
        import pytest

        with pytest.raises(ValueError):
            rotation_starts(0)
        with pytest.raises(ValueError):
            rotation_starts(25)


class TestMultistartRegister:
    def test_identity_start_matches_plain_forward(self):
        pn = models.PointNet(emb_dims=32, use_bn=False, rngs=nnx.Rngs(0))
        model = models.iPCRNet(pn, rngs=nnx.Rngs(1))
        model.eval()
        t = jax.random.normal(jax.random.PRNGKey(0), (3, 48, 3))
        s = jax.random.normal(jax.random.PRNGKey(1), (3, 48, 3))
        out = multistart_register(model, t, s, rotation_starts(1))
        want = model(t, s)["est_T"]
        np.testing.assert_allclose(
            np.asarray(out["est_T"]), np.asarray(want), atol=1e-5
        )
        assert np.all(np.asarray(out["start_idx"]) == 0)

    def test_recovers_large_rotation_with_centroid_model(self):
        # source = R180 @ template (+ offset centroid). The pre-rotation is
        # about the SOURCE centroid (rotation-only — the model owns
        # translation), so the stub aligns centroids and nothing else: only
        # the multistart whose G_k inverts R180 gives chamfer ~0 —
        # selection must find it and est_T must map the ORIGINAL source
        # onto the template, shift included.
        class _CentroidRegistrar:
            def __call__(self, template, source):
                B = template.shape[0]
                t = template[..., :3].mean(axis=1) - source[..., :3].mean(axis=1)
                T = jnp.broadcast_to(jnp.eye(4, dtype=template.dtype), (B, 4, 4))
                return {"est_T": T.at[:, :3, 3].set(t)}

        key = jax.random.PRNGKey(2)
        base = _cloud(key)
        R = jnp.asarray(np.diag([1.0, -1.0, -1.0]).astype(np.float32))  # 180deg about x
        shift = jnp.asarray([0.3, -0.2, 0.1])
        template = jnp.stack([base, base * 1.1])
        source = jnp.einsum("ij,bnj->bni", R, template) + shift
        out = multistart_register(
            _CentroidRegistrar(), template, source, rotation_starts(8)
        )
        assert float(out["chamfer"].max()) < 1e-4
        moved = (
            jnp.einsum("bij,bnj->bni", out["est_T"][:, :3, :3], source)
            + out["est_T"][:, :3, 3][:, None, :]
        )
        np.testing.assert_allclose(np.asarray(moved), np.asarray(template), atol=1e-4)
        # and the winning start is NOT the identity
        assert np.all(np.asarray(out["start_idx"]) != 0)

    def test_per_item_selection_is_independent(self):
        # item 0 already aligned (identity start wins), item 1 rotated
        # 180deg (a far start wins) — one forward, two different winners.
        base = _cloud(jax.random.PRNGKey(3))
        R = jnp.asarray(np.diag([-1.0, 1.0, -1.0]).astype(np.float32))
        template = jnp.stack([base, base])
        source = jnp.stack([base, jnp.einsum("ij,nj->ni", R, base)])
        out = multistart_register(
            _IdentityRegistrar(), template, source, rotation_starts(8)
        )
        idx = np.asarray(out["start_idx"])
        assert idx[0] == 0 and idx[1] != 0
        assert float(out["chamfer"].max()) < 1e-4

    def test_normals_passthrough_and_jit(self):
        class _CheckChannels:
            def __call__(self, template, source):
                assert template.shape[-1] == 6 and source.shape[-1] == 6
                B = template.shape[0]
                eye = jnp.broadcast_to(jnp.eye(4, dtype=template.dtype), (B, 4, 4))
                return {"est_T": eye}

        base = _cloud(jax.random.PRNGKey(4), n=32)
        nrm = base / jnp.linalg.norm(base, axis=-1, keepdims=True)
        cloud6 = jnp.concatenate([base, nrm], axis=-1)[None]
        rots = rotation_starts(4)
        fn = jax.jit(
            lambda t, s: multistart_register(_CheckChannels(), t, s, rots)["est_T"]
        )
        out = fn(cloud6, cloud6)
        assert out.shape == (1, 4, 4)
        np.testing.assert_allclose(np.asarray(out[0]), np.eye(4), atol=1e-5)
