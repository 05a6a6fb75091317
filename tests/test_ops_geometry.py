"""Tests for geometry primitives, pinned against brute-force numpy and the
reference's documented semantics (SURVEY.md §2.1, utils/model_common_utils.py)."""

import jax
import jax.numpy as jnp
import numpy as np

from learning3d_tpu.ops import geometry, grouping


def clouds(key, b=2, n=128, c=3):
    return jax.random.normal(key, (b, n, c))


class TestSquareDistance:
    def test_matches_bruteforce(self):
        k1, k2 = jax.random.split(jax.random.PRNGKey(0))
        a, b = clouds(k1, n=64), clouds(k2, n=48)
        d = geometry.square_distance(a, b)
        ref = np.sum((np.asarray(a)[:, :, None] - np.asarray(b)[:, None]) ** 2, -1)
        np.testing.assert_allclose(d, ref, atol=1e-4)


class TestIndexPointsMatmul:
    def test_matches_gather_bf16(self):
        """The TPU one-hot MXU gather path must copy bf16 values exactly."""
        from learning3d_tpu.ops.geometry import _index_points_matmul

        kp, ki = jax.random.split(jax.random.PRNGKey(9))
        pts = jax.random.normal(kp, (2, 50, 19), dtype=jnp.bfloat16)
        idx = jax.random.randint(ki, (2, 30, 7), 0, 50)
        got = np.asarray(_index_points_matmul(pts, idx))
        want = np.asarray(pts)[np.arange(2)[:, None, None], np.asarray(idx)]
        np.testing.assert_array_equal(got, want)

    def test_vjp_matches_gather(self):
        """Backward (scatter-add via transposed one-hot product) must match
        take_along_axis's VJP — models train through this path on TPU."""
        from learning3d_tpu.ops.geometry import _index_points_matmul

        kp, ki, kc = jax.random.split(jax.random.PRNGKey(11), 3)
        pts = jax.random.normal(kp, (2, 40, 8))  # f32 so grads are tight
        idx = jax.random.randint(ki, (2, 25, 5), 0, 40)
        ct = jax.random.normal(kc, (2, 25, 5, 8))

        def ref(p):
            flat = idx.reshape(2, -1)
            out = jnp.take_along_axis(p, flat[..., None], axis=1)
            return out.reshape(idx.shape + (p.shape[-1],))

        g1 = jax.vjp(lambda p: _index_points_matmul(p, idx), pts)[1](ct)[0]
        g2 = jax.vjp(ref, pts)[1](ct)[0]
        np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), atol=1e-5)


class TestKNN:
    def test_knn_self(self):
        x = clouds(jax.random.PRNGKey(1), n=64)
        idx = geometry.knn(x, 8)
        ref_d = np.sum((np.asarray(x)[:, :, None] - np.asarray(x)[:, None]) ** 2, -1)
        ref_idx = np.argsort(ref_d, axis=-1)[..., :8]
        # nearest must be self
        np.testing.assert_array_equal(np.asarray(idx)[..., 0], ref_idx[..., 0])
        # same neighbor sets
        np.testing.assert_array_equal(np.sort(np.asarray(idx), -1), np.sort(ref_idx, -1))

    def test_knn_point_cross(self):
        k1, k2 = jax.random.split(jax.random.PRNGKey(2))
        p1, p2 = clouds(k1, n=96), clouds(k2, n=32)
        dist, idx = geometry.knn_point(4, p1, p2)
        ref_d = np.sqrt(np.sum((np.asarray(p2)[:, :, None] - np.asarray(p1)[:, None]) ** 2, -1))
        ref_idx = np.argsort(ref_d, axis=-1)[..., :4]
        np.testing.assert_array_equal(np.sort(np.asarray(idx), -1), np.sort(ref_idx, -1))
        np.testing.assert_allclose(
            np.asarray(dist), np.take_along_axis(ref_d, np.asarray(idx), -1), atol=1e-4
        )


class TestFPS:
    def test_first_point_start_and_spread(self):
        x = clouds(jax.random.PRNGKey(3), b=3, n=256)
        idx = geometry.farthest_point_sample(x, 32)
        assert idx.shape == (3, 32)
        np.testing.assert_array_equal(np.asarray(idx)[:, 0], 0)  # deterministic start
        # all distinct
        for b in range(3):
            assert len(set(np.asarray(idx)[b].tolist())) == 32

    def test_matches_greedy_reference(self):
        x = clouds(jax.random.PRNGKey(4), b=1, n=64)
        idx = np.asarray(geometry.farthest_point_sample(x, 16))[0]
        # brute-force greedy FPS starting at 0
        pts = np.asarray(x)[0]
        chosen = [0]
        dist = np.full(64, np.inf)
        for _ in range(15):
            d = np.sum((pts - pts[chosen[-1]]) ** 2, -1)
            dist = np.minimum(dist, d)
            chosen.append(int(np.argmax(dist)))
        np.testing.assert_array_equal(idx, chosen)

    def test_random_start(self):
        x = clouds(jax.random.PRNGKey(5), b=4, n=128)
        idx = geometry.farthest_point_sample(x, 8, key=jax.random.PRNGKey(6))
        assert not np.all(np.asarray(idx)[:, 0] == 0)


class TestBallQuery:
    def test_semantics(self):
        x = clouds(jax.random.PRNGKey(7), b=2, n=64)
        new = x[:, :16]
        r, ns = 0.8, 8
        idx = np.asarray(geometry.query_ball_point(r, ns, x, new))
        d = np.sum((np.asarray(new)[:, :, None] - np.asarray(x)[:, None]) ** 2, -1)
        for b in range(2):
            for s in range(16):
                inball = np.where(d[b, s] <= r * r)[0]
                expect = inball[:ns]
                if len(expect) == 0:
                    continue  # degenerate: all == first which is N-fill; skip
                got = idx[b, s]
                np.testing.assert_array_equal(got[: len(expect)], expect)
                if len(expect) < ns:  # padded with first in-ball index
                    np.testing.assert_array_equal(got[len(expect) :], expect[0])

    def test_count(self):
        x = clouds(jax.random.PRNGKey(8), b=1, n=64)
        idx, cnt = geometry.query_ball_point(0.8, 8, x, x[:, :4], get_cnt=True)
        d = np.sum((np.asarray(x)[:, :4, None] - np.asarray(x)[:, None]) ** 2, -1)
        np.testing.assert_array_equal(np.asarray(cnt), np.sum(d <= 0.64, -1))


class TestInterpolate:
    def test_three_nn_and_interp(self):
        k1, k2 = jax.random.split(jax.random.PRNGKey(9))
        unknown, known = clouds(k1, n=64), clouds(k2, n=16)
        feats = jax.random.normal(jax.random.PRNGKey(10), (2, 16, 8))
        dist, idx = geometry.three_nn(unknown, known)
        assert dist.shape == (2, 64, 3)
        w = geometry.three_interpolate_weights(dist)
        np.testing.assert_allclose(np.sum(np.asarray(w), -1), 1.0, atol=1e-5)
        out = geometry.three_interpolate(feats, idx, w)
        assert out.shape == (2, 64, 8)
        # interpolating known points at known locations reproduces features
        dist2, idx2 = geometry.three_nn(known, known)
        w2 = geometry.three_interpolate_weights(dist2)
        out2 = geometry.three_interpolate(feats, idx2, w2)
        np.testing.assert_allclose(out2, feats, atol=1e-3)


class TestGraphFeature:
    def test_shape_and_content(self):
        x = clouds(jax.random.PRNGKey(11), b=2, n=32, c=6)
        f = geometry.get_graph_feature(x, k=4)
        assert f.shape == (2, 32, 4, 12)
        # nearest neighbor of a point is itself -> first neighbor feat == center feat
        np.testing.assert_allclose(f[..., 0, :6], np.asarray(x), atol=1e-6)
        np.testing.assert_allclose(f[..., 0, 6:], np.asarray(x), atol=1e-6)


class TestRRI:
    def test_matches_reference_numpy_spec(self):
        # independent numpy re-implementation of the documented spec
        rng = np.random.RandomState(0)
        pts = rng.randn(1, 40, 3).astype(np.float32)
        pts -= pts.mean(1, keepdims=True)
        k = 5
        out = np.asarray(geometry.get_rri(jnp.asarray(pts), k))[0]

        from scipy.spatial import cKDTree

        p0 = pts[0]
        kdt = cKDTree(p0)
        _, nbr = kdt.query(p0, k=k + 1)
        nbr = nbr[:, 1:]
        q = p0[nbr]
        p = np.repeat(p0[:, None], k, axis=1)
        rp = np.linalg.norm(p, axis=-1, keepdims=True)
        rq = np.linalg.norm(q, axis=-1, keepdims=True)
        pn, qn = p / rp, q / rq
        dot = np.sum(pn * qn, -1, keepdims=True)
        theta = np.arccos(np.clip(dot, -1, 1))
        T_q = q - dot * p
        sin_psi = np.sum(np.cross(T_q[:, None], T_q[:, :, None]) * pn[:, None], -1)
        cos_psi = np.sum(T_q[:, None] * T_q[:, :, None], -1)
        psi = np.arctan2(sin_psi, cos_psi) % (2 * np.pi)
        idx = np.argpartition(psi, 1)[:, :, 1:2]
        phi = np.take_along_axis(psi, idx, axis=-1)
        ref = np.concatenate([rp, rq, theta, phi], -1).reshape(-1, k * 4)
        np.testing.assert_allclose(out, ref, atol=1e-4)


class TestGrouping:
    def test_sample_and_group_shapes(self):
        x = clouds(jax.random.PRNGKey(12), b=2, n=128)
        feats = jax.random.normal(jax.random.PRNGKey(13), (2, 128, 16))
        new_xyz, new_points = grouping.sample_and_group(32, 0.5, 8, x, feats)
        assert new_xyz.shape == (2, 32, 3)
        assert new_points.shape == (2, 32, 8, 19)

    def test_sample_and_group_all(self):
        x = clouds(jax.random.PRNGKey(14), b=2, n=64)
        new_xyz, new_points = grouping.sample_and_group_all(x)
        assert new_xyz.shape == (2, 1, 3)
        assert new_points.shape == (2, 1, 64, 3)

    def test_multi_ppf_ranges(self):
        x = clouds(jax.random.PRNGKey(15), b=2, n=128)
        normals = x / jnp.linalg.norm(x, axis=-1, keepdims=True)
        out = grouping.sample_and_group_multi(32, 0.6, 8, x, normals)
        assert out["xyz"].shape == (2, 32, 3)
        assert out["dxyz"].shape == (2, 32, 8, 3)
        assert out["ppf"].shape == (2, 32, 8, 4)
        ppf = np.asarray(out["ppf"])
        assert np.all(ppf[..., :3] >= 0) and np.all(ppf[..., :3] <= np.pi + 1e-5)

    def test_density(self):
        x = clouds(jax.random.PRNGKey(16), b=1, n=64)
        dens = grouping.compute_density(x, 0.5)
        assert dens.shape == (1, 64)
        assert np.all(np.asarray(dens) > 0)


class TestTransforms:
    def test_samplers(self):
        from learning3d_tpu.ops import se3, transforms

        key = jax.random.PRNGKey(17)
        template = clouds(key, b=4, n=64)
        for fn in [
            transforms.pnlk_transform,
            transforms.dcp_transform,
            transforms.deepgmr_transform,
        ]:
            source, igt = fn(jax.random.PRNGKey(18), template)
            assert source.shape == template.shape
            assert igt.shape == (4, 4, 4)
            np.testing.assert_allclose(se3.transform(igt, template), source, atol=1e-4)
            # est_T = igt^{-1} maps source back
            np.testing.assert_allclose(
                se3.transform(se3.inverse(igt), source), template, atol=1e-4
            )

    def test_pose7(self):
        from learning3d_tpu.ops import se3, transforms

        template = clouds(jax.random.PRNGKey(19), b=4, n=64)
        pose = transforms.random_pose7(jax.random.PRNGKey(20), 4)
        source, igt = transforms.apply_pose7(pose, template)
        np.testing.assert_allclose(se3.transform(igt, template), source, atol=1e-4)

    def test_rpmnet_normals(self):
        from learning3d_tpu.ops import transforms

        xyz = clouds(jax.random.PRNGKey(21), b=2, n=32)
        nrm = xyz / jnp.linalg.norm(xyz, axis=-1, keepdims=True)
        pn = jnp.concatenate([xyz, nrm], -1)
        src, igt = transforms.rpmnet_transform(jax.random.PRNGKey(22), pn)
        # normals stay unit
        np.testing.assert_allclose(
            np.linalg.norm(np.asarray(src[..., 3:]), axis=-1), 1.0, atol=1e-4
        )
