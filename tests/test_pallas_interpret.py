"""Pallas kernel logic under interpret mode (CPU).

The real kernels only dispatch on TPU (tools/check_tpu_kernels.py validates
them on hardware); these tests run the same kernel bodies through the
Pallas TPU interpreter so the selection/gather/annealing logic is covered
by the CPU test suite too. Shapes are kept tiny — the interpreter is slow.
"""

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental.pallas import tpu as pltpu


def _interp():
    return pltpu.force_tpu_interpret_mode()


class TestInterpretKernels:
    def test_fps(self):
        from learning3d_tpu.kernels.sampling import fps_pallas

        B, N, P = 2, 256, 16
        xyz = jax.random.normal(jax.random.PRNGKey(0), (B, N, 3))
        with _interp():
            got = np.asarray(fps_pallas(xyz, P))
        # oracle: plain iterative FPS
        x = np.asarray(xyz)
        for b in range(B):
            dist = np.full(N, 1e10)
            cur = 0
            for j in range(P):
                assert got[b, j] == cur, (b, j)
                dist = np.minimum(dist, ((x[b] - x[b, cur]) ** 2).sum(-1))
                cur = int(np.argmax(dist))

    def test_ball_query(self):
        from learning3d_tpu.kernels.sampling import ball_query_pallas

        B, N, S, ns = 2, 200, 64, 8
        xyz = jax.random.normal(jax.random.PRNGKey(1), (B, N, 3))
        q = xyz[:, :S]
        with _interp():
            got = np.asarray(ball_query_pallas(0.5, ns, xyz, q, tile_s=64))
        x = np.asarray(xyz)
        for b in range(B):
            for s in range(0, S, 13):
                d = ((x[b] - x[b, s]) ** 2).sum(-1)
                inball = np.where(d <= 0.25)[0][:ns]
                assert np.array_equal(got[b, s, : len(inball)], inball)
                if len(inball) < ns:
                    assert np.all(got[b, s, len(inball):] == inball[0])

    def test_ball_group(self):
        from learning3d_tpu.kernels.sampling import ball_group_pallas
        from learning3d_tpu.ops.geometry import index_points
        from learning3d_tpu.ops.grouping import query_ball_point_excluding_self

        B, N, ns = 2, 200, 64  # ns * C = 384, a lane multiple
        k1, k2 = jax.random.split(jax.random.PRNGKey(2))
        xyz = jax.random.normal(k1, (B, N, 3))
        nrm = jax.random.normal(k2, (B, N, 3))
        itself = jnp.broadcast_to(jnp.arange(N, dtype=jnp.int32), (B, N))
        vals = jnp.concatenate([xyz, nrm], -1)
        with _interp():
            got = np.asarray(
                ball_group_pallas(0.6, ns, xyz, xyz, itself, vals, tile_s=64)
            )
        idx = query_ball_point_excluding_self(0.6, ns, xyz, xyz, itself)
        want = np.asarray(index_points(vals, idx))
        np.testing.assert_allclose(got, want, atol=1e-4)

    def test_knn(self):
        from learning3d_tpu.kernels.knn import knn_pallas

        B, S, N, k = 2, 64, 200, 5
        kq, kp = jax.random.split(jax.random.PRNGKey(3))
        q = jax.random.normal(kq, (B, S, 3))
        p = jax.random.normal(kp, (B, N, 3))
        with _interp():
            sq, idx = map(np.asarray, knn_pallas(q, p, k, tile_s=64))
        d = ((np.asarray(q)[:, :, None] - np.asarray(p)[:, None]) ** 2).sum(-1)
        idx_ref = np.argsort(d, axis=-1, kind="stable")[..., :k]
        np.testing.assert_array_equal(idx, idx_ref)
        np.testing.assert_allclose(sq, np.take_along_axis(d, idx_ref, -1), atol=1e-5)

    def test_knn_feature_space(self):
        """C > 3 path: MXU matmul distance expansion (PRNet dynamic graphs)."""
        from learning3d_tpu.kernels.knn import knn_pallas

        B, S, N, C, k = 2, 64, 200, 67, 5
        kq, kp = jax.random.split(jax.random.PRNGKey(4))
        q = jax.random.normal(kq, (B, S, C))
        p = jax.random.normal(kp, (B, N, C))
        with _interp():
            sq, idx = map(np.asarray, knn_pallas(q, p, k, tile_s=64))
        d = ((np.asarray(q)[:, :, None] - np.asarray(p)[:, None]) ** 2).sum(-1)
        idx_ref = np.argsort(d, axis=-1, kind="stable")[..., :k]
        np.testing.assert_array_equal(idx, idx_ref)
        np.testing.assert_allclose(sq, np.take_along_axis(d, idx_ref, -1), atol=1e-4)

    def test_dgcnn_fused_encoder(self):
        """Fused eval DGCNN (kNN + gather + folded-BN conv chain + kmax)
        vs the module's unfused path, f32 matmuls for exactness."""
        from flax import nnx

        from learning3d_tpu.kernels.dgcnn_fused import dgcnn_encode_fused
        from learning3d_tpu.models import DGCNN

        B, N, k = 2, 256, 5
        net = DGCNN(emb_dims=64, k=k, rngs=nnx.Rngs(0))
        net.eval()
        # non-trivial running stats so the BN folding is actually exercised
        for bn in net.bns:
            c = bn.mean[...].shape[0]
            bn.mean[...] = 0.1 * jnp.arange(c, dtype=jnp.float32) / c
            bn.var[...] = 1.0 + 0.5 * jnp.arange(c, dtype=jnp.float32) / c
        x = jax.random.normal(jax.random.PRNGKey(6), (B, N, 3))
        want = np.asarray(net(x))
        with _interp():
            got = np.asarray(
                dgcnn_encode_fused(x, net.convs, net.bns, k, dot_dtype=jnp.float32)
            )
        np.testing.assert_allclose(got, want, atol=2e-5, rtol=2e-5)

    def test_dgcnn_fused_encoder_approx_knn(self):
        """Quantized-key single-pass selection (approx_knn=True) vs the
        exact two-pass loop: on generic random clouds the 2^20-bucket
        quantization leaves the neighbor sets untouched, so the f32
        encoder outputs must match the exact kernel almost everywhere
        (near-tie flips are measure-zero at these sizes)."""
        from flax import nnx

        from learning3d_tpu.kernels.dgcnn_fused import dgcnn_encode_fused
        from learning3d_tpu.models import DGCNN

        B, N, k = 2, 256, 5
        net = DGCNN(emb_dims=64, k=k, rngs=nnx.Rngs(0))
        net.eval()
        x = jax.random.normal(jax.random.PRNGKey(11), (B, N, 3))
        with _interp():
            exact = np.asarray(
                dgcnn_encode_fused(x, net.convs, net.bns, k, dot_dtype=jnp.float32)
            )
            approx = np.asarray(
                dgcnn_encode_fused(
                    x, net.convs, net.bns, k, dot_dtype=jnp.float32, approx_knn=True
                )
            )
        rel = np.abs(approx - exact).mean() / np.abs(exact).mean()
        assert rel < 1e-3, rel
        # and point-wise: at most a handful of points may sit on a
        # quantization near-tie; everything else is bit-close
        per_point = np.abs(approx - exact).max(-1) / (np.abs(exact).max() + 1e-9)
        assert (per_point > 1e-4).mean() < 0.02, (per_point > 1e-4).mean()

    def test_dgcnn_fused_encoder_bf16(self):
        """bf16 compute path of the fused encoder (what the TPU runs)
        stays within the on-chip tolerance of the f32 chain."""
        from flax import nnx

        from learning3d_tpu.kernels.dgcnn_fused import dgcnn_encode_fused
        from learning3d_tpu.models import DGCNN

        B, N, k = 2, 256, 5
        net = DGCNN(emb_dims=64, k=k, rngs=nnx.Rngs(0))
        net.eval()
        x = jax.random.normal(jax.random.PRNGKey(7), (B, N, 3))
        want = np.asarray(net(x), np.float32)
        with _interp():
            got = np.asarray(
                dgcnn_encode_fused(x, net.convs, net.bns, k, dot_dtype=jnp.bfloat16),
                np.float32,
            )
        rel = np.abs(got - want).mean() / np.abs(want).mean()
        assert rel < 2e-2, rel

    def test_pointnet_fused_encoder(self):
        """Fused eval PointNet pooled encoder (folded-BN conv chain +
        relu/max-commuted pool) vs oracle_chain AND the module's unfused
        pooled_features path, f32 matmuls for exactness."""
        from flax import nnx

        from learning3d_tpu.kernels.pointnet_fused import (
            fold_conv_bn,
            oracle_chain,
            pointnet_pooled_kernel,
        )
        from learning3d_tpu.models import PointNet

        B, N = 3, 256  # B=3 exercises the bt=min(8,B) batch padding path
        net = PointNet(emb_dims=128, use_bn=True, rngs=nnx.Rngs(0))
        net.eval()
        for bn in net.bns:
            c = bn.mean[...].shape[0]
            bn.mean[...] = 0.1 * jnp.arange(c, dtype=jnp.float32) / c
            bn.var[...] = 1.0 + 0.5 * jnp.arange(c, dtype=jnp.float32) / c
        x = jax.random.normal(jax.random.PRNGKey(8), (B, N, 3))
        folded = [fold_conv_bn(c, bn) for c, bn in zip(net.convs, net.bns)]
        ws = [w for w, _ in folded]
        bs = [b for _, b in folded]
        with _interp():
            got = np.asarray(
                pointnet_pooled_kernel(x, ws, bs, dot_dtype=jnp.float32)
            )
        oracle = np.asarray(oracle_chain(x, ws, bs, jnp.float32))
        np.testing.assert_allclose(got, oracle, atol=2e-5, rtol=2e-5)
        unfused = np.asarray(net.pooled_features(x))  # CPU: unfused path
        np.testing.assert_allclose(got, unfused, atol=2e-4, rtol=2e-4)

    def test_pointnet_fused_encoder_bf16(self):
        """bf16 kernel (what the TPU serves) vs the f32 chain, and the
        custom-VJP gradients vs differentiating the unfused path."""
        from flax import nnx

        from learning3d_tpu.kernels.pointnet_fused import (
            fold_conv_bn,
            oracle_chain,
            pointnet_pooled_kernel,
        )
        from learning3d_tpu.models import PointNet

        B, N = 2, 256
        net = PointNet(emb_dims=128, use_bn=True, rngs=nnx.Rngs(0))
        net.eval()
        x = jax.random.normal(jax.random.PRNGKey(9), (B, N, 3))
        folded = [fold_conv_bn(c, bn) for c, bn in zip(net.convs, net.bns)]
        ws = [w for w, _ in folded]
        bs = [b for _, b in folded]
        want = np.asarray(oracle_chain(x, ws, bs, jnp.float32), np.float32)
        with _interp():
            got = np.asarray(
                pointnet_pooled_kernel(x, ws, bs, dot_dtype=jnp.bfloat16), np.float32
            )
        rel = np.abs(got - want).mean() / np.abs(want).mean()
        assert rel < 2e-2, rel
        # the public custom-VJP entry recomputes oracle_chain in bf16:
        # its grads must match differentiating oracle_chain directly
        from learning3d_tpu.kernels.pointnet_fused import _fused_bf16

        g_or = jax.grad(lambda x: jnp.sum(oracle_chain(x, ws, bs, jnp.bfloat16).astype(jnp.float32)))(x)
        with _interp():
            g_k = jax.grad(
                lambda x: jnp.sum(_fused_bf16(x, tuple(ws), tuple(bs)).astype(jnp.float32))
            )(x)
        np.testing.assert_allclose(np.asarray(g_k), np.asarray(g_or), atol=1e-5)

    def test_dgcnn_fused_int8(self):
        """int8 serving variant of the fused DGCNN encoder vs the float
        module: calibrated static scales, int8 one-hot gathers, folded
        stage scales in w5. PTQ tolerance, not exactness."""
        from flax import nnx

        from learning3d_tpu.kernels.dgcnn_fused import (
            calibrate_dgcnn_int8,
            dgcnn_encode_fused_int8,
        )
        from learning3d_tpu.models import DGCNN

        B, N, k = 2, 256, 5
        net = DGCNN(emb_dims=64, k=k, rngs=nnx.Rngs(0))
        net.eval()
        x = jax.random.normal(jax.random.PRNGKey(13), (B, N, 3))
        want = np.asarray(net(x), np.float32)
        scales = calibrate_dgcnn_int8(net.convs, net.bns, k, x)
        with _interp():
            got = np.asarray(
                dgcnn_encode_fused_int8(x, net.convs, net.bns, k, scales),
                np.float32,
            )
        rel = np.abs(got - want).mean() / np.abs(want).mean()
        assert rel < 0.06, rel

    def test_dgcnn_fused_int8_approx_knn(self):
        """Quantized-key selection inside the int8 kernel vs its exact
        selection: identical int8 math downstream, so outputs must agree
        except at measure-zero quantization near-ties."""
        from flax import nnx

        from learning3d_tpu.kernels.dgcnn_fused import (
            calibrate_dgcnn_int8,
            dgcnn_encode_fused_int8,
        )
        from learning3d_tpu.models import DGCNN

        B, N, k = 2, 256, 5
        net = DGCNN(emb_dims=64, k=k, rngs=nnx.Rngs(0))
        net.eval()
        x = jax.random.normal(jax.random.PRNGKey(17), (B, N, 3))
        scales = calibrate_dgcnn_int8(net.convs, net.bns, k, x)
        with _interp():
            exact = np.asarray(
                dgcnn_encode_fused_int8(x, net.convs, net.bns, k, scales),
                np.float32,
            )
            approx = np.asarray(
                dgcnn_encode_fused_int8(
                    x, net.convs, net.bns, k, scales, approx_knn=True
                ),
                np.float32,
            )
        rel = np.abs(approx - exact).mean() / (np.abs(exact).mean() + 1e-9)
        assert rel < 1e-3, rel
        per_point = np.abs(approx - exact).max(-1) / (np.abs(exact).max() + 1e-9)
        assert (per_point > 1e-4).mean() < 0.02, (per_point > 1e-4).mean()

    def test_edgeconv_neighbors(self):
        """knn_neighbors_pallas (fused kNN + coordinate gather) vs brute
        force, incl. the 2-pass selection restructure (round 3)."""
        from learning3d_tpu.kernels.edgeconv import knn_neighbors_pallas

        B, N, k = 2, 200, 5
        x = jax.random.normal(jax.random.PRNGKey(12), (B, N, 3))
        with _interp():
            got = np.asarray(knn_neighbors_pallas(x, k, tile_n=128))
        xs = np.asarray(x)
        d = ((xs[:, :, None] - xs[:, None]) ** 2).sum(-1)
        idx = np.argsort(d, axis=-1, kind="stable")[..., :k]
        want = np.take_along_axis(xs[:, None], idx[..., None], axis=2)
        np.testing.assert_allclose(got, want, atol=1e-4)

    def test_attention_kernel(self):
        """Lean fused pointer attention (kernels/attention.py) vs the
        identical-math oracle, incl. ragged M padding and the VJP."""
        from learning3d_tpu.kernels.attention import (
            attention_oracle,
            attention_pallas,
        )

        B, H, N, M, D = 2, 2, 256, 200, 128  # M=200 exercises key padding
        kq, kk, kv = jax.random.split(jax.random.PRNGKey(10), 3)
        q = jax.random.normal(kq, (B, H, N, D))
        k = jax.random.normal(kk, (B, H, M, D))
        v = jax.random.normal(kv, (B, H, M, D))
        want = np.asarray(attention_oracle(q, k, v), np.float32)
        with _interp():
            got = np.asarray(attention_pallas(q, k, v), np.float32)
        rel = np.abs(got - want).mean() / np.abs(want).mean()
        assert rel < 5e-3, rel
        # separate value dim (SVD-head use: xyz values, Dv=3)
        v3 = jax.random.normal(kv, (B, H, M, 3))
        want3 = np.asarray(attention_oracle(q, k, v3), np.float32)
        with _interp():
            got3 = np.asarray(attention_pallas(q, k, v3), np.float32)
        rel3 = np.abs(got3 - want3).mean() / np.abs(want3).mean()
        assert rel3 < 5e-3, rel3

    def test_attention_fused_grads_match_oracle(self):
        from learning3d_tpu.kernels.attention import (
            attention_fused,
            attention_oracle,
        )

        B, H, N, D = 1, 2, 256, 128
        kq, kk, kv = jax.random.split(jax.random.PRNGKey(11), 3)
        q = jax.random.normal(kq, (B, H, N, D))
        k = jax.random.normal(kk, (B, H, N, D))
        v = jax.random.normal(kv, (B, H, N, D))
        g_or = jax.grad(lambda q, k, v: jnp.sum(attention_oracle(q, k, v)), (0, 1, 2))(q, k, v)
        with _interp():
            g_f = jax.grad(lambda q, k, v: jnp.sum(attention_fused(q, k, v)), (0, 1, 2))(q, k, v)
        for a, b in zip(g_f, g_or):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)

    def test_sinkhorn(self):
        from learning3d_tpu.kernels.sinkhorn import sinkhorn_log_pallas
        from learning3d_tpu.utils.rigid import sinkhorn_log

        la = jax.random.normal(jax.random.PRNGKey(5), (2, 100, 120))
        want = np.asarray(sinkhorn_log(la, n_iters=5, slack=True))
        with _interp():
            got = np.asarray(sinkhorn_log_pallas(la, n_iters=5))
        np.testing.assert_allclose(got, want, atol=1e-5)

    def test_emd(self):
        from learning3d_tpu.kernels.emd import _emd_fwd_impl, _emd_fwd_pallas

        B, N, M = 1, 128, 128
        k1, k2 = jax.random.split(jax.random.PRNGKey(4))
        x = jax.random.normal(k1, (B, N, 3))
        y = jax.random.normal(k2, (B, M, 3))
        c0, g10, g20 = map(np.asarray, _emd_fwd_impl(x, y))
        with _interp():
            c1, g11, g21 = map(np.asarray, _emd_fwd_pallas(x, y, chunk=128))
        np.testing.assert_allclose(c1, c0, rtol=1e-4)
        # pointwise grads legitimately differ at summation-order bifurcations
        assert np.abs(g11 - g10).mean() / np.abs(g10).mean() < 0.05
        assert np.abs(g21 - g20).mean() / np.abs(g20).mean() < 0.05
