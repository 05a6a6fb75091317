"""Model forward smoke + contract tests (shapes, result-dict keys,
finiteness, and registration sanity on easy cases). Small sizes: this
suite runs on the CPU fake backend."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import nnx

from learning3d_tpu import models
from learning3d_tpu.ops import se3

B, N = 2, 64
REG_KEYS = {"est_R", "est_t", "est_T", "transformed_source"}


def clouds(seed=0, n=N, c=3):
    return jax.random.normal(jax.random.PRNGKey(seed), (B, n, c))


def check_reg_result(result, n=N):
    assert REG_KEYS <= set(result)
    assert result["est_R"].shape == (B, 3, 3)
    assert result["est_t"].shape == (B, 3)
    assert result["est_T"].shape == (B, 4, 4)
    assert result["transformed_source"].shape == (B, n, 3)
    for k in REG_KEYS:
        assert np.all(np.isfinite(np.asarray(result[k]))), k
    # est_R orthonormality
    R = np.asarray(result["est_R"])
    np.testing.assert_allclose(
        R @ R.transpose(0, 2, 1), np.tile(np.eye(3), (B, 1, 1)), atol=1e-3
    )
    np.testing.assert_allclose(np.linalg.det(R), 1.0, atol=1e-3)


class TestEncoders:
    def test_pointnet_shapes(self):
        pn = models.PointNet(emb_dims=128, use_bn=True, rngs=nnx.Rngs(0))
        out = pn(clouds())
        assert out.shape == (B, N, 128)
        pn_seg = models.PointNet(emb_dims=128, use_bn=True, global_feat=False, rngs=nnx.Rngs(0))
        out = pn_seg(clouds())
        assert out.shape == (B, N, 128 + 64)

    def test_pointnet_bcn(self):
        pn = models.PointNet(emb_dims=64, input_shape="bcn", rngs=nnx.Rngs(0))
        out = pn(jnp.swapaxes(clouds(), 1, 2))
        assert out.shape == (B, N, 64)

    def test_dgcnn(self):
        m = models.DGCNN(emb_dims=96, k=8, rngs=nnx.Rngs(0))
        out = m(clouds())
        assert out.shape == (B, N, 96)

    def test_ppfnet(self):
        m = models.PPFNet(emb_dims=32, num_neighbors=8, rngs=nnx.Rngs(0))
        xyz = clouds()
        normals = xyz / jnp.linalg.norm(xyz, axis=-1, keepdims=True)
        out = m(xyz, normals)
        assert out.shape == (B, N, 32)
        np.testing.assert_allclose(np.linalg.norm(np.asarray(out), axis=-1), 1.0, atol=1e-4)


class TestHeads:
    def test_classifier(self):
        pn = models.PointNet(emb_dims=128, use_bn=True, rngs=nnx.Rngs(0))
        clf = models.Classifier(pn, num_classes=40, rngs=nnx.Rngs(1))
        out = clf(clouds())
        assert out.shape == (B, 40)

    def test_segmentation(self):
        pn = models.PointNet(emb_dims=128, use_bn=True, global_feat=False, rngs=nnx.Rngs(0))
        seg = models.Segmentation(pn, num_classes=40, rngs=nnx.Rngs(1))
        out = seg(clouds())
        assert out.shape == (B, N, 40)


class TestRegistration:
    def test_dcp_contract(self):
        dg = models.DGCNN(emb_dims=64, k=8, rngs=nnx.Rngs(0))
        dcp = models.DCP(dg, rngs=nnx.Rngs(1))
        dcp.eval()
        result = dcp(clouds(0), clouds(1))
        check_reg_result(result)
        assert "r" in result

    def test_svd_head_recovers_transform(self):
        # near-one-hot correspondences on a rigidly transformed cloud:
        # the head must recover the exact transform.
        from learning3d_tpu.utils.svd import SVDHead

        src = clouds(3)
        igt = se3.exp(0.5 * jax.random.normal(jax.random.PRNGKey(30), (B, 6)))
        tgt = se3.transform(igt, src)
        # embeddings whose pairwise dots make the true correspondence
        # dominate the softmax
        emb = 40.0 * jax.random.normal(jax.random.PRNGKey(31), (B, N, 32))
        R, t, _ = SVDHead(32)(emb, emb, src, tgt)
        np.testing.assert_allclose(R, np.asarray(igt[:, :3, :3]), atol=1e-3)
        np.testing.assert_allclose(t, np.asarray(igt[:, :3, 3]), atol=1e-3)

    def test_ipcrnet_contract(self):
        pn = models.PointNet(emb_dims=128, rngs=nnx.Rngs(0))
        net = models.iPCRNet(pn, rngs=nnx.Rngs(1))
        net.eval()
        result = net(clouds(0), clouds(1), max_iteration=2)
        check_reg_result(result)

    def test_pointnetlk_contract_and_series(self):
        pn = models.PointNet(emb_dims=64, use_bn=True, rngs=nnx.Rngs(0))
        net = models.PointNetLK(pn, damping=1e-4)
        net.eval()
        result = net(clouds(0), clouds(1), maxiter=3)
        check_reg_result(result)
        assert result["est_T_series"].shape == (4, B, 4, 4)
        assert result["r"].shape == (B, 64)

    def test_pointnetlk_converges_on_small_transform(self):
        pn = models.PointNet(emb_dims=64, rngs=nnx.Rngs(0))
        net = models.PointNetLK(pn, damping=1e-5)
        net.eval()
        template = clouds(5, n=128)
        igt = se3.exp(0.05 * jax.random.normal(jax.random.PRNGKey(9), (B, 6)))
        source = se3.transform(igt, template)
        result = net(template, source, maxiter=10)
        # est_T should invert igt (a random untrained encoder still gives
        # a usable LK signal for tiny transforms)
        err = np.asarray(result["est_T"] @ igt - jnp.eye(4))
        assert np.abs(err).max() < 0.2

    def test_rpmnet_contract(self):
        net = models.RPMNet(
            models.PPFNet(emb_dims=32, num_neighbors=8, rngs=nnx.Rngs(0)), rngs=nnx.Rngs(1)
        )
        net.eval()
        xyz = clouds(0)
        normals = xyz / jnp.linalg.norm(xyz, axis=-1, keepdims=True)
        template = jnp.concatenate([xyz, normals], -1)
        source = jnp.concatenate([clouds(1), normals], -1)
        result = net(template, source, max_iterations=2)
        check_reg_result(result)
        assert len(result["transforms"]) == 2
        # permutation matrices near doubly stochastic (rows/cols <= 1)
        perm = np.asarray(result["perm_matrices"][0])
        assert perm.sum(-1).max() <= 1.01 and perm.sum(-2).max() <= 1.01

    def test_iteration_defaults_are_instance_attrs(self):
        """RPMNet/iPCRNet read their refinement count from an instance
        attr when the call site omits it (the evaluate.py --num_iters
        serving-time knob): the default matches passing the documented
        recipe count explicitly (RPMNet's is 2 — a deliberate deviation
        from the reference forward's 1, models/rpmnet.py), and overriding
        the attr matches passing the override explicitly."""
        net = models.RPMNet(
            models.PPFNet(emb_dims=32, num_neighbors=8, rngs=nnx.Rngs(0)), rngs=nnx.Rngs(1)
        )
        net.eval()
        xyz = clouds(0)
        normals = xyz / jnp.linalg.norm(xyz, axis=-1, keepdims=True)
        template = jnp.concatenate([xyz, normals], -1)
        source = jnp.concatenate([clouds(1), normals], -1)
        np.testing.assert_array_equal(
            net(template, source)["est_T"],
            net(template, source, max_iterations=2)["est_T"],
        )
        net.default_iterations = 1
        np.testing.assert_array_equal(
            net(template, source)["est_T"],
            net(template, source, max_iterations=1)["est_T"],
        )

        pn = models.PointNet(emb_dims=32, rngs=nnx.Rngs(0))
        ipcr = models.iPCRNet(pn, rngs=nnx.Rngs(1))
        ipcr.eval()
        t, s = clouds(0), clouds(1)
        np.testing.assert_array_equal(
            ipcr(t, s)["est_T"], ipcr(t, s, max_iteration=8)["est_T"]
        )
        ipcr.default_iterations = 2
        np.testing.assert_array_equal(
            ipcr(t, s)["est_T"], ipcr(t, s, max_iteration=2)["est_T"]
        )

    def test_deepgmr_contract(self):
        net = models.DeepGMR(use_rri=False, d_model=64, n_clusters=8, rngs=nnx.Rngs(0))
        net.eval()
        result = net(clouds(0), clouds(1))
        check_reg_result(result)
        assert "est_T_inverse" in result

    def test_deepgmr_on_device_rri_matches_host_path(self):
        """use_rri DeepGMR fed raw (B, N, 3) computes RRI inside the
        forward (TPU-native path) and must match the reference dataloader
        contract of precomputed host RRI appended to the xyz columns."""
        import numpy as np

        from learning3d_tpu.data.dataloaders import get_rri_numpy

        k = 6
        net = models.DeepGMR(
            use_rri=True, nearest_neighbors=k, d_model=64, n_clusters=8,
            rngs=nnx.Rngs(0),
        )
        net.eval()
        t, s = clouds(0), clouds(1)
        feats = []
        for cloud in (t, s):
            f = np.stack(
                [
                    get_rri_numpy(np.asarray(c) - np.asarray(c).mean(0), k)
                    for c in cloud
                ]
            )
            feats.append(jnp.concatenate([cloud, jnp.asarray(f)], -1))
        out_dev = net(t, s)
        out_host = net(feats[0], feats[1])
        np.testing.assert_allclose(
            np.asarray(out_dev["est_T"]), np.asarray(out_host["est_T"]), atol=2e-5
        )

    def test_prnet_contract_and_loss(self):
        net = models.PRNet(
            emb_dims=64, num_keypoints=32, num_subsampled_points=48, num_iters=2,
            rngs=nnx.Rngs(0),
        )
        net.eval()
        src, tgt = clouds(0, n=48), clouds(1, n=48)
        result = net(src, tgt)
        check_reg_result(result, n=48)
        igt = se3.exp(0.3 * jax.random.normal(jax.random.PRNGKey(2), (B, 6)))
        result = net(src, tgt, igt=se3.inverse(igt))
        assert np.isfinite(float(result["loss"]))

    def test_prnet_dgcnn_eval_fast_path_matches_edge_tensor(self):
        """Eval-mode EdgeConv collapses BN+lrelu+max to a per-channel
        monotone reduction; pin it against the naive (B,N,k,2C) path."""
        from learning3d_tpu.models.prnet import PRDGCNN, _lrelu
        from learning3d_tpu.ops.geometry import get_graph_feature

        enc = PRDGCNN(emb_dims=32, k=8, rngs=nnx.Rngs(0))
        x = clouds(3, n=40)
        enc.train()
        _ = enc(x)  # populate running stats away from init
        # make some BN scales negative to exercise the min branch
        for bn in enc.bns:
            s = np.array(bn.scale.value)
            s[::2] = -0.7
            bn.scale.value = jnp.asarray(s)
        enc.eval()
        got = enc(x)

        # naive reference: full (B, N, k, 2C) edge tensor through
        # eval-mode BN + lrelu, max over k — the reference formulation
        h = x
        outs = []
        for conv, bn in zip(enc.convs[:4], enc.bns[:4]):
            e = get_graph_feature(h, k=enc.k)
            h = jnp.max(_lrelu(bn(conv(e))), axis=2)
            outs.append(h)
        cat = jnp.concatenate(outs, axis=-1)
        want = _lrelu(enc.bns[4](enc.convs[4](cat)))
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


class TestOther:
    def test_pcn(self):
        net = models.PCN(emb_dims=256, num_coarse=128, detailed_output=True, rngs=nnx.Rngs(0))
        result = net(clouds())
        assert result["coarse_output"].shape == (B, 128, 3)
        assert result["fine_output"].shape == (B, 128 * 16, 3)

    def test_pcn_task_trains_fine_decoder(self):
        # With the folding decoder on, the pcn task's loss must include
        # the fine stage (else the decoder never trains) and its grads
        # must reach conv5-7; the coarse-only recipe stays the reference
        # chamfer-on-coarse (train_pcn.py:58).
        from flax import nnx as _nnx

        from learning3d_tpu.train import tasks

        pts = clouds()
        key = jax.random.PRNGKey(0)
        net = models.PCN(emb_dims=256, num_coarse=128, detailed_output=True, rngs=nnx.Rngs(0))
        loss, aux = tasks.pcn(net, (pts,), key)
        assert set(aux) == {"chamfer_coarse", "chamfer_fine"}
        np.testing.assert_allclose(
            float(loss), float(aux["chamfer_coarse"] + aux["chamfer_fine"]), rtol=1e-6
        )
        g = _nnx.grad(lambda m: tasks.pcn(m, (pts,), key)[0])(net)
        fine_g = np.abs(np.asarray(g["conv7"]["kernel"][...])).max()
        assert np.isfinite(fine_g) and fine_g > 0

        coarse_net = models.PCN(emb_dims=256, num_coarse=128, rngs=nnx.Rngs(0))
        loss_c, aux_c = tasks.pcn(coarse_net, (pts,), key)
        assert set(aux_c) == {"chamfer_coarse"}
        np.testing.assert_allclose(float(loss_c), float(aux_c["chamfer_coarse"]), rtol=1e-6)

    def test_masknet(self):
        pn = models.PointNet(emb_dims=128, use_bn=True, rngs=nnx.Rngs(0))
        net = models.MaskNet(pn, rngs=nnx.Rngs(1))
        net.eval()
        template, source = clouds(0), clouds(1, n=48)
        masked_template, mask = net(template, source)
        assert masked_template.shape == (B, 48, 3)
        assert mask.shape == (B, N)
        assert np.all((np.asarray(mask) >= 0) & (np.asarray(mask) <= 1))

    def test_masknet2(self):
        net = models.MaskNet2(rngs=nnx.Rngs(0))
        net.eval()
        tm, sm = net(clouds(0), clouds(1, n=48))
        assert tm.shape == (B, N)
        assert sm.shape == (B, 48)

    def test_jit_compiles_classifier(self):
        pn = models.PointNet(emb_dims=64, use_bn=True, rngs=nnx.Rngs(0))
        clf = models.Classifier(pn, rngs=nnx.Rngs(1))
        clf.eval()

        @nnx.jit
        def fwd(model, x):
            return model(x)

        out = fwd(clf, clouds())
        assert out.shape == (B, 40)
