"""Golden-value parity vs the PyTorch reference (SURVEY.md §4).

The reference package at /root/reference is imported as a behavioral
oracle: its state_dict is installed into our models through the public
torch-checkpoint importer (learning3d_tpu/utils/torch_import.py) and
forward outputs compared. This doubles as the importer's end-to-end test
for every supported architecture. Skipped automatically when the
reference checkout or torch is unavailable.
"""

import sys

import numpy as np
import pytest

import jax.numpy as jnp
from flax import nnx

torch = pytest.importorskip("torch")
sys.path.insert(0, "/root")
ref_models = pytest.importorskip("reference.models")

from learning3d_tpu import models  # noqa: E402
from learning3d_tpu.utils.torch_import import import_torch_state_dict  # noqa: E402

B, N = 2, 64


def t2j(t):
    return jnp.asarray(t.detach().numpy())


def install(mine, tref, **kw):
    """Install the torch reference's weights via the public importer.
    strict=True also proves every checkpoint tensor was consumed."""
    return import_torch_state_dict(mine, tref.state_dict(), **kw)


def rand_cloud(seed=0):
    torch.manual_seed(seed)
    return torch.randn(B, N, 3)


class TestPointNetParity:
    @pytest.mark.parametrize("use_bn", [False, True])
    def test_forward_matches(self, use_bn):
        tref = ref_models.PointNet(emb_dims=96, use_bn=use_bn, global_feat=True)
        tref.eval()
        mine = models.PointNet(emb_dims=96, use_bn=use_bn, rngs=nnx.Rngs(0))
        mine.eval()
        install(mine, tref)
        x = rand_cloud()
        ref_out = tref(x).detach().numpy()  # (B, emb, N)
        my_out = np.asarray(mine(t2j(x)))  # (B, N, emb)
        np.testing.assert_allclose(my_out.transpose(0, 2, 1), ref_out, atol=2e-5)

    def test_segmentation_variant_matches(self):
        tref = ref_models.PointNet(emb_dims=96, use_bn=True, global_feat=False)
        tref.eval()
        mine = models.PointNet(emb_dims=96, use_bn=True, global_feat=False, rngs=nnx.Rngs(0))
        mine.eval()
        install(mine, tref)
        x = rand_cloud(1)
        ref_out = tref(x).detach().numpy()  # (B, emb+64, N)
        my_out = np.asarray(mine(t2j(x)))
        np.testing.assert_allclose(my_out.transpose(0, 2, 1), ref_out, atol=2e-5)


class TestDGCNNParity:
    def test_forward_matches(self):
        tref = ref_models.DGCNN(emb_dims=64)
        tref.eval()
        mine = models.DGCNN(emb_dims=64, rngs=nnx.Rngs(0))
        mine.eval()
        install(mine, tref)
        x = rand_cloud(2)
        ref_out = tref(x).detach().numpy()  # (B, emb, N)
        my_out = np.asarray(mine(t2j(x)))
        np.testing.assert_allclose(my_out.transpose(0, 2, 1), ref_out, atol=5e-5)


class TestClassifierParity:
    def test_logits_match(self):
        tpn = ref_models.PointNet(emb_dims=96, use_bn=True)
        tref = ref_models.Classifier(feature_model=tpn, num_classes=40)
        tref.eval()
        mpn = models.PointNet(emb_dims=96, use_bn=True, rngs=nnx.Rngs(0))
        mine = models.Classifier(mpn, num_classes=40, rngs=nnx.Rngs(1))
        mine.eval()
        install(mine, tref)
        x = rand_cloud(3)
        ref_out = tref(x).detach().numpy()
        my_out = np.asarray(mine(t2j(x)))
        np.testing.assert_allclose(my_out, ref_out, atol=5e-5)


class TestLossParity:
    def test_chamfer_matches_reference_fallback(self):
        from reference.losses.chamfer_distance import chamfer as ref_chamfer

        from learning3d_tpu.losses import losses

        torch.manual_seed(4)
        a = torch.randn(B, N, 3)
        b = torch.randn(B, 48, 3)
        ref_val = float(ref_chamfer(a, b))
        my_val = float(losses.chamfer_distance_loss(t2j(a), t2j(b)))
        np.testing.assert_allclose(my_val, ref_val, atol=1e-5)

    def test_frobenius_matches(self):
        from reference.losses.frobenius_norm import frobeniusNormLoss

        from learning3d_tpu.losses import losses
        from learning3d_tpu.ops import se3

        import jax

        g = se3.exp(0.3 * jax.random.normal(jax.random.PRNGKey(0), (4, 6)))
        pred = se3.exp(0.2 * jax.random.normal(jax.random.PRNGKey(1), (4, 6)))
        ref_val = float(
            frobeniusNormLoss(torch.tensor(np.asarray(pred)), torch.tensor(np.asarray(g)))
        )
        my_val = float(losses.frobenius_norm_loss(pred, g))
        np.testing.assert_allclose(my_val, ref_val, rtol=1e-4)


class TestOpsParity:
    def test_se3_exp_matches_reference(self):
        from reference.ops import se3 as ref_se3

        from learning3d_tpu.ops import se3

        torch.manual_seed(5)
        x = torch.randn(8, 6)
        ref_g = ref_se3.exp(x).detach().numpy()
        my_g = np.asarray(se3.exp(t2j(x)))
        np.testing.assert_allclose(my_g, ref_g, atol=1e-5)

    def test_so3_exp_matches_reference(self):
        from reference.ops import so3 as ref_so3

        from learning3d_tpu.ops import so3

        torch.manual_seed(6)
        w = torch.randn(8, 3)
        np.testing.assert_allclose(
            np.asarray(so3.exp(t2j(w))), ref_so3.exp(w).detach().numpy(), atol=1e-5
        )

    @pytest.mark.parametrize("order", ["xyz", "yzx", "zxy", "xzy", "yxz", "zyx"])
    def test_qeuler_all_orders_match_reference(self, order):
        """All 6 intrinsic orders + epsilon clamp (reference
        ops/quaternion.py:56-100)."""
        from reference.ops import quaternion as ref_quat

        from learning3d_tpu.ops import quaternion as quat

        torch.manual_seed(7)
        q = torch.nn.functional.normalize(torch.randn(64, 4), dim=-1)
        for epsilon in (0.0, 1e-3):
            ref_e = ref_quat.qeuler(q, order, epsilon=epsilon).numpy()
            my_e = np.asarray(quat.qeuler(t2j(q), order, epsilon=epsilon))
            np.testing.assert_allclose(my_e, ref_e, atol=2e-5)

    @pytest.mark.parametrize("order", ["xyz", "yzx", "zxy", "xzy", "yxz", "zyx"])
    def test_euler_to_quaternion_matches_reference(self, order):
        """Axis-name angle convention + antipodal sign flip
        (reference ops/transform_functions.py:62-106)."""
        from reference.ops import transform_functions as ref_tf

        from learning3d_tpu.ops import quaternion as quat

        e = np.random.RandomState(9).uniform(-0.8, 0.8, (16, 3))
        ref_q = ref_tf.euler_to_quaternion(e, order)
        my_q = np.asarray(quat.euler_to_quaternion(e, order))
        np.testing.assert_allclose(my_q, ref_q, atol=1e-7)

    def test_qeuler_gimbal_epsilon_clamp(self):
        """epsilon keeps the asin argument off exactly +-1 at gimbal lock."""
        from reference.ops import quaternion as ref_quat

        from learning3d_tpu.ops import quaternion as quat

        # 90-degree y rotation: zyx asin term hits 1 exactly
        q = torch.tensor([[np.cos(np.pi / 4), 0.0, np.sin(np.pi / 4), 0.0]])
        ref_e = ref_quat.qeuler(q, "zyx", epsilon=1e-4).numpy()
        my_e = np.asarray(quat.qeuler(t2j(q), "zyx", epsilon=1e-4))
        np.testing.assert_allclose(my_e, ref_e, atol=1e-5)


class TestPCNParity:
    def test_coarse_output_matches(self):
        tref = ref_models.PCN(emb_dims=128, num_coarse=64, detailed_output=False)
        tref.eval()
        mine = models.PCN(emb_dims=128, num_coarse=64, rngs=nnx.Rngs(0))
        install(mine, tref)
        x = rand_cloud(7)
        ref_out = tref(x)["coarse_output"].detach().numpy()
        my_out = np.asarray(mine(t2j(x))["coarse_output"])
        np.testing.assert_allclose(my_out, ref_out, atol=2e-5)

    def test_detailed_output_matches(self):
        # emb_dims must be 1024: the reference folding decoder hardcodes
        # its 1029-channel input (pcn.py:71), a latent bug for other sizes.
        tref = ref_models.PCN(emb_dims=1024, num_coarse=64, detailed_output=True, grid_size=2)
        tref.eval()
        mine = models.PCN(
            emb_dims=1024, num_coarse=64, detailed_output=True, grid_size=2, rngs=nnx.Rngs(0)
        )
        install(mine, tref)
        x = rand_cloud(7)
        ref_out = tref(x)["fine_output"].detach().numpy()
        my_out = np.asarray(mine(t2j(x))["fine_output"])
        np.testing.assert_allclose(my_out, ref_out, atol=5e-5)


class TestiPCRNetParity:
    def test_forward_matches(self):
        tpn = ref_models.PointNet(emb_dims=96, use_bn=False)
        tref = ref_models.iPCRNet(feature_model=tpn)
        tref.eval()
        mpn = models.PointNet(emb_dims=96, use_bn=False, rngs=nnx.Rngs(0))
        mine = models.iPCRNet(mpn, rngs=nnx.Rngs(1))
        mine.eval()
        install(mine, tref)
        template, source = rand_cloud(8), rand_cloud(9)
        ref_out = tref(template, source, max_iteration=3)
        my_out = mine(t2j(template), t2j(source), max_iteration=3)
        np.testing.assert_allclose(
            np.asarray(my_out["est_T"]), ref_out["est_T"].detach().numpy(), atol=1e-4
        )
        np.testing.assert_allclose(
            np.asarray(my_out["transformed_source"]),
            ref_out["transformed_source"].detach().numpy(),
            atol=1e-4,
        )


class TestPointNetLKParity:
    def test_iclk_chain_matches(self):
        """Validates the whole IC-LK chain (finite-difference Jacobian,
        pinv, exp-compose updates) against the reference. Clouds are
        pre-zero-meaned: the reference's mean_shift has a latent bug in the
        source branch (ops/data_utils.py:19) that we fixed, so parity holds
        on the zero-mean path where the bug is dormant."""
        tpn = ref_models.PointNet(emb_dims=64, use_bn=False)
        tref = ref_models.PointNetLK(feature_model=tpn, delta=1e-2, xtol=1e-12)
        tref.eval()
        mpn = models.PointNet(emb_dims=64, use_bn=False, rngs=nnx.Rngs(0))
        mine = models.PointNetLK(mpn, delta=1e-2, xtol=1e-12, damping=0.0)
        mine.eval()
        install(mine, tref)

        torch.manual_seed(11)
        template = torch.randn(B, N, 3)
        template = template - template.mean(1, keepdim=True)
        # small rigid transform, applied so means stay ~0
        import jax as _jax

        from learning3d_tpu.ops import se3 as my_se3

        igt = my_se3.exp(0.05 * _jax.random.normal(_jax.random.PRNGKey(3), (B, 6)))
        source_j = my_se3.transform(igt, t2j(template))
        source_j = source_j - source_j.mean(1, keepdims=True)
        source = torch.tensor(np.asarray(source_j))

        ref_out = tref(template, source, maxiter=5)
        my_out = mine(t2j(template), t2j(source), maxiter=5)
        np.testing.assert_allclose(
            np.asarray(my_out["est_T"]), ref_out["est_T"].detach().numpy(), atol=5e-4
        )


class TestDCPParity:
    def test_full_dcp_matches(self):
        """Full DCP: DGCNN + co-attention Transformer + SVD head vs the
        reference with identical weights (installed via the importer)."""
        E = 64
        tdg = ref_models.DGCNN(emb_dims=E)
        tref = ref_models.DCP(feature_model=tdg, cycle=False, pointer_="transformer", head="svd")
        tref.eval()
        mdg = models.DGCNN(emb_dims=E, rngs=nnx.Rngs(0))
        mine = models.DCP(mdg, cycle=False, pointer_="transformer", head="svd", rngs=nnx.Rngs(1))
        mine.eval()
        install(mine, tref)
        template, source = rand_cloud(12), rand_cloud(13)
        ref_out = tref(template, source)
        my_out = mine(t2j(template), t2j(source))
        np.testing.assert_allclose(
            np.asarray(my_out["est_R"]), ref_out["est_R"].detach().numpy(), atol=2e-3
        )
        np.testing.assert_allclose(
            np.asarray(my_out["est_t"]), ref_out["est_t"].detach().numpy(), atol=2e-3
        )

    def test_mlp_head_matches(self):
        # reference dcp.py:82 calls quat2mat without defining or importing
        # it (latent bug) — the torch oracle cannot execute as shipped.
        # Complete it with the Hamilton (w,x,y,z) convention our MLPHead
        # documents, so the test pins the weight transport + MLP math.
        import reference.models.dcp as ref_dcp

        def _quat2mat_wxyz(q):
            w, x, y, z = q[:, 0], q[:, 1], q[:, 2], q[:, 3]
            B = q.size(0)
            w2, x2, y2, z2 = w * w, x * x, y * y, z * z
            wx, wy, wz, xy, xz, yz = w * x, w * y, w * z, x * y, x * z, y * z
            return torch.stack(
                [w2 + x2 - y2 - z2, 2 * xy - 2 * wz, 2 * wy + 2 * xz,
                 2 * wz + 2 * xy, w2 - x2 + y2 - z2, 2 * yz - 2 * wx,
                 2 * xz - 2 * wy, 2 * wx + 2 * yz, w2 - x2 - y2 + z2],
                dim=1,
            ).reshape(B, 3, 3)

        ref_dcp.quat2mat = _quat2mat_wxyz

        E = 64
        tdg = ref_models.DGCNN(emb_dims=E)
        tref = ref_models.DCP(feature_model=tdg, cycle=False, pointer_="identity", head="mlp")
        tref.eval()
        mdg = models.DGCNN(emb_dims=E, rngs=nnx.Rngs(0))
        mine = models.DCP(mdg, cycle=False, pointer_="identity", head="mlp", rngs=nnx.Rngs(1))
        mine.eval()
        install(mine, tref)
        template, source = rand_cloud(14), rand_cloud(15)
        ref_out = tref(template, source)
        my_out = mine(t2j(template), t2j(source))
        np.testing.assert_allclose(
            np.asarray(my_out["est_R"]), ref_out["est_R"].detach().numpy(), atol=1e-4
        )
        np.testing.assert_allclose(
            np.asarray(my_out["est_t"]), ref_out["est_t"].detach().numpy(), atol=1e-4
        )


class TestMaskNetParity:
    def test_mask_matches(self):
        tpn = ref_models.PointNet(emb_dims=96, use_bn=True)
        mpn = models.PointNet(emb_dims=96, use_bn=True, rngs=nnx.Rngs(0))
        mine = models.MaskNet(mpn, rngs=nnx.Rngs(1))
        mine.eval()
        # reference MaskNet's default mask-MLP hardcodes a 2048-in first
        # conv (masknet.py:13); build the torch mask net with matching
        # feature sizes and import it into our maskNet submodule.
        tmask = ref_models.masknet.PointNetMask(
            template_feature_size=96, source_feature_size=96, feature_model=tpn
        )
        tmask.eval()
        import_torch_state_dict(mine.maskNet, tmask.state_dict())
        template, source = rand_cloud(20), rand_cloud(21)
        ref_mask = tmask(template, source).detach().numpy()
        my_mask = np.asarray(mine.maskNet(t2j(template), t2j(source)))
        np.testing.assert_allclose(my_mask, ref_mask, atol=2e-5)


class TestDeepGMRParity:
    def test_gmm_register_matches(self):
        from reference.models.deepgmr import gmm_params as ref_gp
        from reference.models.deepgmr import gmm_register as ref_gr

        from learning3d_tpu.models.deepgmr import gmm_params, gmm_register

        torch.manual_seed(22)
        gamma_t = torch.softmax(torch.randn(B, N, 8), dim=-1)
        gamma_s = torch.softmax(torch.randn(B, N, 8), dim=-1)
        pts_t, pts_s = torch.randn(B, N, 3), torch.randn(B, N, 3)
        rpi_t, rmu_t, rsig_t = ref_gp(gamma_t, pts_t)
        rpi_s, rmu_s, rsig_s = ref_gp(gamma_s, pts_s)
        mpi_t, mmu_t, msig_t = gmm_params(t2j(gamma_t), t2j(pts_t))
        np.testing.assert_allclose(np.asarray(mpi_t), rpi_t.numpy(), atol=1e-5)
        np.testing.assert_allclose(np.asarray(mmu_t), rmu_t.numpy(), atol=1e-5)
        np.testing.assert_allclose(np.asarray(msig_t), rsig_t.numpy(), atol=1e-5)
        ref_T = ref_gr(rpi_s, rmu_s, rmu_t, rsig_t).numpy()
        my_T = np.asarray(
            gmm_register(t2j(rpi_s), t2j(rmu_s), t2j(rmu_t), t2j(rsig_t))
        )
        np.testing.assert_allclose(my_T, ref_T, atol=1e-3)


class TestRPMNetParity:
    def test_sinkhorn_matches(self):
        from reference.models.rpmnet import sinkhorn as ref_sinkhorn

        from learning3d_tpu.utils.rigid import sinkhorn_log

        torch.manual_seed(23)
        la = torch.randn(B, 24, 32)
        for slack in (True, False):
            ref_out = ref_sinkhorn(la, n_iters=5, slack=slack).numpy()
            my_out = np.asarray(sinkhorn_log(t2j(la), n_iters=5, slack=slack))
            np.testing.assert_allclose(my_out, ref_out, atol=1e-5)

    def test_rigid_transform_matches(self):
        from reference.models.rpmnet import compute_rigid_transform

        from learning3d_tpu.utils.rigid import weighted_kabsch

        torch.manual_seed(24)
        a, b = torch.randn(B, 32, 3), torch.randn(B, 32, 3)
        w = torch.rand(B, 32)
        ref_T = compute_rigid_transform(a, b, w).numpy()
        my_T = np.asarray(weighted_kabsch(t2j(a), t2j(b), t2j(w)))
        np.testing.assert_allclose(my_T, ref_T, atol=1e-3)

    def test_ppfnet_features_match(self):
        from reference.models.ppfnet import PPFNet as RefPPF

        tref = RefPPF(emb_dims=32, radius=0.3, num_neighbors=16)
        tref.eval()
        mine = models.PPFNet(emb_dims=32, radius=0.3, num_neighbors=16, rngs=nnx.Rngs(0))
        mine.eval()
        install(mine, tref)
        torch.manual_seed(25)
        xyz = torch.randn(B, N, 3)
        normals = torch.nn.functional.normalize(torch.randn(B, N, 3), dim=-1)
        ref_out = tref(xyz, normals).detach().numpy()
        my_out = np.asarray(mine(t2j(xyz), t2j(normals)))
        np.testing.assert_allclose(my_out, ref_out, atol=1e-4)

    def test_parameter_prediction_matches(self):
        from reference.models.rpmnet import ParameterPredictionNet as RefPPN

        tref = RefPPN(weights_dim=[0])
        tref.eval()
        from learning3d_tpu.models.rpmnet import ParameterPredictionNet

        mine = ParameterPredictionNet((0,), rngs=nnx.Rngs(0))
        mine.eval()
        install(mine, tref)
        torch.manual_seed(26)
        src, ref = torch.randn(B, N, 3), torch.randn(B, 48, 3)
        ref_beta, ref_alpha = tref([src, ref])
        my_beta, my_alpha = mine(t2j(src), t2j(ref))
        np.testing.assert_allclose(np.asarray(my_beta), ref_beta.detach().numpy(), atol=1e-5)
        np.testing.assert_allclose(np.asarray(my_alpha), ref_alpha.detach().numpy(), atol=1e-5)


class TestPointConvParity:
    def test_classifier_matches(self):
        """Full PointConv SSG stack: FPS (deterministic start) + kNN
        grouping + density nets + weighted convolution, vs reference."""
        from reference.models.pointconv import PointConvDensityClsSsg as RefPC
        tref = RefPC(
            emb_dims=128, classifier=True, num_classes=10
        )
        tref.eval()
        mine = models.PointConvDensityClsSsg(
            emb_dims=128, classifier=True, num_classes=10, rngs=nnx.Rngs(0)
        )
        mine.eval()
        install(mine, tref)
        torch.manual_seed(30)
        x = torch.randn(2, 1024, 3)
        ref_out = tref(x).detach().numpy()
        my_out = np.asarray(mine(t2j(x)))
        np.testing.assert_allclose(my_out, ref_out, atol=5e-4)


class TestCurveNetParity:
    def test_classifier_matches(self):
        """Full CurveNet: LPFA lifting, 8 CIC blocks with guided walks and
        curve aggregation, vs reference. The reference's unsorted top-k
        start selection is a set — downstream aggregation is
        permutation-invariant over curves, so outputs match."""
        from reference.models.curvenet import CurveNet as RefCurveNet

        tref = RefCurveNet(num_classes=10, k=8)
        tref.eval()
        mine = models.CurveNet(num_classes=10, k=8, rngs=nnx.Rngs(0))
        mine.eval()
        install(mine, tref)
        torch.manual_seed(31)
        x = torch.randn(2, 1024, 3)
        ref_out = tref(x).detach().numpy()
        my_out = np.asarray(mine(t2j(x)))
        np.testing.assert_allclose(my_out, ref_out, atol=2e-3)


class TestSegmentationParity:
    def test_logits_match(self):
        tpn = ref_models.PointNet(emb_dims=96, use_bn=True, global_feat=False)
        tref = ref_models.Segmentation(feature_model=tpn, num_classes=10)
        tref.eval()
        mpn = models.PointNet(emb_dims=96, use_bn=True, global_feat=False, rngs=nnx.Rngs(0))
        mine = models.Segmentation(mpn, num_classes=10, rngs=nnx.Rngs(1))
        mine.eval()
        install(mine, tref)
        x = rand_cloud(40)
        np.testing.assert_allclose(
            np.asarray(mine(t2j(x))), tref(x).detach().numpy(), atol=5e-5
        )


class TestPRNetParity:
    def test_forward_matches(self):
        from reference.models.prnet import PRNet as RefPRNet

        E, NK, NS = 64, 24, 32
        tref = RefPRNet(
            emb_nn="dgcnn", attention="transformer", head="svd", emb_dims=E,
            num_keypoints=NK, num_subsampled_points=NS, num_iters=2, input_shape="bnc",
        )
        tref.eval()
        mine = models.PRNet(
            emb_nn="dgcnn", attention="transformer", head="svd", emb_dims=E,
            num_keypoints=NK, num_subsampled_points=NS, num_iters=2, rngs=nnx.Rngs(0),
        )
        mine.eval()
        install(mine, tref)
        torch.manual_seed(41)
        src = torch.randn(B, NS, 3)
        tgt = torch.randn(B, NS, 3)
        ref_out = tref(src, tgt)
        my_out = mine(t2j(src), t2j(tgt))
        np.testing.assert_allclose(
            np.asarray(my_out["est_R"]), ref_out["est_R"].detach().numpy(), atol=5e-3
        )
        np.testing.assert_allclose(
            np.asarray(my_out["est_t"]), ref_out["est_t"].detach().numpy(), atol=5e-3
        )


class TestMaskNet2Parity:
    def test_masks_match(self):
        from reference.models.masknet2 import PointNetMask as RefMask2

        tref = RefMask2()
        tref.eval()
        from learning3d_tpu.models.masknet2 import PointNetMask2

        mine = PointNetMask2(rngs=nnx.Rngs(0))
        mine.eval()
        import_torch_state_dict(mine, tref.state_dict())
        template, source = rand_cloud(50), rand_cloud(51)
        ref_tm, ref_sm = tref(template, source)
        my_tm, my_sm = mine(t2j(template), t2j(source))
        np.testing.assert_allclose(np.asarray(my_tm), ref_tm.detach().numpy(), atol=1e-4)
        np.testing.assert_allclose(np.asarray(my_sm), ref_sm.detach().numpy(), atol=1e-4)
