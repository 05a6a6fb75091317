"""Golden-value parity vs the PyTorch reference (SURVEY.md §4).

The reference package at /root/reference is imported as a behavioral
oracle: identical weights are installed in both frameworks and forward
outputs compared. Skipped automatically when the reference checkout or
torch is unavailable.
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

B, N = 2, 64


def t2j(t):
    return jnp.asarray(t.detach().numpy())


def copy_conv1d(lin, conv):
    lin.kernel.value = t2j(conv.weight)[..., 0].T
    if conv.bias is not None:
        lin.bias.value = t2j(conv.bias)


def copy_conv2d(lin, conv):
    lin.kernel.value = t2j(conv.weight)[..., 0, 0].T
    if conv.bias is not None and lin.use_bias:
        lin.bias.value = t2j(conv.bias)


def copy_linear(lin, tl):
    lin.kernel.value = t2j(tl.weight).T
    lin.bias.value = t2j(tl.bias)


def copy_bn(bn, tbn):
    bn.scale.value = t2j(tbn.weight)
    bn.bias.value = t2j(tbn.bias)
    bn.mean.value = t2j(tbn.running_mean)
    bn.var.value = t2j(tbn.running_var)


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
        for i in range(5):
            copy_conv1d(mine.convs[i], getattr(tref, f"conv{i+1}"))
            if use_bn:
                copy_bn(mine.bns[i], getattr(tref, f"bn{i+1}"))
        x = rand_cloud()
        ref_out = tref(x).detach().numpy()  # (B, emb, N)
        my_out = np.asarray(mine(t2j(x)))  # (B, N, emb)
        np.testing.assert_allclose(my_out.transpose(0, 2, 1), ref_out, atol=2e-5)

    def test_segmentation_variant_matches(self):
        tref = ref_models.PointNet(emb_dims=96, use_bn=True, global_feat=False)
        tref.eval()
        mine = models.PointNet(emb_dims=96, use_bn=True, global_feat=False, rngs=nnx.Rngs(0))
        mine.eval()
        for i in range(5):
            copy_conv1d(mine.convs[i], getattr(tref, f"conv{i+1}"))
            copy_bn(mine.bns[i], getattr(tref, f"bn{i+1}"))
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
        for i in range(5):
            copy_conv2d(mine.convs[i], getattr(tref, f"conv{i+1}"))
            copy_bn(mine.bns[i], getattr(tref, f"bn{i+1}"))
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
        for i in range(5):
            copy_conv1d(mpn.convs[i], getattr(tpn, f"conv{i+1}"))
            copy_bn(mpn.bns[i], getattr(tpn, f"bn{i+1}"))
        for j in (1, 2, 3):
            copy_linear(getattr(mine, f"linear{j}"), getattr(tref, f"linear{j}"))
        copy_bn(mine.bn1, tref.bn1)
        copy_bn(mine.bn2, tref.bn2)
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


class TestPCNParity:
    def test_coarse_output_matches(self):
        tref = ref_models.PCN(emb_dims=128, num_coarse=64, detailed_output=False)
        tref.eval()
        mine = models.PCN(emb_dims=128, num_coarse=64, rngs=nnx.Rngs(0))
        for mc, tc in [(mine.conv1, tref.conv1), (mine.conv2, tref.conv2),
                       (mine.conv3, tref.conv3), (mine.conv4, tref.conv4)]:
            copy_conv1d(mc, tc)
        for ml, tl in [(mine.linear1, tref.linear1), (mine.linear2, tref.linear2),
                       (mine.linear3, tref.linear3)]:
            copy_linear(ml, tl)
        x = rand_cloud(7)
        ref_out = tref(x)["coarse_output"].detach().numpy()
        my_out = np.asarray(mine(t2j(x))["coarse_output"])
        np.testing.assert_allclose(my_out, ref_out, atol=2e-5)


class TestiPCRNetParity:
    def test_forward_matches(self):
        tpn = ref_models.PointNet(emb_dims=96, use_bn=False)
        tref = ref_models.iPCRNet(feature_model=tpn)
        tref.eval()
        mpn = models.PointNet(emb_dims=96, use_bn=False, rngs=nnx.Rngs(0))
        mine = models.iPCRNet(mpn, rngs=nnx.Rngs(1))
        mine.eval()
        for i in range(5):
            copy_conv1d(mpn.convs[i], getattr(tpn, f"conv{i+1}"))
        # reference packs Linears inside an nn.Sequential with interleaved ReLU
        tlins = [m for m in tref.linear if isinstance(m, torch.nn.Linear)]
        for ml, tl in zip(list(mine.linears) + [mine.head], tlins):
            copy_linear(ml, tl)
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
