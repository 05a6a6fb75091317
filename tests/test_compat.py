"""The ``learning3d`` drop-in facade: reference import lines work verbatim
against the TPU implementations (reference surface:
/root/reference/{models,losses,data_utils,ops,utils}/__init__.py)."""

import numpy as np
import pytest


class TestCompatFacade:
    def test_reference_model_imports_and_rngless_construction(self):
        from learning3d.models import Classifier, PointNet

        # reference idiom: no rngs argument (models/pointnet.py ctor)
        clf = Classifier(PointNet(emb_dims=256, use_bn=True))
        logits = clf(np.random.default_rng(0).standard_normal((2, 64, 3)).astype(np.float32))
        assert logits.shape == (2, 40)

    def test_all_reference_model_names_present(self):
        import learning3d.models as m

        for name in [
            "PointNet", "create_pointconv", "DGCNN", "PPFNet", "Pooling",
            "Classifier", "Segmentation", "DCP", "PRNet", "iPCRNet",
            "PointNetLK", "RPMNet", "PCN", "DeepGMR", "MaskNet", "MaskNet2",
            "CurveNet", "FlowNet3D",
        ]:
            assert hasattr(m, name), name

    def test_loss_class_idiom(self):
        from learning3d.losses import ChamferDistanceLoss
        from learning3d_tpu.losses import chamfer_distance_loss

        a = np.random.default_rng(1).standard_normal((2, 32, 3)).astype(np.float32)
        b = np.random.default_rng(2).standard_normal((2, 32, 3)).astype(np.float32)
        got = ChamferDistanceLoss()(a, b)  # reference call pattern
        want = chamfer_distance_loss(a, b)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-6)

    def test_loss_names_present(self):
        import learning3d.losses as l

        for name in [
            "ChamferDistanceLoss", "EMDLoss", "FrobeniusNormLoss",
            "RMSEFeaturesLoss", "ClassificationLoss", "CorrespondenceLoss",
        ]:
            assert hasattr(l, name), name

    def test_data_utils_surface(self):
        from learning3d.data_utils import (  # noqa: F401
            ClassificationData,
            ModelNet40Data,
            RegistrationData,
            UserData,
            create_random_transform,
            deg_to_rad,
        )

        pose = create_random_transform(np.random.default_rng(0))
        assert pose.shape == (1, 7)

    def test_ops_submodule_aliases(self):
        from learning3d.ops import se3, so3  # noqa: F401
        # deep import path must resolve via the sys.modules registration
        from learning3d.ops.se3 import exp  # noqa: F401
        import learning3d.ops.quaternion as q

        assert hasattr(q, "qeuler")

    def test_utils_surface(self):
        import learning3d.utils as u

        for name in [
            "SVDHead", "Transformer", "Identity", "square_distance",
            "index_points", "farthest_point_sample", "query_ball_point",
            "sample_and_group", "sample_and_group_multi", "knn",
            "pc_normalize", "knn_point", "get_graph_feature",
            "PointConvDensitySetAbstraction",
        ]:
            assert hasattr(u, name), name

    def test_explicit_rngs_still_honored(self):
        from flax import nnx

        from learning3d.models import PointNet

        p1 = PointNet(emb_dims=64, rngs=nnx.Rngs(7))
        p2 = PointNet(emb_dims=64, rngs=nnx.Rngs(7))
        s1 = nnx.state(p1)
        s2 = nnx.state(p2)
        leaves1 = [np.asarray(x) for x in nnx.to_flat_state(s1).leaves]
        leaves2 = [np.asarray(x) for x in nnx.to_flat_state(s2).leaves]
        assert len(leaves1) == len(leaves2)
        for a, b in zip(leaves1, leaves2):
            np.testing.assert_array_equal(a, b)
