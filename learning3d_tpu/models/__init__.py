"""Model zoo — capability parity with the reference's 16 constructors
(reference models/__init__.py:1-23). All models are flax.nnx modules,
channel-last, jit/vmap/shard-friendly."""

from learning3d_tpu.models.classifier import Classifier  # noqa: F401
from learning3d_tpu.models.curvenet import CurveNet  # noqa: F401
from learning3d_tpu.models.flownet3d import FlowNet3D  # noqa: F401
from learning3d_tpu.models.pointconv import (  # noqa: F401
    PointConvDensityClsSsg,
    create_pointconv,
)
from learning3d_tpu.models.dcp import DCP, MLPHead  # noqa: F401
from learning3d_tpu.models.deepgmr import DeepGMR  # noqa: F401
from learning3d_tpu.models.dgcnn import DGCNN  # noqa: F401
from learning3d_tpu.models.masknet import MaskNet, PointNetMask  # noqa: F401
from learning3d_tpu.models.masknet2 import MaskNet2  # noqa: F401
from learning3d_tpu.models.pcn import PCN  # noqa: F401
from learning3d_tpu.models.pcrnet import iPCRNet  # noqa: F401
from learning3d_tpu.models.pointnet import PointNet  # noqa: F401
from learning3d_tpu.models.pointnetlk import PointNetLK  # noqa: F401
from learning3d_tpu.models.pooling import Pooling  # noqa: F401
from learning3d_tpu.models.ppfnet import PPFNet  # noqa: F401
from learning3d_tpu.models.prnet import PRNet  # noqa: F401
from learning3d_tpu.models.rpmnet import RPMNet  # noqa: F401
from learning3d_tpu.models.segmentation import Segmentation  # noqa: F401

__all__ = [
    "Classifier",
    "CurveNet",
    "FlowNet3D",
    "PointConvDensityClsSsg",
    "create_pointconv",
    "DCP",
    "DeepGMR",
    "DGCNN",
    "MaskNet",
    "MaskNet2",
    "MLPHead",
    "PCN",
    "PointNet",
    "PointNetLK",
    "PointNetMask",
    "Pooling",
    "PPFNet",
    "PRNet",
    "RPMNet",
    "Segmentation",
    "iPCRNet",
]
