"""Reference-named data surface (/root/reference/data_utils/__init__.py:1-4)."""

from learning3d_tpu.data import (  # noqa: F401
    ClassificationData,
    FlowData,
    ModelNet40Data,
    RegistrationData,
    SceneflowDataset,
    SegmentationData,
    UserData,
    create_random_transform,
    deg_to_rad,
    download_modelnet40,
)

__all__ = [
    "ModelNet40Data", "ClassificationData", "RegistrationData",
    "SegmentationData", "FlowData", "SceneflowDataset",
    "download_modelnet40", "deg_to_rad", "create_random_transform",
    "UserData",
]
