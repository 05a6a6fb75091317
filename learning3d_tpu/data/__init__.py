"""Data pipeline — capability parity with the reference's ``data_utils/``
(ModelNet40, Classification/Registration/Segmentation/Flow wrappers,
SceneflowDataset, UserData; reference data_utils/__init__.py:1-4), plus a
TPU-native on-device augmentation path (SURVEY.md §7 stage 7) and a
synthetic procedural dataset for offline smoke/bench runs."""

from learning3d_tpu.data.dataloaders import (  # noqa: F401
    ClassificationData,
    FlowData,
    ModelNet40Data,
    RegistrationData,
    SceneflowDataset,
    SegmentationData,
    SyntheticPartSegmentation,
    SyntheticModelNet40,
    SyntheticSceneflow,
    create_random_transform,
    deg_to_rad,
    download_modelnet40,
)
from learning3d_tpu.data.device_pipeline import (  # noqa: F401
    augment_classification_batch,
    batch_iterator,
    make_registration_batch,
)
from learning3d_tpu.data.user_data import UserData  # noqa: F401
