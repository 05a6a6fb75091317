"""Loss library — capability parity with the reference's ``losses/``
(losses/__init__.py:1-11), built on the TPU kernels."""

from learning3d_tpu.losses.losses import (  # noqa: F401
    chamfer_distance_loss,
    classification_loss,
    correspondence_loss,
    emd_loss_mean,
    frobenius_norm_loss,
    rmse_features_loss,
)

# Reference-style aliases.
ChamferDistanceLoss = chamfer_distance_loss
EMDLoss = emd_loss_mean
FrobeniusNormLoss = frobenius_norm_loss
RMSEFeaturesLoss = rmse_features_loss
ClassificationLoss = classification_loss
CorrespondenceLoss = correspondence_loss
