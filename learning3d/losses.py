"""Reference-idiom loss classes (/root/reference/losses/__init__.py:1-11):
``ChamferDistanceLoss()(template, source)``. Construction kwargs are
forwarded to the underlying functional loss on every call."""

import learning3d_tpu.losses as _l


def _loss_class(fn, name):
    class _Loss:
        def __init__(self, **kwargs):
            self._kwargs = kwargs

        def __call__(self, *args, **kwargs):
            return fn(*args, **{**self._kwargs, **kwargs})

        # torch-API affordance: loss modules are called via .forward too
        forward = __call__

    _Loss.__name__ = name
    _Loss.__qualname__ = name
    _Loss.__doc__ = fn.__doc__
    return _Loss


ChamferDistanceLoss = _loss_class(_l.chamfer_distance_loss, "ChamferDistanceLoss")
EMDLoss = _loss_class(_l.emd_loss_mean, "EMDLoss")
FrobeniusNormLoss = _loss_class(_l.frobenius_norm_loss, "FrobeniusNormLoss")
RMSEFeaturesLoss = _loss_class(_l.rmse_features_loss, "RMSEFeaturesLoss")
ClassificationLoss = _loss_class(_l.classification_loss, "ClassificationLoss")
CorrespondenceLoss = _loss_class(_l.correspondence_loss, "CorrespondenceLoss")

__all__ = [
    "ChamferDistanceLoss", "EMDLoss", "FrobeniusNormLoss",
    "RMSEFeaturesLoss", "ClassificationLoss", "CorrespondenceLoss",
]
