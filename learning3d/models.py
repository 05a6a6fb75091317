"""Reference-named model surface (/root/reference/models/__init__.py:1-24).

nnx constructors require ``rngs``; reference call sites don't pass one, so
each class here subclasses its TPU implementation and injects
``nnx.Rngs(0)`` when the caller omits ``rngs`` (pass your own for
deterministic-but-different inits). ``create_pointconv`` is re-exported
directly (it already builds its own modules).
"""

import inspect

from flax import nnx

import learning3d_tpu.models as _m

create_pointconv = _m.create_pointconv
Pooling = _m.Pooling  # functional pooling helper: no params, no rngs


def _with_default_rngs(cls):
    sig = inspect.signature(cls.__init__)
    if "rngs" not in sig.parameters:
        return cls

    class _Compat(cls):
        def __init__(self, *args, rngs=None, **kwargs):
            super().__init__(
                *args, rngs=rngs if rngs is not None else nnx.Rngs(0), **kwargs
            )

    _Compat.__name__ = cls.__name__
    _Compat.__qualname__ = cls.__name__
    _Compat.__doc__ = cls.__doc__
    return _Compat


PointNet = _with_default_rngs(_m.PointNet)
DGCNN = _with_default_rngs(_m.DGCNN)
PPFNet = _with_default_rngs(_m.PPFNet)
Classifier = _with_default_rngs(_m.Classifier)
Segmentation = _with_default_rngs(_m.Segmentation)
DCP = _with_default_rngs(_m.DCP)
PRNet = _with_default_rngs(_m.PRNet)
iPCRNet = _with_default_rngs(_m.iPCRNet)
PointNetLK = _with_default_rngs(_m.PointNetLK)
RPMNet = _with_default_rngs(_m.RPMNet)
PCN = _with_default_rngs(_m.PCN)
DeepGMR = _with_default_rngs(_m.DeepGMR)
MaskNet = _with_default_rngs(_m.MaskNet)
MaskNet2 = _with_default_rngs(_m.MaskNet2)
CurveNet = _with_default_rngs(_m.CurveNet)
FlowNet3D = _with_default_rngs(_m.FlowNet3D)
PointNetMask = _with_default_rngs(_m.PointNetMask)
MLPHead = _with_default_rngs(_m.MLPHead)

__all__ = [
    "PointNet", "create_pointconv", "DGCNN", "PPFNet", "Pooling",
    "Classifier", "Segmentation", "DCP", "PRNet", "iPCRNet", "PointNetLK",
    "RPMNet", "PCN", "DeepGMR", "MaskNet", "MaskNet2", "CurveNet",
    "FlowNet3D", "PointNetMask", "MLPHead",
]
