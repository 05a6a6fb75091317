"""learning3d — drop-in compatibility facade over ``learning3d_tpu``.

Lets code written against the reference package
(vinits5/learning3d; /root/reference/*/__init__.py) keep its imports:

    from learning3d.models import PointNet, Classifier, DCP
    from learning3d.losses import ChamferDistanceLoss
    from learning3d.data_utils import ModelNet40Data, ClassificationData
    from learning3d.ops import se3, so3, quaternion

Everything resolves to the TPU-native implementations. The only
semantic deltas (documented in docs/MIGRATING.md):

* arrays are jax.numpy, not torch (numpy arrays are accepted as inputs),
* models are flax.nnx modules — constructors accept ``rngs=nnx.Rngs(s)``;
  this facade injects ``nnx.Rngs(0)`` when the caller omits it, so
  reference-style ``PointNet(emb_dims=1024)`` works verbatim,
* loss "classes" follow the reference idiom ``ChamferDistanceLoss()(a, b)``.
"""

from learning3d import data_utils, losses, models, ops, utils  # noqa: F401

__version__ = "0.1.0"
