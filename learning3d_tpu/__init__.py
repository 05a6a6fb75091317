"""learning3d_tpu — a TPU-native deep-learning framework for 3D point clouds.

A ground-up JAX/XLA/Pallas rebuild of the capability surface of
vinits5/learning3d (reference: /root/reference): classification,
segmentation, completion, rigid registration, scene-flow and
inlier-mask estimation over point clouds — designed TPU-first:

* pure-functional numerics (``ops``) with custom JVPs where stability needs it,
* static-shape geometry primitives (FPS/kNN/ball-query) built on ``lax``,
* Pallas kernels for the pairwise-distance hot paths (``kernels``),
* flax.nnx model zoo (``models``) mirroring the reference's public API,
* a mesh/sharding layer (``parallel``) in place of the reference's
  single-device runtime,
* a generic data pipeline + trainer (``data``, ``train``).
"""

__version__ = "0.1.0"

from learning3d_tpu import ops  # noqa: F401
