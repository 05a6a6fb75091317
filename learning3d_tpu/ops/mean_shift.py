"""Zero-mean pre/post-processing for PointNetLK.

Capability parity with the reference's ``ops/data_utils.py``: zero-mean
both clouds before registration and fold the means back into the estimated
transform afterwards. The reference has a latent bug (data_utils.py:19 uses
``p0_m`` inside the source branch); this implementation does the math
correctly.
"""

from __future__ import annotations

import jax.numpy as jnp

from learning3d_tpu.ops import se3


def mean_shift(template, source):
    """Zero-mean both clouds.

    Returns (template0, source0, a0, a1) with a0/a1 the (B, 4, 4) matrices
    that reconstruct the original-frame transform:
    if est_T0 registers source0 -> template0 then
    est_T = a0^{-1} . est_T0 . a1 registers source -> template, with
    a0 = translate(-mean(template)) and a1 = translate(-mean(source)).
    """
    p0_m = jnp.mean(template, axis=-2)  # (B, 3)
    p1_m = jnp.mean(source, axis=-2)
    template0 = template - p0_m[..., None, :]
    source0 = source - p1_m[..., None, :]
    eye = jnp.broadcast_to(jnp.eye(4, dtype=template.dtype), template.shape[:-2] + (4, 4))
    a0 = eye.at[..., :3, 3].set(-p0_m)  # subtracts template mean
    a1 = eye.at[..., :3, 3].set(-p1_m)  # subtracts source mean
    return template0, source0, a0, a1


def postprocess(est_T0, a0, a1):
    """Fold the de-mean translations back in: est_T = a0^{-1} est_T0 a1.

    est_T0 maps zero-meaned source -> zero-meaned template; the result maps
    the original source -> original template.
    """
    return se3.inverse(a0) @ est_T0 @ a1
