"""SO(3) Lie-group ops, batched over arbitrary leading axes.

Capability parity with the reference's ``ops/so3.py`` (exp/log/mat/vec/
transform, reference so3.py:54-170) — but fully vectorized: no per-batch
python loops (the reference's ``btrace`` loops in python), no branchy log
(we go through a robust quaternion extraction), and plain JAX autodiff
replaces the hand-written ExpMap backward (the sinc/where formulation is
smooth at t=0).

Rotation vectors w ∈ R^3 ("axis * angle"), matrices R ∈ SO(3).
"""

from __future__ import annotations

import jax.numpy as jnp

from learning3d_tpu.ops import quaternion as quat
from learning3d_tpu.ops.sinc import sinc1, sinc1_sq, sinc2, sinc2_sq, sinc3_sq


def mat(w):
    """hat: (..., 3) -> (..., 3, 3) skew-symmetric matrix."""
    x, y, z = jnp.moveaxis(w, -1, 0)
    zero = jnp.zeros_like(x)
    W = jnp.stack(
        [zero, -z, y, z, zero, -x, -y, x, zero], axis=-1
    )
    return W.reshape(w.shape[:-1] + (3, 3))


def vec(W):
    """vee: (..., 3, 3) skew -> (..., 3)."""
    return jnp.stack([W[..., 2, 1], W[..., 0, 2], W[..., 1, 0]], axis=-1)


def genvec(dtype=jnp.float32):
    """The 3 generator vectors e_i (3, 3) identity — kept for API parity."""
    return jnp.eye(3, dtype=dtype)


def genmat(dtype=jnp.float32):
    """The 3 so(3) generator matrices (3, 3, 3)."""
    return mat(genvec(dtype))


def exp(w):
    """Rodrigues: (..., 3) rotation vector -> (..., 3, 3) rotation matrix.

    R = I + sinc1(t) W + sinc2(t) W^2, computed from s = t^2 so every
    autodiff order is finite at the identity (norm's gradient is NaN at 0).
    """
    s = jnp.sum(w * w, axis=-1)
    W = mat(w)
    W2 = W @ W
    eye = jnp.eye(3, dtype=w.dtype)
    return eye + sinc1_sq(s)[..., None, None] * W + sinc2_sq(s)[..., None, None] * W2


def log(R):
    """(..., 3, 3) rotation matrix -> (..., 3) rotation vector, |w| in [0, pi].

    Routed through the branchless quaternion extraction so it is robust for
    angles near 0 and near pi (the reference's log special-cases t ~ pi,
    so3.py:84-119).
    """
    return quat.quat_to_axis_angle(quat.mat2quat(R))


def transform(R, p):
    """Apply rotations to points.

    R: (..., 3, 3); p: (..., N, 3) or (..., 3). Returns p @ R^T shapes.
    """
    if p.ndim == R.ndim - 1:  # single vector per rotation
        return jnp.einsum("...ij,...j->...i", R, p)
    return jnp.einsum("...ij,...nj->...ni", R, p)


def btrace(M):
    """Batched trace (the reference loops in python, so3.py:74-82)."""
    return jnp.trace(M, axis1=-2, axis2=-1)


def inverse(R):
    return jnp.swapaxes(R, -1, -2)


def left_jacobian(w):
    """J_l(w): d(exp)/d(w) left Jacobian — the V matrix of SE(3) exp.

    V = I + sinc2(t) W + sinc3(t) W^2 (squared-norm formulation).
    """
    s = jnp.sum(w * w, axis=-1)
    W = mat(w)
    W2 = W @ W
    eye = jnp.eye(3, dtype=w.dtype)
    return eye + sinc2_sq(s)[..., None, None] * W + sinc3_sq(s)[..., None, None] * W2


def inv_left_jacobian(w):
    """J_l(w)^{-1} = I - W/2 + c(t) W^2, c = (1 - sinc1/(2 sinc2)) / t^2.

    c has the Taylor expansion 1/12 + s/720 + ... in s = t^2; the closed
    form is double-where stabilized so gradients stay finite at w = 0.
    """
    s = jnp.sum(w * w, axis=-1)
    W = mat(w)
    W2 = W @ W
    eye = jnp.eye(3, dtype=w.dtype)
    # The numerator 1 - sinc1/(2 sinc2) is O(s): switch to Taylor below
    # s = 1 to dodge float32 cancellation near the origin.
    s_safe = jnp.where(s < 1.0, jnp.ones_like(s), s)
    c_exact = (1.0 - sinc1_sq(s_safe) / (2.0 * sinc2_sq(s_safe))) / s_safe
    c_taylor = 1.0 / 12.0 + s / 720.0 + s * s / 30240.0 + s * s * s / 1209600.0
    c = jnp.where(s < 1.0, c_taylor, c_exact)
    return eye - 0.5 * W + c[..., None, None] * W2
