"""SE(3) Lie-group ops, batched, twist convention (w, v) rotation-first.

Capability parity with the reference's ``ops/se3.py`` (exp/log/transform/
inverse/mat/vec, reference se3.py:24-154). Twists xi ∈ R^6 are ordered
(w0, w1, w2, v0, v1, v2) like the reference (PointNetLK convention).
Plain autodiff replaces the reference's custom ExpMap backward.
"""

from __future__ import annotations

import jax.numpy as jnp

from learning3d_tpu.ops import so3


def mat(x):
    """hat: (..., 6) twist -> (..., 4, 4) se(3) matrix."""
    W = so3.mat(x[..., :3])
    v = x[..., 3:]
    top = jnp.concatenate([W, v[..., :, None]], axis=-1)
    bottom = jnp.zeros(x.shape[:-1] + (1, 4), dtype=x.dtype)
    return jnp.concatenate([top, bottom], axis=-2)


def vec(X):
    """vee: (..., 4, 4) se(3) matrix -> (..., 6) twist."""
    return jnp.concatenate([so3.vec(X[..., :3, :3]), X[..., :3, 3]], axis=-1)


def exp(x):
    """(..., 6) twist -> (..., 4, 4) rigid transform.

    g = [[R, V v], [0, 1]], R = exp(w), V the left Jacobian.
    """
    w, v = x[..., :3], x[..., 3:]
    R = so3.exp(w)
    V = so3.left_jacobian(w)
    t = jnp.einsum("...ij,...j->...i", V, v)
    top = jnp.concatenate([R, t[..., :, None]], axis=-1)
    bottom = jnp.zeros(x.shape[:-1] + (1, 4), dtype=x.dtype)
    bottom = bottom.at[..., 0, 3].set(1.0)
    return jnp.concatenate([top, bottom], axis=-2)


def log(g):
    """(..., 4, 4) rigid transform -> (..., 6) twist."""
    w = so3.log(g[..., :3, :3])
    Vinv = so3.inv_left_jacobian(w)
    v = jnp.einsum("...ij,...j->...i", Vinv, g[..., :3, 3])
    return jnp.concatenate([w, v], axis=-1)


def inverse(g):
    """Inverse rigid transform: [[R^T, -R^T t], [0, 1]]."""
    R = jnp.swapaxes(g[..., :3, :3], -1, -2)
    t = -jnp.einsum("...ij,...j->...i", R, g[..., :3, 3])
    top = jnp.concatenate([R, t[..., :, None]], axis=-1)
    bottom = g[..., 3:4, :]
    return jnp.concatenate([top, bottom], axis=-2)


def transform(g, p):
    """Apply rigid transforms to points.

    g: (..., 4, 4); p: (..., N, 3) or (..., 3). Broadcasts like the
    reference's se3.transform (se3.py:102-112).
    """
    R = g[..., :3, :3]
    t = g[..., :3, 3]
    if p.ndim == R.ndim - 1:
        return jnp.einsum("...ij,...j->...i", R, p) + t
    return jnp.einsum("...ij,...nj->...ni", R, p) + t[..., None, :]


def compose(a, b):
    """a ∘ b for (..., 4, 4)."""
    return a @ b


def from_rt(R, t):
    """(..., 3, 3) + (..., 3) -> (..., 4, 4)."""
    top = jnp.concatenate([R, t[..., :, None]], axis=-1)
    bottom = jnp.zeros(R.shape[:-2] + (1, 4), dtype=R.dtype)
    bottom = bottom.at[..., 0, 3].set(1.0)
    return jnp.concatenate([top, bottom], axis=-2)


def to_rt(g):
    return g[..., :3, :3], g[..., :3, 3]
