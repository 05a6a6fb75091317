"""Quaternion algebra, (w, x, y, z) convention, batched over leading axes.

Capability parity with the reference's ``ops/quaternion.py`` (qmul/qrot/
qinv/qeuler/expmap) plus robust matrix<->quaternion conversion, written as
pure jnp so every function vmaps/jits and differentiates.
"""

from __future__ import annotations

import jax.numpy as jnp


def qmul(q, r):
    """Hamilton product q*r. q, r: (..., 4) in (w,x,y,z)."""
    w1, x1, y1, z1 = jnp.moveaxis(q, -1, 0)
    w2, x2, y2, z2 = jnp.moveaxis(r, -1, 0)
    return jnp.stack(
        [
            w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
            w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
            w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
            w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
        ],
        axis=-1,
    )


def qinv(q):
    """Inverse of a unit quaternion = conjugate. (..., 4)."""
    return q * jnp.array([1.0, -1.0, -1.0, -1.0], dtype=q.dtype)


def qrot(q, v):
    """Rotate vectors v (..., 3) by unit quaternions q (..., 4).

    Uses the expanded cross-product form (no matmul): v' = v + 2 w (u x v)
    + 2 u x (u x v).
    """
    w = q[..., :1]
    u = q[..., 1:]
    uv = jnp.cross(u, v)
    return v + 2.0 * (w * uv + jnp.cross(u, uv))


def qnormalize(q, eps=1e-12):
    return q / jnp.maximum(jnp.linalg.norm(q, axis=-1, keepdims=True), eps)


def quat2mat(q):
    """Unit quaternion (..., 4) -> rotation matrix (..., 3, 3)."""
    w, x, y, z = jnp.moveaxis(q, -1, 0)
    xx, yy, zz = x * x, y * y, z * z
    wx, wy, wz = w * x, w * y, w * z
    xy, xz, yz = x * y, x * z, y * z
    m = jnp.stack(
        [
            1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy),
            2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx),
            2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy),
        ],
        axis=-1,
    )
    return m.reshape(q.shape[:-1] + (3, 3))


def mat2quat(R):
    """Rotation matrix (..., 3, 3) -> unit quaternion (..., 4), w >= 0.

    Branchless Shepperd method: compute all four candidate quaternions
    (each numerically good in a different region) and select by the largest
    of (trace, R00, R11, R22) with nested jnp.where — robust for all
    rotations including angle ~ pi.
    """
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]
    tr = m00 + m11 + m22

    def safe_sqrt(x):
        return jnp.sqrt(jnp.maximum(x, 1e-12))

    # Candidate built from the trace (best when w is large).
    sw = safe_sqrt(1.0 + tr) * 2.0  # 4w
    qw_a = jnp.stack([0.25 * sw, (m21 - m12) / sw, (m02 - m20) / sw, (m10 - m01) / sw], -1)
    # Candidate from R00 (x dominant).
    sx = safe_sqrt(1.0 + m00 - m11 - m22) * 2.0  # 4x
    qx_a = jnp.stack([(m21 - m12) / sx, 0.25 * sx, (m01 + m10) / sx, (m02 + m20) / sx], -1)
    # Candidate from R11 (y dominant).
    sy = safe_sqrt(1.0 - m00 + m11 - m22) * 2.0  # 4y
    qy_a = jnp.stack([(m02 - m20) / sy, (m01 + m10) / sy, 0.25 * sy, (m12 + m21) / sy], -1)
    # Candidate from R22 (z dominant).
    sz = safe_sqrt(1.0 - m00 - m11 + m22) * 2.0  # 4z
    qz_a = jnp.stack([(m10 - m01) / sz, (m02 + m20) / sz, (m12 + m21) / sz, 0.25 * sz], -1)

    cond_tr = (tr > m00) & (tr > m11) & (tr > m22)
    cond_x = (m00 >= m11) & (m00 >= m22)
    cond_y = m11 >= m22
    q = jnp.where(
        cond_tr[..., None],
        qw_a,
        jnp.where(cond_x[..., None], qx_a, jnp.where(cond_y[..., None], qy_a, qz_a)),
    )
    # Canonicalize to w >= 0 and renormalize.
    q = q * jnp.where(q[..., :1] < 0, -1.0, 1.0)
    return qnormalize(q)


def axis_angle_to_quat(w):
    """Rotation vector (..., 3) -> unit quaternion.

    Squared-norm formulation: all autodiff orders finite at w = 0
    (||w||'s gradient is NaN there)."""
    from learning3d_tpu.ops.sinc import sinc1_sq

    s = jnp.sum(w * w, axis=-1, keepdims=True)  # t^2
    s_safe = jnp.where(s < 0.01, jnp.ones_like(s), s)
    # cos(t/2) as a smooth function of s.
    cos_taylor = 1.0 - s / 8.0 * (1.0 - s / 48.0 * (1.0 - s / 120.0))
    qw = jnp.where(s < 0.01, cos_taylor, jnp.cos(0.5 * jnp.sqrt(s_safe)))
    qv = 0.5 * sinc1_sq(0.25 * s) * w  # sin(t/2) u = (t/2) sinc1(t/2) u
    return jnp.concatenate([qw, qv], axis=-1)


def quat_to_axis_angle(q):
    """Unit quaternion -> rotation vector (..., 3), smooth at identity.

    w = 2 v * g(s), s = |v|^2, g(s) = asin(sqrt(s))/sqrt(s) for qw >= 0
    (Taylor branch near s = 0 keeps gradients finite)."""
    q = q * jnp.where(q[..., :1] < 0, -1.0, 1.0)  # qw >= 0 => angle in [0, pi]
    qw = q[..., :1]
    v = q[..., 1:]
    s = jnp.sum(v * v, axis=-1, keepdims=True)
    s_safe = jnp.where(s < 0.01, jnp.ones_like(s), s)
    r = jnp.sqrt(s_safe)
    g_exact = jnp.arctan2(r, qw) / r
    g_taylor = 1.0 + s / 6.0 + 3.0 * s * s / 40.0 + 15.0 * s * s * s / 336.0
    g = jnp.where(s < 0.01, g_taylor, g_exact)
    return 2.0 * v * g


def euler_to_quat(e, order="zyx"):
    """Intrinsic Euler angles (..., 3) in the given axis order -> quaternion.

    POSITIONAL angle convention (scipy's): e[..., i] is the angle of the
    i-th rotation in ``order``. For the reference quaternion module's
    axis-NAME convention (e[..., 0] is always the x-angle), use
    :func:`euler_to_quaternion`."""
    axes = {"x": jnp.array([1.0, 0, 0]), "y": jnp.array([0, 1.0, 0]), "z": jnp.array([0, 0, 1.0])}
    q = None
    for i, ax in enumerate(order):
        half = 0.5 * e[..., i : i + 1]
        qi = jnp.concatenate([jnp.cos(half), jnp.sin(half) * axes[ax].astype(e.dtype)], -1)
        q = qi if q is None else qmul(q, qi)
    return q


def euler_to_quaternion(e, order="zyx"):
    """Reference-exact euler -> quaternion (transform_functions.py:62-106):
    e[..., 0]/[1]/[2] are ALWAYS the x/y/z angles (axis-name convention),
    composed intrinsically in ``order``; even permutations (xyz/yzx/zxy)
    are returned antipodally negated, as the reference does."""
    perm = [_AXIS[c] for c in order]
    q = euler_to_quat(e[..., perm], order)
    if order in ("xyz", "yzx", "zxy"):
        q = -q
    return q


_AXIS = {"x": 0, "y": 1, "z": 2}


def qeuler(q, order="zyx", epsilon=0.0):
    """Unit quaternion -> intrinsic Tait-Bryan angles, all 6 orders
    (capability of reference ops/quaternion.py:56-100, incl. its
    ``epsilon`` asin clamp). Output is always stacked as (x, y, z) angles
    regardless of ``order``; ``order`` gives the rotation composition
    R = R_o0 R_o1 R_o2.

    Derivation (independent of the reference's per-order formulas): build
    the rotation matrix from q, then for R = R_i(a) R_j(b) R_k(c) with
    distinct axes and permutation sign s = +1 (even: xyz/yzx/zxy) or -1:
        b = asin(s*m[i,k]),  a = atan2(-s*m[j,k], m[k,k]),
        c = atan2(-s*m[i,j], m[i,i]).
    This reproduces the reference's six branches exactly."""
    if sorted(order) != ["x", "y", "z"]:
        raise ValueError(f"unsupported euler order {order!r}")
    w, x, y, z = jnp.moveaxis(q, -1, 0)
    xx, yy, zz = x * x, y * y, z * z
    m = [
        [1 - 2 * (yy + zz), 2 * (x * y - w * z), 2 * (x * z + w * y)],
        [2 * (x * y + w * z), 1 - 2 * (xx + zz), 2 * (y * z - w * x)],
        [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (xx + yy)],
    ]
    i, j, k = (_AXIS[c] for c in order)
    s = 1.0 if (j - i) % 3 == 1 else -1.0
    beta = jnp.arcsin(jnp.clip(s * m[i][k], -1 + epsilon, 1 - epsilon))
    alpha = jnp.arctan2(-s * m[j][k], m[k][k])
    gamma = jnp.arctan2(-s * m[i][j], m[i][i])
    out = [None, None, None]
    out[i], out[j], out[k] = alpha, beta, gamma
    return jnp.stack(out, axis=-1)


def qfix(q):
    """Enforce sign continuity along axis 0 of a quaternion sequence
    (reference ops/quaternion.py:127-144)."""
    dots = jnp.sum(q[1:] * q[:-1], axis=-1)
    flips = jnp.cumprod(jnp.where(dots < 0, -1.0, 1.0), axis=0)
    signs = jnp.concatenate([jnp.ones_like(flips[:1]), flips], axis=0)
    return q * signs[..., None]


# -- numpy twins (reference ops/quaternion.py:103-125 wraps the torch
# implementations for numpy callers; here the jnp versions accept numpy
# inputs directly, so the twins just materialize the result on host) -----


def _np(fn, *args, **kw):
    import numpy as np

    return np.asarray(fn(*args, **kw))


def qmul_np(q, r):
    return _np(qmul, q, r)


def qrot_np(q, v):
    return _np(qrot, q, v)


def qeuler_np(q, order="zyx", epsilon=0.0, use_gpu=False):  # use_gpu kept for API parity
    return _np(qeuler, q, order, epsilon)


def qfix_np(q):
    return _np(qfix, q)


def expmap_to_quaternion_np(e):
    return _np(axis_angle_to_quat, e)
