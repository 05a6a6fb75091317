"""Rigid-transform utilities + per-algorithm random transform samplers.

Capability parity with the reference's ``ops/transform_functions.py``
(PNLK/RPMNet/PCRNet/DCP/DeepGMR samplers, quat2mat, transform_point_cloud,
convert2transformation) — redesigned for TPU: samplers are pure functions
of a ``jax.random`` key so augmentation runs *inside* the jitted train step
(batched, on device), instead of per-item scipy/numpy in host workers
(reference dataloaders.py:290-330).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from learning3d_tpu.ops import quaternion as quat
from learning3d_tpu.ops import se3, so3


def deg_to_rad(deg):
    return math.pi / 180.0 * deg


def transform_point_cloud(points, R, t):
    """points (..., N, 3) @ R^T + t, R (..., 3, 3), t (..., 3)."""
    return jnp.einsum("...ij,...nj->...ni", R, points) + t[..., None, :]


def convert2transformation(R, t):
    """(..., 3, 3) + (..., 3) -> homogeneous (..., 4, 4)."""
    return se3.from_rt(R, t)


def random_twist(key, batch, mag=0.8, randomize_mag=False, dtype=jnp.float32):
    """Uniform direction on the unit 6-sphere scaled to magnitude ``mag``
    (optionally U(0, mag]) — the PNLK/RPMNet transform distribution
    (reference transform_functions.py:109-145)."""
    kd, km = jax.random.split(key)
    x = jax.random.normal(kd, (batch, 6), dtype=dtype)
    x = x / jnp.maximum(jnp.linalg.norm(x, axis=-1, keepdims=True), 1e-12)
    if randomize_mag:
        m = jax.random.uniform(km, (batch, 1), dtype=dtype, maxval=mag)
    else:
        m = jnp.full((batch, 1), mag, dtype=dtype)
    return x * m


def pnlk_transform(key, template, mag=0.8, randomize_mag=False):
    """Sample g = exp(twist) and apply to template. Returns (source, igt)
    with source = igt . template (igt maps template -> source, the
    convention the registration losses expect)."""
    twist = random_twist(key, template.shape[0], mag, randomize_mag, template.dtype)
    igt = se3.exp(twist)
    return se3.transform(igt, template), igt


def rpmnet_transform(key, template_with_normals, mag=0.8, randomize_mag=False):
    """PNLK twist applied to xyz and rotation-only to normals
    (reference transform_functions.py:148-191). Input (..., N, 6)."""
    xyz, nrm = template_with_normals[..., :3], template_with_normals[..., 3:6]
    twist = random_twist(key, xyz.shape[0], mag, randomize_mag, xyz.dtype)
    igt = se3.exp(twist)
    s_xyz = se3.transform(igt, xyz)
    s_nrm = so3.transform(igt[..., :3, :3], nrm)
    return jnp.concatenate([s_xyz, s_nrm], axis=-1), igt


def random_pose7(key, batch, max_rot_deg=45.0, max_trans=1.0, dtype=jnp.float32):
    """PCRNet-style 7-vector poses: Euler angles U(-max_rot, max_rot) as a
    quaternion + translation U(-max_trans, max_trans)
    (reference transform_functions.py:194-268)."""
    ke, kt = jax.random.split(key)
    mr = deg_to_rad(max_rot_deg)
    e = jax.random.uniform(ke, (batch, 3), dtype=dtype, minval=-mr, maxval=mr)
    q = quat.euler_to_quat(e, "xyz")
    t = jax.random.uniform(kt, (batch, 3), dtype=dtype, minval=-max_trans, maxval=max_trans)
    return jnp.concatenate([q, t], axis=-1)


def pcrnet_pose_table(key, data_size, max_rot_deg=45.0, max_trans=1.0):
    """Pre-generated fixed pose table addressed by dataset index — preserves
    the reference's reproducibility feature (transform_functions.py:199)."""
    return random_pose7(key, data_size, max_rot_deg, max_trans)


def apply_pose7(pose7, points):
    """Apply (B, 7) quaternion+translation poses to (B, N, 3) points and
    return (source, igt 4x4)."""
    q, t = quat.qnormalize(pose7[..., :4]), pose7[..., 4:]
    R = quat.quat2mat(q)
    return transform_point_cloud(points, R, t), se3.from_rt(R, t)


def dcp_transform(key, template, max_rot_deg=45.0, max_trans=1.0):
    """DCP/PRNet distribution: intrinsic zyx Euler rotation with each angle
    U(0, max) — note *positive-only*, matching the reference — plus uniform
    translation U(-max, max) (reference transform_functions.py:271-315,
    instantiated with angle_range=45, translation_range=1 in
    dataloaders.py:273-275)."""
    ke, kt = jax.random.split(key)
    mr = deg_to_rad(max_rot_deg)
    e = jax.random.uniform(ke, (template.shape[0], 3), dtype=template.dtype, minval=0.0, maxval=mr)
    R = quat.quat2mat(quat.euler_to_quat(e, "zyx"))
    t = jax.random.uniform(
        kt, (template.shape[0], 3), dtype=template.dtype, minval=-max_trans, maxval=max_trans
    )
    return transform_point_cloud(template, R, t), se3.from_rt(R, t)


def deepgmr_transform(key, template, max_rot_deg=90.0, max_trans=1.0):
    """DeepGMR distribution — wider rotations (reference
    transform_functions.py:317-342, angle_range=90 in dataloaders.py:278)."""
    return dcp_transform(key, template, max_rot_deg, max_trans)


def jitter_pointcloud(key, points, sigma=0.04, clip=0.05):
    """Gaussian jitter with per-batch random sigma scale, clipped — the
    reference's noise model (dataloaders.py:63-67)."""
    ks, kn = jax.random.split(key)
    scale = sigma * jax.random.uniform(ks, (points.shape[0], 1, 1), dtype=points.dtype)
    noise = jnp.clip(scale * jax.random.normal(kn, points.shape, dtype=points.dtype), -clip, clip)
    return points + noise


def get_transformations(igt):
    """igt (B, 4, 4) template->source. Returns (R_ab, t_ab, R_ba, t_ba)
    matching the reference train scripts' contract
    (examples/train_dcp.py:24-29): ab maps source->template."""
    inv = se3.inverse(igt)
    R_ab, t_ab = se3.to_rt(inv)
    R_ba, t_ba = se3.to_rt(igt)
    return R_ab, t_ab, R_ba, t_ba
