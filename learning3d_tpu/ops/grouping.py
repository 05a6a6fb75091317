"""Sample-and-group operators built on the geometry primitives.

Capability parity with ``utils/ppfnet_util.py`` (sample_and_group,
sample_and_group_multi with PPF features, center-excluding ball query) and
``utils/pointconv_util.py`` (kNN grouping + group_all). Channel-last,
static shapes, pure jnp.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from learning3d_tpu.ops.geometry import (
    angle,
    farthest_point_sample,
    index_points,
    knn_point,
    query_ball_point,
    square_distance,
)


def query_ball_point_excluding_self(radius, nsample, xyz, new_xyz, itself_indices):
    """PPFNet's ball-query variant (ppfnet_util.py:96-131): the query point
    itself is excluded from the candidate set, and under-full neighborhoods
    are padded with the center index instead of the first neighbor."""
    B, N, _ = xyz.shape
    S = new_xyz.shape[1]
    sqrdists = square_distance(new_xyz, xyz)  # (B, S, N)
    arange = jnp.broadcast_to(jnp.arange(N, dtype=jnp.int32), (B, S, N))
    is_self = arange == itself_indices[..., None]
    group_idx = jnp.where((sqrdists > radius * radius) | is_self, N, arange)
    neg_topk, _ = jax.lax.top_k(-group_idx, nsample)  # smallest nsample indices
    group_sorted = -neg_topk
    pad = jnp.broadcast_to(itself_indices[..., None], group_sorted.shape)
    return jnp.where(group_sorted == N, pad, group_sorted)


def _fps_or_all(xyz, npoint, key):
    B, N, _ = xyz.shape
    if npoint > 0:
        fps_idx = farthest_point_sample(xyz, npoint, key=key)
        return index_points(xyz, fps_idx), fps_idx
    fps_idx = jnp.broadcast_to(jnp.arange(N, dtype=jnp.int32), (B, N))
    return xyz, fps_idx


def sample_and_group(npoint, radius, nsample, xyz, points=None, returnfps=False, key=None):
    """FPS + ball query + center-relative grouping
    (reference ppfnet_util.py:134-170). npoint <= 0 keeps all points."""
    new_xyz, fps_idx = _fps_or_all(xyz, npoint, key)
    idx = query_ball_point(radius, nsample, xyz, new_xyz)
    grouped_xyz = index_points(xyz, idx)  # (B, S, nsample, 3)
    grouped_norm = grouped_xyz - new_xyz[:, :, None, :]
    if points is not None:
        grouped_points = index_points(points, idx)
        new_points = jnp.concatenate([grouped_norm, grouped_points], axis=-1)
    else:
        new_points = grouped_norm
    if returnfps:
        return new_xyz, new_points, grouped_xyz, fps_idx
    return new_xyz, new_points


def sample_and_group_all(xyz, points=None):
    """One group containing everything (pointnet2 GroupAll)."""
    B, N, C = xyz.shape
    new_xyz = jnp.zeros((B, 1, C), dtype=xyz.dtype)
    grouped_xyz = xyz[:, None, :, :]
    if points is not None:
        new_points = jnp.concatenate([grouped_xyz, points[:, None, :, :]], axis=-1)
    else:
        new_points = grouped_xyz
    return new_xyz, new_points


def sample_and_group_multi(npoint, radius, nsample, xyz, normals, key=None):
    """PPFNet grouping: {xyz, dxyz, ppf} feature dict
    (reference ppfnet_util.py:197-244). ppf = (angle(nr,d), angle(ni,d),
    angle(nr,ni), |d|) per neighbor."""
    B, N, C = xyz.shape
    if npoint > 0:
        fps_idx = farthest_point_sample(xyz, npoint, key=key)
        new_xyz = index_points(xyz, fps_idx)
        nr = index_points(normals, fps_idx)[:, :, None, :]
    else:
        fps_idx = jnp.broadcast_to(jnp.arange(N, dtype=jnp.int32), (B, N))
        new_xyz = xyz
        nr = normals[:, :, None, :]

    if jax.default_backend() == "tpu" and (nsample * 6) % 128 == 0:
        # fused Pallas path: ball query + value gather in one HBM pass
        # (the top_k + double index_points path costs ~18 ms at B=16,
        # N=1024, nsample=64 — the fused kernel replaces it; inputs are
        # leaf geometry, so no gradient flows through the gather)
        from learning3d_tpu.kernels.sampling import ball_group_pallas

        vals = jnp.concatenate([xyz, normals], axis=-1)  # (B, N, 6)
        g = ball_group_pallas(radius, nsample, xyz, new_xyz, fps_idx, vals)
        grouped_xyz, ni = g[..., :3], g[..., 3:]
    else:
        idx = query_ball_point_excluding_self(radius, nsample, xyz, new_xyz, fps_idx)
        grouped_xyz = index_points(xyz, idx)
        ni = index_points(normals, idx)
    d = grouped_xyz - new_xyz[:, :, None, :]  # (B, S, nsample, 3)

    nr_d = angle(nr, d)
    ni_d = angle(ni, d)
    nr_ni = angle(nr, ni)
    d_norm = jnp.linalg.norm(d, axis=-1)
    ppf = jnp.stack([nr_d, ni_d, nr_ni, d_norm], axis=-1)
    return {"xyz": new_xyz, "dxyz": d, "ppf": ppf}


def sample_and_group_knn(npoint, nsample, xyz, points=None, density_scale=None, key=None):
    """PointConv grouping: FPS centers + kNN neighborhoods
    (reference pointconv_util.py:120-172). Returns
    (new_xyz, new_points, grouped_xyz_norm[, grouped_density])."""
    new_xyz, _ = _fps_or_all(xyz, npoint, key)
    _, idx = knn_point(nsample, xyz, new_xyz)
    grouped_xyz = index_points(xyz, idx)
    grouped_norm = grouped_xyz - new_xyz[:, :, None, :]
    if points is not None:
        grouped_points = index_points(points, idx)
        new_points = jnp.concatenate([grouped_norm, grouped_points], axis=-1)
    else:
        new_points = grouped_norm
    if density_scale is None:
        return new_xyz, new_points, grouped_norm
    grouped_density = index_points(density_scale[..., None], idx)
    return new_xyz, new_points, grouped_norm, grouped_density


def compute_density(xyz, bandwidth):
    """Gaussian-KDE point density (reference pointconv_util.py:199-209)."""
    sqrdists = square_distance(xyz, xyz)
    g = jnp.exp(-sqrdists / (2.0 * bandwidth * bandwidth)) / (2.5 * bandwidth)
    return jnp.mean(g, axis=-1)
