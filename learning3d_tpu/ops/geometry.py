"""Point-cloud geometry primitives — static shapes, lax control flow, MXU-
friendly pairwise distances.

Capability parity with the reference's geometry layer spread across
``utils/model_common_utils.py``, ``utils/ppfnet_util.py``,
``utils/pointconv_util.py`` and the pointnet2 CUDA extension
(``utils/lib/src/*``): kNN, FPS (both start conventions), ball query with
the exact "sort + pad with first neighbor" semantics, gather/grouping,
three-NN inverse-distance interpolation, edge features and RRI.

All functions are channel-LAST (B, N, C) — the natural jnp layout — and are
pure jnp/lax so they jit, vmap, differentiate and shard. Every neighbor
count / sample count is a static python int (XLA static-shape discipline).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def square_distance(src, dst, precision=jax.lax.Precision.HIGHEST):
    """Pairwise squared L2: (..., N, C) x (..., M, C) -> (..., N, M).

    Matmul expansion |a-b|^2 = |a|^2 + |b|^2 - 2ab (MXU-friendly; matches
    reference model_common_utils.py:19-38). Defaults to full-f32 MXU passes:
    neighbor *selection* (argmin/top-k) is sensitive to the bf16 default.
    """
    d = -2.0 * jnp.einsum("...nc,...mc->...nm", src, dst, precision=precision)
    d = d + jnp.sum(src * src, axis=-1)[..., :, None]
    d = d + jnp.sum(dst * dst, axis=-1)[..., None, :]
    return d


def _index_points_matmul(points, idx):
    """One-hot MXU gather: (B, N, C) x (B, S, K) -> (B, S, K, C).

    XLA's take_along_axis lowers to a slow dynamic-gather loop on TPU
    (~10x slower at B=16, N=768, K=20); a one-hot (S*K, N) @ (N, C)
    product runs on the MXU with the iota-compare fused in. bf16 values
    copy exactly through a single bf16 MXU pass (each one-hot row has a
    single 1.0)."""
    N = points.shape[1]
    onehot = (idx[..., None] == jnp.arange(N, dtype=idx.dtype)).astype(points.dtype)
    return jnp.einsum("bskn,bnc->bskc", onehot, points)


def index_points(points, idx):
    """Batched gather. points (B, N, C); idx (B, S) or (B, S, K) int ->
    (B, S, C) / (B, S, K, C). (Reference model_common_utils.py:40-56 and
    the pointnet2 gather/group kernels.)"""
    if idx.ndim == 2:
        return jnp.take_along_axis(points, idx[..., None], axis=1)
    # neighbor gathers on TPU: MXU one-hot product (exact for bf16 — the
    # dtype models run in on TPU; f32 stays on the gather path so
    # geometry/selection numerics are untouched)
    if (
        points.dtype == jnp.bfloat16
        and points.shape[1] <= 4096
        and jax.default_backend() == "tpu"
    ):
        return _index_points_matmul(points, idx)
    # (B, S, K): flatten the trailing sample dims, gather, reshape back.
    B = points.shape[0]
    flat = idx.reshape(B, -1)
    out = jnp.take_along_axis(points, flat[..., None], axis=1)
    return out.reshape(idx.shape + (points.shape[-1],))


def _select_k_smallest(d, k, approx):
    """(values, idx) of the k smallest entries along the last axis.

    approx=True uses the TPU-accelerated ``lax.approx_min_k`` (measured
    ~4.4x faster than exact top_k at N=1024 on v5e; recall ~0.95+). Exact
    by default — neighbor semantics stay pinned to the reference."""
    if approx:
        return jax.lax.approx_min_k(d, k)
    neg, idx = jax.lax.top_k(-d, k)
    return -neg, idx


def _use_knn_pallas(points, k, approx):
    # the VMEM-tiled kernel wins only where the (S, N) matrix + top_k
    # hurt; at small N the XLA path is already sub-ms and fuses better.
    # Covers both coordinates (exact differences) and feature spaces up
    # to 256 channels (MXU matmul expansion — PRNet's dynamic graphs).
    return (
        not approx
        and points.shape[-1] <= 256
        and k <= 64
        and points.shape[-2] >= 512
        and jax.default_backend() == "tpu"
    )


def knn(points, k, include_self=True, approx=False):
    """Self kNN indices (B, N, k), nearest first (reference
    model_common_utils.py:3-9 matmul-trick knn). ``include_self=False``
    drops the query point itself (k+1 search, first column removed).
    Coordinate inputs on TPU dispatch to the fused Pallas kernel (the
    top_k over the (N, N) matrix costs ~19 ms at B=32, N=1024)."""
    kk = k if include_self else k + 1
    if _use_knn_pallas(points, kk, approx):
        from learning3d_tpu.kernels.knn import knn_pallas

        # kernel has no VJP; the int indices carry no gradient anyway
        # (same as top_k's index output), so detach the operands —
        # without this, training through a Pallas-kNN graph fails to
        # linearize (hit by PRNet's dynamic feature graphs, round 3)
        p = jax.lax.stop_gradient(points)
        _, idx = knn_pallas(p, p, kk)
    else:
        d = square_distance(points, points)
        _, idx = _select_k_smallest(d, kk, approx)
    return idx if include_self else idx[..., 1:]


def knn_point(k, pos1, pos2, approx=False):
    """For each query in pos2 (B, M, C) the k nearest points of pos1
    (B, N, C). Returns (dist (B, M, k) L2 — not squared — and idx), nearest
    first (reference model_common_utils.py:84-100)."""
    if _use_knn_pallas(pos1, k, approx):
        from learning3d_tpu.kernels.knn import knn_pallas

        # detached operands: the kernel has no VJP and every in-tree
        # caller consumes only the indices (`_, idx = knn_point(...)`);
        # the returned distance is therefore non-differentiable here
        sq, idx = knn_pallas(
            jax.lax.stop_gradient(pos2), jax.lax.stop_gradient(pos1), k
        )
        return jnp.sqrt(jnp.maximum(sq, 0.0)), idx
    d = square_distance(pos2, pos1)
    val, idx = _select_k_smallest(d, k, approx)
    return jnp.sqrt(jnp.maximum(val, 0.0)), idx


def farthest_point_sample(xyz, npoint, key=None):
    """Iterative farthest-point sampling -> indices (B, npoint).

    ``key=None`` starts at point 0 (the reference's
    ``start_with_first_point=True`` / pointconv convention); otherwise the
    start index is uniform-random per batch item (the default torch
    fallback, model_common_utils.py:58-82). On TPU this dispatches to the
    batched Pallas kernel (kernels/sampling.py — the lax.scan path pays
    ~10 ms of per-step overhead at npoint=1024); the scan path is the CPU/
    fallback oracle.
    """
    B, N, _ = xyz.shape
    if key is None:
        start = jnp.zeros((B,), dtype=jnp.int32)
    else:
        start = jax.random.randint(key, (B,), 0, N, dtype=jnp.int32)

    if jax.default_backend() == "tpu" and npoint <= 1024:
        from learning3d_tpu.kernels.sampling import fps_pallas

        return fps_pallas(xyz, npoint, start=start)

    def step(carry, _):
        dist, farthest = carry
        centroid = jnp.take_along_axis(xyz, farthest[:, None, None], axis=1)  # (B,1,3)
        d = jnp.sum((xyz - centroid) ** 2, axis=-1)  # (B, N)
        dist = jnp.minimum(dist, d)
        nxt = jnp.argmax(dist, axis=-1).astype(jnp.int32)
        return (dist, nxt), farthest

    init = (jnp.full((B, N), 1e10, dtype=xyz.dtype), start)
    _, idx = jax.lax.scan(step, init, None, length=npoint)
    return jnp.swapaxes(idx, 0, 1)  # (B, npoint)


def gather_operation(points, idx):
    """pointnet2 ``gather_operation`` equivalent (channel-last)."""
    return index_points(points, idx)


grouping_operation = index_points


def query_ball_point(radius, nsample, xyz, new_xyz, get_cnt=False):
    """Ball query with the reference's exact semantics
    (model_common_utils.py:102-130): indices of points within ``radius`` of
    each query, *in ascending index order*, truncated to ``nsample`` and
    padded with the first in-ball index when fewer than ``nsample`` fall
    inside. Implemented with the same sort trick (out-of-ball -> N, sort,
    slice, backfill).
    """
    B, N, _ = xyz.shape
    S = new_xyz.shape[1]
    if not get_cnt and nsample <= 128 and jax.default_backend() == "tpu":
        from learning3d_tpu.kernels.sampling import ball_query_pallas

        return ball_query_pallas(radius, nsample, xyz, new_xyz)
    sqrdists = square_distance(new_xyz, xyz)  # (B, S, N)
    arange = jnp.broadcast_to(jnp.arange(N, dtype=jnp.int32), (B, S, N))
    group_idx = jnp.where(sqrdists > radius * radius, N, arange)
    # smallest nsample indices == reference's sort[:, :nsample], but top_k
    # avoids the full N-wide sort (cheaper on TPU)
    neg_topk, _ = jax.lax.top_k(-group_idx, nsample)
    group_sorted = -neg_topk  # ascending
    first = group_sorted[..., :1]
    out = jnp.where(group_sorted == N, first, group_sorted)
    if get_cnt:
        cnt = jnp.sum(group_idx != N, axis=-1)
        return out, cnt
    return out


def ball_query_pad_first(radius, nsample, xyz, new_xyz):
    """CUDA-extension ball-query semantics (ball_query_gpu.cu:10-45): the
    first ``nsample`` in-ball indices in scan order, slots pre-filled with
    the *first* in-ball index. Identical result to query_ball_point —
    provided under the pointnet2 name for FlowNet3D parity."""
    return query_ball_point(radius, nsample, xyz, new_xyz)


def three_nn(unknown, known):
    """3 nearest neighbors of each unknown point among known points.

    unknown (B, N, 3), known (B, M, 3) -> (dist (B, N, 3), idx (B, N, 3)).
    Exact per-pair differences (like the reference CUDA kernel,
    interpolate_gpu.cu:81-147) rather than the matmul expansion: the
    inverse-distance weights need d == 0 *exactly* for coincident points.
    """
    if (
        unknown.ndim == 3
        and known.shape[-2] >= 512
        and jax.default_backend() == "tpu"
    ):
        # the Pallas kNN kernel's C==3 path uses the same exact
        # per-coordinate differences (d == 0 preserved for coincident
        # points) and never materializes the (B, N, M) matrix in HBM —
        # FlowNet3D's fp stage: 10.9 -> ~1 ms at N=2048, M=1024.
        # The kernel has no VJP, so it supplies only the (integer)
        # selection; distances are recomputed from the gathered
        # neighbors so grads flow to the selected pairs — the same
        # gradients as differentiating the dense top_k path.
        from learning3d_tpu.kernels.knn import knn_pallas

        _, idx = knn_pallas(jax.lax.stop_gradient(unknown),
                            jax.lax.stop_gradient(known), 3)
        nbr = index_points(known, idx)  # (B, N, 3, 3)
        diff = unknown[..., :, None, :] - nbr
        return jnp.sqrt(jnp.maximum(jnp.sum(diff * diff, -1), 0.0)), idx
    diff = unknown[..., :, None, :] - known[..., None, :, :]  # (B, N, M, 3)
    d = jnp.sum(diff * diff, axis=-1)
    neg, idx = jax.lax.top_k(-d, 3)
    return jnp.sqrt(jnp.maximum(-neg, 0.0)), idx


def three_interpolate(points, idx, weight):
    """Inverse-distance-weighted 3-NN interpolation.

    points (B, M, C); idx, weight (B, N, 3) -> (B, N, C).
    """
    gathered = index_points(points, idx)  # (B, N, 3, C)
    return jnp.sum(gathered * weight[..., None], axis=-2)


def three_interpolate_weights(dist, eps=1e-8):
    """Reference inverse-distance weights: w = (1/d) / sum(1/d)."""
    recip = 1.0 / (dist + eps)
    return recip / jnp.sum(recip, axis=-1, keepdims=True)


def get_graph_feature(x, k=20, approx=False):
    """DGCNN edge features, channel-last: x (B, N, C) ->
    (B, N, k, 2C) = concat(neighbor_feats, center_feats)
    (reference model_common_utils.py:132-155)."""
    idx = knn(x, k, approx=approx)
    neighbors = index_points(x, idx)  # (B, N, k, C)
    center = jnp.broadcast_to(x[:, :, None, :], neighbors.shape)
    return jnp.concatenate([neighbors, center], axis=-1)


def angle(v1, v2, eps=1e-12):
    """Robust angle between vector batches via atan2(|v1 x v2|, v1.v2)
    (reference ppfnet_util.py:173-194).

    Values match atan2(|v1 x v2|, v1.v2) outside a ~sqrt(eps)=1e-6
    degenerate band: |v1 x v2|^2 <= eps flushes the cross norm to 0, so
    sub-1e-6 angles between unit vectors collapse to exactly 0 (or pi
    for anti-parallel), and pairs of ~1e-7-magnitude vectors return 0/pi
    regardless of true angle — including atan2(0, 0) = 0 for zero
    vectors (the torch reference's behavior, pinned by the PPFNet parity
    test, which samples well away from the band). The GRADIENT is
    guarded: d|c|/dc = c/|c| is NaN at c = 0 and datan2/(dy,dx) ~
    1/(x^2+y^2) is NaN at (0, 0); zero vectors (e.g. missing normals,
    self-neighbor d = 0) sit exactly there and would poison every
    gradient upstream. The double-where pins the degenerate point to
    (y, x) = (0, 1): same value (0), finite (zero) gradient."""
    cross = jnp.cross(v1, v2)
    s = jnp.sum(cross * cross, axis=-1)
    dot = jnp.sum(v1 * v2, axis=-1)
    safe_s = s > eps
    cross_norm = jnp.where(safe_s, jnp.sqrt(jnp.where(safe_s, s, 1.0)), 0.0)
    degen = ~safe_s & (jnp.abs(dot) <= eps)
    y = jnp.where(degen, jnp.zeros_like(cross_norm), cross_norm)
    x = jnp.where(degen, jnp.ones_like(dot), dot)
    return jnp.arctan2(y, x)


def angle_difference(m1, m2):
    """Pairwise angles between two stacks of unit(ish) vectors:
    (B, N, 3) x (B, M, 3) -> (B, N, M) (reference ppfnet_util.py:11-26)."""
    cos = jnp.einsum("...nc,...mc->...nm", m1, m2)
    n1 = jnp.linalg.norm(m1, axis=-1)[..., :, None]
    n2 = jnp.linalg.norm(m2, axis=-1)[..., None, :]
    return jnp.arccos(jnp.clip(cos / jnp.maximum(n1 * n2, 1e-12), -1.0, 1.0))


def pc_normalize(pc):
    """Center to centroid and scale to unit sphere. pc (..., N, 3)."""
    centroid = jnp.mean(pc, axis=-2, keepdims=True)
    pc = pc - centroid
    m = jnp.max(jnp.linalg.norm(pc, axis=-1), axis=-1)
    return pc / m[..., None, None]


def get_rri(pts, k):
    """Rotation-invariant representation, batched on device.

    pts (B, N, 3) (pre-centered) -> (B, N, 4k): per neighbor the features
    (|p|, |q|, theta(p, q), phi) where phi is the minimal in-plane angle to
    the other neighbors projected orthogonally to p. Spec: the reference's
    numpy ``get_rri`` (dataloaders.py:126-147; the CUDA twin rri.cu is
    absent upstream).
    """

    def single(p_cloud):
        # kNN excluding self (cKDTree query k+1, drop first).
        d = square_distance(p_cloud[None], p_cloud[None])[0]
        _, nbr_idx = jax.lax.top_k(-d, k + 1)
        nbr_idx = nbr_idx[:, 1:]  # (N, k)
        q = p_cloud[nbr_idx]  # (N, k, 3)
        p = jnp.broadcast_to(p_cloud[:, None, :], q.shape)
        rp = jnp.linalg.norm(p, axis=-1, keepdims=True)
        rq = jnp.linalg.norm(q, axis=-1, keepdims=True)
        pn = p / jnp.maximum(rp, 1e-12)
        qn = q / jnp.maximum(rq, 1e-12)
        dot = jnp.sum(pn * qn, axis=-1, keepdims=True)
        theta = jnp.arccos(jnp.clip(dot, -1.0, 1.0))
        T_q = q - dot * p  # neighbor component orthogonal-ish to p (ref formula)
        # Pairwise in-plane angles psi[a, b] between projected neighbors.
        cross = jnp.cross(T_q[:, None, :, :], T_q[:, :, None, :])  # (N, k, k, 3)
        sin_psi = jnp.sum(cross * pn[:, None, :, :], axis=-1)
        cos_psi = jnp.sum(T_q[:, None, :, :] * T_q[:, :, None, :], axis=-1)
        psi = jnp.arctan2(sin_psi, cos_psi) % (2.0 * jnp.pi)
        # Second-smallest psi along b (smallest is the self pair, psi=0).
        eye = jnp.eye(k, dtype=bool)
        phi = jnp.min(jnp.where(eye, jnp.inf, psi), axis=-1, keepdims=True)
        feat = jnp.concatenate([rp, rq, theta, phi], axis=-1)  # (N, k, 4)
        return feat.reshape(p_cloud.shape[0], 4 * k)

    return jax.vmap(single)(pts)
