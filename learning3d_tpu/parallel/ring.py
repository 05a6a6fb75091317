"""Ring-sharded pairwise ops for large clouds (context/sequence parallelism
over the point axis).

The reference's "sequence" axis is N points; it only ever scales N by
subsampling (SURVEY.md §5.7). Here N can be sharded across a mesh axis:
each device holds an N/d slice, and exact kNN / Chamfer are computed by
rotating the partner shard around the ring with lax.ppermute while keeping
a running top-k/min — the point-cloud analogue of ring attention. The
(N, N) matrix never exists; peak memory is O(N^2 / d^2) per device.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P
from jax import shard_map

from learning3d_tpu.ops.geometry import square_distance


def _ring_perm(n):
    return [(i, (i + 1) % n) for i in range(n)]


def ring_knn(points, k, mesh, axis="model", batch_axis=None):
    """Exact self-kNN of (B, N, C) with N sharded over ``axis``.

    Returns (sq_dists (B, N, k), global idx (B, N, k)), both sharded the
    same way as the input. k must be <= N/d. Pass ``batch_axis`` when the
    batch dim is also mesh-sharded (DP x ring) so no resharding happens
    at the shard_map boundary.
    """
    d = mesh.shape[axis]
    N = points.shape[1]
    chunk = N // d
    spec = P(batch_axis, axis, None)

    def local_fn(x_loc):
        my = jax.lax.axis_index(axis)

        def merge(best_d, best_i, d2, src_shard):
            offs = src_shard * chunk
            nd, ni = jax.lax.top_k(-d2, min(k, d2.shape[-1]))
            ni = ni + offs
            cat_d = jnp.concatenate([best_d, -nd], axis=-1)
            cat_i = jnp.concatenate([best_i, ni], axis=-1)
            nd2, order = jax.lax.top_k(-cat_d, k)
            return -nd2, jnp.take_along_axis(cat_i, order, axis=-1)

        best_d = jnp.full(x_loc.shape[:2] + (k,), jnp.inf, x_loc.dtype)
        best_i = jnp.zeros(x_loc.shape[:2] + (k,), jnp.int32)
        visiting = x_loc
        src = my
        for step in range(d):
            d2 = square_distance(x_loc, visiting)
            best_d, best_i = merge(best_d, best_i, d2, src)
            if step < d - 1:
                visiting = jax.lax.ppermute(visiting, axis, _ring_perm(d))
                src = (src - 1) % d
        return best_d, best_i

    out2 = P(*spec[:2], None)
    fn = shard_map(
        local_fn, mesh=mesh, in_specs=(spec,),
        out_specs=(out2, out2), check_vma=False,
    )
    return fn(points)


def ring_chamfer(x, y, mesh, axis="model", batch_axis=None):
    """Exact two-sided Chamfer min-distances with both clouds' point axes
    sharded over ``axis``. Returns (d1 (B, N), d2 (B, M)) sharded.
    ``batch_axis`` keeps an existing DP sharding of the batch dim."""
    d = mesh.shape[axis]
    spec3 = P(batch_axis, axis, None)
    spec2 = P(batch_axis, axis)

    def oneway(a_loc, b_loc):
        best = jnp.full(a_loc.shape[:2], jnp.inf, a_loc.dtype)
        visiting = b_loc
        for step in range(d):
            d2 = square_distance(a_loc, visiting)
            best = jnp.minimum(best, jnp.min(d2, axis=-1))
            if step < d - 1:
                visiting = jax.lax.ppermute(visiting, axis, _ring_perm(d))
        return best

    def local_fn(x_loc, y_loc):
        return oneway(x_loc, y_loc), oneway(y_loc, x_loc)

    fn = shard_map(
        local_fn, mesh=mesh, in_specs=(spec3, spec3), out_specs=(spec2, spec2),
        check_vma=False,
    )
    return fn(x, y)


def ring_attention(q, k, v, mesh, axis="model", batch_axis=None, scale=None):
    """Exact softmax attention with the point axis sharded over ``axis``
    — the ring-attention analogue for point-cloud transformers (the
    reference's pointer attends over N<=1024 points in one device,
    utils/transformer.py; here N is unbounded by one chip's memory).

    q: (B, H, N, Dh) sharded on N; k, v: (B, H, M, Dh) sharded on M
    (self-attention when the shards come from the same cloud, cross-
    attention — DCP's pointer — when they don't). Each step scores the
    local q chunk against the visiting K/V shard and folds it into a
    running max/denominator/accumulator (flash-style log-sum-exp), then
    rotates K/V around the ring with ppermute. The (N, M) score matrix
    never exists; peak memory is O(N*M/d^2) per device. All ops are jnp,
    so the ring is differentiable (grads pinned vs dense in
    tests/test_parallel_ring.py). Returns (B, H, N, Dh) sharded like q.
    """
    d = mesh.shape[axis]
    if scale is None:
        scale = 1.0 / (q.shape[-1] ** 0.5)
    spec = P(batch_axis, None, axis, None)

    def local_fn(q_loc, k_loc, v_loc):
        f32 = jnp.float32
        qf = q_loc.astype(f32) * scale
        m = jnp.full(qf.shape[:-1], -jnp.inf, f32)  # (B, H, n)
        l = jnp.zeros(qf.shape[:-1], f32)
        acc = jnp.zeros(qf.shape, f32)
        vis_k, vis_v = k_loc, v_loc
        for step in range(d):
            s = jnp.einsum("bhnd,bhmd->bhnm", qf, vis_k.astype(f32))
            m_new = jnp.maximum(m, jnp.max(s, axis=-1))
            p = jnp.exp(s - m_new[..., None])
            corr = jnp.exp(m - m_new)
            l = l * corr + jnp.sum(p, axis=-1)
            acc = acc * corr[..., None] + jnp.einsum(
                "bhnm,bhmd->bhnd", p, vis_v.astype(f32)
            )
            m = m_new
            if step < d - 1:
                vis_k = jax.lax.ppermute(vis_k, axis, _ring_perm(d))
                vis_v = jax.lax.ppermute(vis_v, axis, _ring_perm(d))
        return (acc / l[..., None]).astype(q_loc.dtype)

    fn = shard_map(
        local_fn, mesh=mesh, in_specs=(spec, spec, spec), out_specs=spec,
        check_vma=False,
    )
    return fn(q, k, v)


def sharded_square_distance(x, y, mesh, axis="model"):
    """(B, N, C) x (B, M, C) -> (B, N, M) with N sharded over ``axis``
    (the result stays sharded on its N axis; y is replicated)."""
    spec_x = P(None, axis, None)
    spec_y = P(None, None, None)
    spec_o = P(None, axis, None)

    fn = shard_map(
        lambda a, b: square_distance(a, b),
        mesh=mesh, in_specs=(spec_x, spec_y), out_specs=spec_o, check_vma=False,
    )
    return fn(x, y)
