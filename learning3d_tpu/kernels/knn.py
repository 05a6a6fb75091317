"""Memory-bounded kNN for large clouds.

The plain ``ops.geometry.knn`` materializes the (N, M) distance matrix —
the right call for the reference's regime (N <= 2048, exactly what the
torch implementation does, model_common_utils.py:3-9). ``knn_blocked``
processes query tiles through a ``lax.map`` so peak memory is
O(tile * M) instead of O(N * M): the path to beyond-reference cloud sizes
(SURVEY.md §5.7).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def knn_blocked(queries, points, k, tile=1024, point_tile=8192):
    """Top-k nearest neighbors of ``queries`` (B, N, C) among ``points``
    (B, M, C) without materializing the full (N, M) distance matrix.

    Queries are tiled to ``tile`` rows; past ``point_tile`` the point
    axis is streamed in chunks with a running top-k merge (top_k inside
    each chunk, then top_k over the 2k concat with the carry). XLA's
    top_k over the full M row is a per-row SORT — at M=32768 it
    dominated the blocked path ~50x over the distance matmuls, and at
    M=65536 it faulted the TPU worker outright (round-5 large-N run).
    The merge keeps every sort at most ``point_tile`` wide, so cost
    scales like M·log(point_tile) with bounded memory.

    Returns (sq_dists (B, N, k), idx (B, N, k)), nearest first.
    """
    B, N, C = queries.shape
    M = points.shape[1]
    if N <= tile and M <= point_tile:
        return _knn_tile(queries, points, k)

    def one(q_tile):  # (B, tile, C) -> top-k among all of `points`
        if M <= point_tile:
            return _knn_tile(q_tile, points, k)
        padM = (-M) % point_tile
        # pad rows sit at a huge coordinate so they can never enter a
        # chunk's LOCAL top-k ahead of real points (zero-padding would:
        # the origin can be the true nearest neighborhood)
        p = (
            jnp.pad(points, ((0, 0), (0, padM), (0, 0)),
                    constant_values=1e18)
            if padM
            else points
        )
        chunks = jnp.swapaxes(
            p.reshape(B, -1, point_tile, C), 0, 1
        )  # (Tp, B, point_tile, C)
        n_valid = M  # pad rows get +inf distance below

        def merge(carry, inp):
            d_best, i_best = carry  # (B, tile, k) running nearest
            c, p_chunk = inp
            d, idx = _knn_tile(q_tile, p_chunk, k)  # local top-k
            base = c * point_tile
            # mask pad rows (only the last chunk has them)
            valid = (base + idx) < n_valid
            d = jnp.where(valid, d, jnp.inf)
            d2 = jnp.concatenate([d_best, d], -1)  # (B, tile, 2k)
            i2 = jnp.concatenate([i_best, base + idx], -1)
            neg, sel = jax.lax.top_k(-d2, k)
            return (-neg, jnp.take_along_axis(i2, sel, -1)), None

        init = (
            jnp.full((B, q_tile.shape[1], k), jnp.inf, points.dtype),
            jnp.zeros((B, q_tile.shape[1], k), jnp.int32),
        )
        (d, idx), _ = jax.lax.scan(
            merge, init, (jnp.arange(chunks.shape[0]), chunks)
        )
        return d, idx

    if N <= tile:
        return one(queries)
    pad = (-N) % tile
    q = jnp.pad(queries, ((0, 0), (0, pad), (0, 0))) if pad else queries
    q = q.reshape(B, -1, tile, C)  # (B, T, tile, C)
    q = jnp.swapaxes(q, 0, 1)  # (T, B, tile, C)

    d, idx = jax.lax.map(one, q)
    d = jnp.swapaxes(d, 0, 1).reshape(B, -1, k)[:, :N]
    idx = jnp.swapaxes(idx, 0, 1).reshape(B, -1, k)[:, :N]
    return d, idx


def _knn_tile(q, p, k):
    d = jnp.sum(q * q, -1)[..., :, None] + jnp.sum(p * p, -1)[..., None, :]
    d = d - 2.0 * jnp.einsum("bnc,bmc->bnm", q, p, precision=jax.lax.Precision.HIGHEST)
    neg, idx = jax.lax.top_k(-d, k)
    return -neg, idx


# --- Pallas exact-kNN kernel (indices + distances) -------------------------
#
# The XLA path materializes the (B, S, N) distance matrix in HBM and runs
# ``lax.top_k`` over it (~19 ms at B=32, N=1024, k=20 on v5e — the top_k
# sort dominates, see tools/profile_dcp.py). Here the distance tile lives
# in VMEM and k rounds of (min, first-match-index, mask) extract the
# neighbors:
#
# * exact f32 distances from per-coordinate differences (not the matmul
#   expansion), so selection is at least as accurate as the XLA oracle;
# * ties broken toward the smaller index — the same order ``lax.top_k``
#   returns for equal values;
# * no VJP: indices are integer outputs, and callers differentiate through
#   the downstream gather, never through the selection.
#
# Used by ops.geometry.knn / knn_point on TPU for coordinate inputs
# (exact per-coordinate differences) and for feature spaces up to 256
# channels (PRNet's dynamic graphs), where the cross term runs on the MXU
# with the same |q|^2 - 2qp + |p|^2 expansion as the XLA path.

import functools

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BIG = 1e30


def _round_up(x, m):
    return (x + m - 1) // m * m


def _knn_kernel(q_ref, p_ref, di_ref, ii_ref, *, k, n_valid):
    qt = q_ref[0]  # (C, TS)
    pt = p_ref[0]  # (C, N)
    if qt.shape[0] == 3:
        # coordinates: exact per-coordinate differences (at least as
        # accurate as the XLA matmul expansion)
        d0 = qt[0][:, None] - pt[0][None, :]
        d1 = qt[1][:, None] - pt[1][None, :]
        d2 = qt[2][:, None] - pt[2][None, :]
        d = d0 * d0 + d1 * d1 + d2 * d2  # (TS, N)
    else:
        # feature space: |q|^2 - 2 q.p + |p|^2 with the cross term on the
        # MXU (same expansion as the XLA path, ops/geometry.py
        # square_distance; channel padding is zeros so distances are
        # unaffected)
        cross = jax.lax.dot_general(
            qt, pt, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            # selection is sensitive to the bf16 MXU default (94% index
            # match at C=64); full-f32 passes match ops.geometry
            # square_distance's HIGHEST-precision oracle
            precision=jax.lax.Precision.HIGHEST,
        )  # (TS, N)
        q_sq = jnp.sum(qt * qt, axis=0)[:, None]
        p_sq = jnp.sum(pt * pt, axis=0)[None, :]
        d = q_sq - 2.0 * cross + p_sq
    col = jax.lax.broadcasted_iota(jnp.int32, d.shape, 1)
    d = jnp.where(col < n_valid, d, _BIG)

    ts = d.shape[0]
    kp = di_ref.shape[2]
    lane = jax.lax.broadcasted_iota(jnp.int32, (ts, kp), 1)

    # Two fused VPU passes per round (same restructure as
    # kernels/dgcnn_fused.py, round 3): the row-min is CARRIED — pass 1
    # resolves the argmin index from it, pass 2 masks the column and
    # reduces the next row-min in one traversal. The (TS, kp) accumulator
    # updates are lane-width, not N-width.
    def body(j, carry):
        d, m, dacc, iacc = carry
        # first-match index == smallest index among ties (top_k order)
        mi = jnp.min(jnp.where(d == m[:, None], col, jnp.int32(n_valid)), axis=1)
        sel = lane == j
        dacc = jnp.where(sel, m[:, None], dacc)
        iacc = jnp.where(sel, mi[:, None], iacc)
        d = jnp.where(col == mi[:, None], _BIG, d)
        return d, jnp.min(d, axis=1), dacc, iacc

    _, _, dacc, iacc = jax.lax.fori_loop(
        0,
        k,
        body,
        (
            d,
            jnp.min(d, axis=1),
            jnp.zeros((ts, kp), jnp.float32),
            jnp.zeros((ts, kp), jnp.int32),
        ),
    )
    di_ref[0] = dacc
    ii_ref[0] = iacc


def knn_pallas(queries, points, k, tile_s=256):
    """Exact k nearest neighbors of each query among ``points``.

    queries (B, S, C), points (B, N, C), C <= 256 -> (sq_dist (B, S, k)
    f32, idx (B, S, k) int32), nearest first, ties toward the smaller
    index. C == 3 computes exact per-coordinate differences (coincident
    points give d == 0 exactly); C > 3 uses the matmul expansion
    |q|^2 - 2 q.p + |p|^2 on the MXU at HIGHEST precision.
    """
    B, N, C = points.shape
    S = queries.shape[1]
    Cp = 3 if C == 3 else _round_up(C, 8)
    Np = _round_up(N, 128)
    Sp = _round_up(S, tile_s) if S > tile_s else _round_up(S, 8)
    tile = min(tile_s, Sp)
    kp = _round_up(k, 128)
    pt = jnp.swapaxes(points, 1, 2).astype(jnp.float32)
    qt = jnp.swapaxes(queries, 1, 2).astype(jnp.float32)
    if Np != N or Cp != C:
        pt = jnp.pad(pt, ((0, 0), (0, Cp - C), (0, Np - N)))
    if Sp != S or Cp != C:
        qt = jnp.pad(qt, ((0, 0), (0, Cp - C), (0, Sp - S)))
    dist, idx = pl.pallas_call(
        functools.partial(_knn_kernel, k=k, n_valid=N),
        grid=(B, Sp // tile),
        in_specs=[
            pl.BlockSpec((1, Cp, tile), lambda b, i: (b, 0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Cp, Np), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, tile, kp), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile, kp), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, Sp, kp), jnp.float32),
            jax.ShapeDtypeStruct((B, Sp, kp), jnp.int32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * B * Sp * Np * (Cp + k),
            bytes_accessed=4 * B * (Np * Cp + Sp * (Cp + 2 * kp)),
            transcendentals=0,
        ),
    )(qt, pt)
    # materialize the compact (B, S, k) views: downstream gathers are
    # bandwidth-bound, and letting them fuse the slice means re-reading
    # the 128-lane padded kernel output on every consumer
    return jax.lax.optimization_barrier((dist[:, :S, :k], idx[:, :S, :k]))
