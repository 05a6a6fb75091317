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


def knn_blocked(queries, points, k, tile=1024):
    """Top-k nearest neighbors of ``queries`` (B, N, C) among ``points``
    (B, M, C) without materializing the full (N, M) distance matrix.

    Returns (sq_dists (B, N, k), idx (B, N, k)), nearest first.
    """
    B, N, C = queries.shape
    if N <= tile:
        return _knn_tile(queries, points, k)
    pad = (-N) % tile
    q = jnp.pad(queries, ((0, 0), (0, pad), (0, 0))) if pad else queries
    q = q.reshape(B, -1, tile, C)  # (B, T, tile, C)
    q = jnp.swapaxes(q, 0, 1)  # (T, B, tile, C)

    def one(q_tile):
        return _knn_tile(q_tile, points, k)

    d, idx = jax.lax.map(one, q)
    d = jnp.swapaxes(d, 0, 1).reshape(B, -1, k)[:, :N]
    idx = jnp.swapaxes(idx, 0, 1).reshape(B, -1, k)[:, :N]
    return d, idx


def _knn_tile(q, p, k):
    d = jnp.sum(q * q, -1)[..., :, None] + jnp.sum(p * p, -1)[..., None, :]
    d = d - 2.0 * jnp.einsum("bnc,bmc->bnm", q, p, precision=jax.lax.Precision.HIGHEST)
    neg, idx = jax.lax.top_k(-d, k)
    return -neg, idx
