"""Fused kNN + neighbor-gather Pallas kernel for EdgeConv-style graph
features.

The XLA path for DGCNN's ``get_graph_feature`` spends ~10 ms/direction in
``lax.top_k`` over the (N, N) distance matrix plus ~4 ms in the index
gather (measured on v5e at B=32, N=1024, k=20) while the actual matmuls
cost < 1 ms. This kernel does both in one HBM pass:

* distance tile (TN, N) computed with exact f32 differences in VMEM —
  the (N, N) matrix never exists in HBM;
* exact k-selection by k rounds of (argmin, mask) on the VPU;
* neighbor coordinates materialized per round by a one-hot (TN, N) @
  (N, C) MXU product — no scalar gathers at all (C=3, so the product is
  ~MFLOPs).

Output layout: (B, N, pad128(3k)) with the first 3k lanes holding the
k-major neighbor xyz; callers reshape and append the (free, broadcast)
center features.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BIG = 1e30


def _round_up(x, m):
    return (x + m - 1) // m * m


def _edge_kernel(x_tile_ref, x_full_ref, out_ref, *, k, n_valid, tile_n):
    xt = x_tile_ref[0]  # (3, TN) query rows
    xf = x_full_ref[0]  # (3, N) all points
    # exact f32 pairwise squared distances on the VPU
    d0 = xt[0][:, None] - xf[0][None, :]
    d1 = xt[1][:, None] - xf[1][None, :]
    d2 = xt[2][:, None] - xf[2][None, :]
    d = d0 * d0 + d1 * d1 + d2 * d2  # (TN, N)
    col = jax.lax.broadcasted_iota(jnp.int32, d.shape, 1)
    d = jnp.where(col < n_valid, d, _BIG)

    xf_t = jnp.transpose(xf)  # (N, 3)
    # bf16x2 split: the MXU rounds f32 inputs to bf16; a hi+lo pass keeps
    # the gathered coordinates accurate to ~1e-5 relative (one-hot rows
    # are exactly representable, so only the value operand needs the split).
    xf_hi = xf_t.astype(jnp.bfloat16).astype(jnp.float32)
    xf_lo = xf_t - xf_hi
    # two fused VPU passes per round (kernels/dgcnn_fused.py restructure):
    # the row-min is carried; pass 1 resolves the argmin index (first
    # match == argmin's tie order), pass 2 builds the one-hot, masks the
    # column and reduces the next row-min in one traversal
    m = jnp.min(d, axis=1)
    for j in range(k):
        mi = jnp.min(jnp.where(d == m[:, None], col, jnp.int32(n_valid)), axis=1)
        eq = col == mi[:, None]
        onehot = eq.astype(jnp.float32)
        nbr = jax.lax.dot_general(
            onehot, xf_hi, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        ) + jax.lax.dot_general(
            onehot, xf_lo, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )  # (TN, 3)
        out_ref[0, :, 3 * j : 3 * (j + 1)] = nbr
        d = jnp.where(eq, _BIG, d)
        m = jnp.min(d, axis=1)


def knn_neighbors_pallas(x, k, tile_n=256):
    """x (B, N, 3) -> neighbor coords (B, N, k, 3), nearest first (self
    included, like reference knn). Exact."""
    B, N, _ = x.shape
    Np = _round_up(N, tile_n)
    out_c = _round_up(3 * k, 128)
    xt = jnp.swapaxes(x, 1, 2).astype(jnp.float32)  # (B, 3, N)
    if Np != N:
        xt = jnp.pad(xt, ((0, 0), (0, 0), (0, Np - N)))

    grid = (B, Np // tile_n)
    out = pl.pallas_call(
        functools.partial(_edge_kernel, k=k, n_valid=N, tile_n=tile_n),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 3, tile_n), lambda b, i: (b, 0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3, Np), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, tile_n, out_c), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((B, Np, out_c), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * Np * Np * (3 + k),
            bytes_accessed=4 * B * Np * (3 + out_c),
            transcendentals=0,
        ),
    )(xt, xt)
    return out[:, :N, : 3 * k].reshape(B, N, k, 3)


def get_graph_feature_fused(x, k=20, use_pallas=None):
    """DGCNN edge features (B, N, k, 6) = concat(neighbor, center) — the
    fused fast path for 3-channel inputs. Falls back to the generic
    gather-based op off-TPU or for non-xyz inputs."""
    from learning3d_tpu.ops.geometry import get_graph_feature

    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    if not use_pallas or x.shape[-1] != 3:
        return get_graph_feature(x, k=k)
    nbr = knn_neighbors_pallas(x, k)  # (B, N, k, 3)
    center = jnp.broadcast_to(x[:, :, None, :], nbr.shape).astype(nbr.dtype)
    return jnp.concatenate([nbr, center], axis=-1)
