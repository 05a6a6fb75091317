"""Chamfer nearest-neighbor distance — blockwise Pallas TPU kernel.

TPU-native equivalent of the reference's CUDA extension
(losses/cuda/chamfer_distance/chamfer_distance.cu:6-156): per-point min
squared distance in both directions plus argmin indices. The kernel tiles
the (N, M) distance matrix through VMEM with a running min — the full
matrix never touches HBM (flash-style). Gradients go through a custom VJP
that replays only gathers/scatters from the saved argmin indices.

Points are laid out (B, 3, N): the point axis lands on the 128-wide lane
dimension, and the pairwise matmul contracts the tiny C=3 axis.
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


def _nn_kernel(x_ref, y_ref, min_ref, idx_ref, *, m_valid, tile_m, sub):
    """One (batch, x-tile, y-tile) grid step: running min over y tiles.

    Outputs are written as (sub, 128) tiles — TPU requires the last two
    block dims to be (8k, 128k)-aligned, so the per-point vectors live in
    (B, n_tiles, sub, 128) layout and are flattened by the caller.
    """
    j = pl.program_id(2)
    xt = x_ref[0]  # (3, TN)
    yt = y_ref[0]  # (3, TM)
    # Exact f32 differences on the VPU — with C=3 the MXU form would
    # round inputs to bf16 and costs nothing to avoid.
    d0 = xt[0][:, None] - yt[0][None, :]
    d1 = xt[1][:, None] - yt[1][None, :]
    d2 = xt[2][:, None] - yt[2][None, :]
    d = d0 * d0 + d1 * d1 + d2 * d2  # (TN, TM)
    # Mask out padded y columns.
    col = j * tile_m + jax.lax.broadcasted_iota(jnp.int32, d.shape, 1)
    d = jnp.where(col < m_valid, d, _BIG)

    local_min = jnp.min(d, axis=1).reshape(sub, 128)
    local_arg = (j * tile_m + jnp.argmin(d, axis=1)).astype(jnp.int32).reshape(sub, 128)

    @pl.when(j == 0)
    def _():
        min_ref[0, 0] = local_min
        idx_ref[0, 0] = local_arg

    @pl.when(j > 0)
    def _():
        better = local_min < min_ref[0, 0]
        idx_ref[0, 0] = jnp.where(better, local_arg, idx_ref[0, 0])
        min_ref[0, 0] = jnp.minimum(local_min, min_ref[0, 0])


def _nn_oneway_pallas(x, y, tile_n=1024, tile_m=1024):
    """x (B, N, 3), y (B, M, 3) -> (min_sqdist (B, N), argmin (B, N))."""
    B, N, _ = x.shape
    M = y.shape[1]
    Np, Mp = _round_up(N, tile_n), _round_up(M, tile_m)
    sub = tile_n // 128
    xt = jnp.swapaxes(x, 1, 2)  # (B, 3, N)
    yt = jnp.swapaxes(y, 1, 2)
    if Np != N:
        xt = jnp.pad(xt, ((0, 0), (0, 0), (0, Np - N)))
    if Mp != M:
        yt = jnp.pad(yt, ((0, 0), (0, 0), (0, Mp - M)))

    n_tiles = Np // tile_n
    grid = (B, n_tiles, Mp // tile_m)
    mind, argd = pl.pallas_call(
        functools.partial(_nn_kernel, m_valid=M, tile_m=tile_m, sub=sub),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 3, tile_n), lambda b, i, j: (b, 0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3, tile_m), lambda b, i, j: (b, 0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, sub, 128), lambda b, i, j: (b, i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, sub, 128), lambda b, i, j: (b, i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, n_tiles, sub, 128), jnp.float32),
            jax.ShapeDtypeStruct((B, n_tiles, sub, 128), jnp.int32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * B * Np * Mp * 3,
            bytes_accessed=4 * B * (3 * Np + 3 * Mp * (Np // tile_n)),
            transcendentals=0,
        ),
    )(xt, yt)
    return mind.reshape(B, Np)[:, :N], argd.reshape(B, Np)[:, :N]


def _nn_oneway_xla(x, y):
    """Pure-XLA oracle: full (N, M) distance matrix + min/argmin."""
    d = jnp.sum(x * x, -1)[..., :, None] + jnp.sum(y * y, -1)[..., None, :]
    d = d - 2.0 * jnp.einsum(
        "bnc,bmc->bnm", x, y, precision=jax.lax.Precision.HIGHEST
    )
    return jnp.min(d, -1), jnp.argmin(d, -1).astype(jnp.int32)


def nn_distance(x, y, use_pallas=None):
    """Both-direction nearest-neighbor search.

    x (B, N, 3), y (B, M, 3) -> (d1 (B, N), idx1 (B, N), d2 (B, M),
    idx2 (B, M)) with d = squared L2 to the nearest point of the other
    cloud. No gradient flows through this (use chamfer_distance).
    """
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    f = _nn_oneway_pallas if use_pallas else _nn_oneway_xla
    x = x.astype(jnp.float32)
    y = y.astype(jnp.float32)
    if use_pallas:
        # Layout fence: without it, XLA may propagate an exotic layout from
        # an upstream producer (e.g. a model decoder) into the pallas
        # custom-call operands and CHECK-crash the TPU compiler.
        x, y = jax.lax.optimization_barrier((x, y))
    d1, i1 = f(x, y)
    d2, i2 = f(y, x)
    return d1, i1, d2, i2


def _gather_pts(pts, idx):
    return jnp.take_along_axis(pts, idx[..., None], axis=1)


def _scatter_add(target_shape_like, idx, vals):
    """Per-batch scatter-add of vals (B, M, 3) into rows idx (B, M)."""

    def one(idx_b, val_b):
        return jnp.zeros(target_shape_like[1:], val_b.dtype).at[idx_b].add(val_b)

    return jax.vmap(one)(idx, vals)


@jax.custom_vjp
def chamfer_distance(x, y):
    """Differentiable two-sided squared Chamfer terms.

    Returns (d1 (B, N), d2 (B, M)); gradients treat the argmin matching as
    locally constant (exactly the reference autograd Function's backward,
    chamfer_distance.cu:158+).
    """
    d1, _, d2, _ = nn_distance(x, y)
    return d1, d2


def _chamfer_fwd(x, y):
    d1, i1, d2, i2 = nn_distance(x, y)
    return (d1, d2), (x, y, i1, i2)


def _chamfer_bwd(res, g):
    x, y, i1, i2 = res
    g1, g2 = g  # (B, N), (B, M)
    y_near = _gather_pts(y, i1)  # nearest y for each x
    x_near = _gather_pts(x, i2)  # nearest x for each y
    # d|x - y*|^2/dx and the scatter of d|y - x*|^2/dx* contributions.
    dx = 2.0 * g1[..., None] * (x - y_near)
    dx = dx + _scatter_add(x.shape, i2, 2.0 * g2[..., None] * (x_near - y))
    dy = 2.0 * g2[..., None] * (y - x_near)
    dy = dy + _scatter_add(y.shape, i1, 2.0 * g1[..., None] * (y_near - x))
    return dx, dy


chamfer_distance.defvjp(_chamfer_fwd, _chamfer_bwd)
