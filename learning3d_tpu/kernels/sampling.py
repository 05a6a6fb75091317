"""Pallas FPS + ball-query kernels.

The lax.scan FPS pays per-step XLA dispatch overhead (~10 ms for
2048->1024 at B=16 on v5e — the loop body itself is microseconds of VPU
work), and the ball query's top-k over the masked index matrix costs
~12 ms. Both collapse to single Pallas programs that keep all state in
VMEM:

* ``fps_pallas`` — one grid step per batch item; the min-distance vector
  and running selection live in VMEM across the whole npoint loop;
* ``ball_query_pallas`` — distance tile + index-mask in VMEM, k rounds of
  row-min extraction (the selected "values" ARE the indices, so masking is
  a simple equality update). Semantics identical to
  ops.geometry.query_ball_point (ascending in-ball indices, first-index
  padding).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_MAX_NPOINT = 1024


def _round_up(x, m):
    return (x + m - 1) // m * m


def _fps_kernel(x0_ref, x1_ref, x2_ref, start_ref, out_ref, *, npoint, n_valid):
    """Batch-vectorized FPS: all Bt items advance together, each loop
    iteration is full-width (Bt, N) VPU work."""
    x0, x1, x2 = x0_ref[:, 0, :], x1_ref[:, 0, :], x2_ref[:, 0, :]  # (Bt, N)
    Bt, N = x0.shape
    col = jax.lax.broadcasted_iota(jnp.int32, (Bt, N), 1)
    valid = col < n_valid
    pos = jax.lax.broadcasted_iota(jnp.int32, (Bt, out_ref.shape[1]), 1)

    def body(i, carry):
        dist, cur, acc = carry  # (Bt,N), (Bt,), (Bt,P)
        onehot = (col == cur[:, None]).astype(jnp.float32)
        c0 = jnp.sum(x0 * onehot, axis=1, keepdims=True)  # (Bt,1)
        c1 = jnp.sum(x1 * onehot, axis=1, keepdims=True)
        c2 = jnp.sum(x2 * onehot, axis=1, keepdims=True)
        d = (x0 - c0) ** 2 + (x1 - c1) ** 2 + (x2 - c2) ** 2
        dist = jnp.minimum(dist, d)
        masked = jnp.where(valid, dist, -1.0)
        # argmax via max + first-match index (Mosaic's argmax lowering
        # fails to legalize at some shapes); ties -> smallest index,
        # matching jnp.argmax semantics.
        m = jnp.max(masked, axis=1, keepdims=True)
        nxt = jnp.min(jnp.where(masked == m, col, jnp.int32(N)), axis=1)
        acc = acc + jnp.where(pos == i, cur[:, None], 0)
        return dist, nxt, acc

    dist0 = jnp.full((Bt, N), 1e10, jnp.float32)
    acc0 = jnp.zeros((Bt, out_ref.shape[1]), jnp.int32)
    _, _, acc = jax.lax.fori_loop(
        0, npoint, body, (dist0, start_ref[:, 0], acc0)
    )
    out_ref[...] = acc


def fps_pallas(xyz, npoint, start=None, batch_tile=8):
    """xyz (B, N, 3) -> FPS indices (B, npoint). start=None begins at
    point 0 (the pointconv/curvenet deterministic convention); pass an
    int32 (B,) array for random starts. npoint <= 1024."""
    if npoint > _MAX_NPOINT:
        raise ValueError(f"fps_pallas supports npoint <= {_MAX_NPOINT}")
    B, N, _ = xyz.shape
    Np = _round_up(N, 128)
    Bt = min(batch_tile, B)
    Bp = _round_up(B, Bt)
    P = _round_up(npoint, 128)
    xt = jnp.swapaxes(xyz, 1, 2).astype(jnp.float32)  # (B, 3, N)
    xt = jnp.pad(xt, ((0, Bp - B), (0, 0), (0, Np - N)))
    if start is None:
        start = jnp.zeros((Bp,), jnp.int32)
    else:
        start = jnp.pad(start.astype(jnp.int32), (0, Bp - B))
    start2d = jnp.broadcast_to(start[:, None], (Bp, 128))
    # one input ref per coordinate: keeps every in-kernel array 2-D (Bt, N)
    x0, x1, x2 = xt[:, 0:1, :], xt[:, 1:2, :], xt[:, 2:3, :]
    spec = pl.BlockSpec((Bt, 1, Np), lambda b: (b, 0, 0), memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_fps_kernel, npoint=npoint, n_valid=N),
        grid=(Bp // Bt,),
        in_specs=[
            spec, spec, spec,
            pl.BlockSpec((Bt, 128), lambda b: (b, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((Bt, P), lambda b: (b, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Bp, P), jnp.int32),
    )(x0, x1, x2, start2d)
    return out[:B, :npoint]


def _ball_group_kernel(
    q_ref, p_ref, it_ref, v_ref, out_ref, *, radius2, nsample, n_valid, n_chan
):
    """Ball query (self-excluding, center-padded) fused with a one-hot MXU
    gather of per-point values — the (S, N) distance matrix and the gather
    indices never leave VMEM."""
    qt = q_ref[0]  # (3, TS)
    pt = p_ref[0]  # (3, N)
    itself = it_ref[0, 0]  # (TS,) int32
    d0 = qt[0][:, None] - pt[0][None, :]
    d1 = qt[1][:, None] - pt[1][None, :]
    d2 = qt[2][:, None] - pt[2][None, :]
    d = d0 * d0 + d1 * d1 + d2 * d2  # (TS, N)
    col = jax.lax.broadcasted_iota(jnp.int32, d.shape, 1)
    iscenter = col == itself[:, None]
    mask = (d <= radius2) & (col < n_valid) & ~iscenter  # in-ball, not self

    # Rank of each in-ball column = number of in-ball columns with smaller
    # index, via one MXU pass against a strict lower-triangular ones
    # matrix (0/1 operands are bf16-exact; f32 accumulation keeps the
    # counts exact). Selecting by ascending *index* (the reference's sort
    # semantics) then needs no sequential min/mask chain at all: round j's
    # one-hot is just (rank == j).
    n = d.shape[1]
    tri = (
        jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
        < jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
    ).astype(jnp.bfloat16)
    mask_b = mask.astype(jnp.bfloat16)
    rank = jax.lax.dot_general(
        mask_b, tri, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )  # (TS, N) float counts, exact
    rank_key = jnp.where(mask, rank, -1.0)
    count = jnp.sum(mask_b.astype(jnp.float32), axis=1, keepdims=True)  # (TS, 1)

    vals_t = jnp.transpose(v_ref[0])  # (N, C)
    # bf16x2 split: one-hot rows are exactly representable, only the value
    # operand needs hi+lo passes (~1e-5 relative; same trick as edgeconv).
    # Operands are cast to bf16 explicitly — f32 MXU inputs cost multiple
    # passes, and every operand here is bf16-exact (0/1 or already split).
    hi = vals_t.astype(jnp.bfloat16)
    lo = (vals_t - hi.astype(jnp.float32)).astype(jnp.bfloat16)

    ts = d.shape[0]
    ns_c = nsample * n_chan
    # rolled loop (unrolling keeps nsample one-hot buffers live -> VMEM
    # OOM); round j's (TS, C) gather lands in lanes [C*j, C*(j+1)) via a
    # one-hot placement matmul (exact: entries are 0/1, one per column)
    rowi = jax.lax.broadcasted_iota(jnp.int32, (n_chan, ns_c), 0)
    coli = jax.lax.broadcasted_iota(jnp.int32, (n_chan, ns_c), 1)
    rowmask = coli % n_chan == rowi
    slot = coli // n_chan

    def body(j, acc):
        jf = j.astype(jnp.float32)
        # pad short neighborhoods with the center point's values
        onehot = ((rank_key == jf) | (iscenter & (count <= jf))).astype(jnp.bfloat16)
        # hi and lo must stay separate through the placement matmul too:
        # the MXU rounds its inputs to bf16, and a one-hot gather of a
        # bf16 value is exactly representable while their f32 sum is not.
        ghi = jax.lax.dot_general(
            onehot, hi, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )  # (TS, C)
        glo = jax.lax.dot_general(
            onehot, lo, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        place = (rowmask & (slot == j)).astype(jnp.bfloat16)  # (C, ns_c)
        return acc + jax.lax.dot_general(
            ghi.astype(jnp.bfloat16), place,
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
        ) + jax.lax.dot_general(
            glo.astype(jnp.bfloat16), place,
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
        )

    acc = jax.lax.fori_loop(
        0, nsample, body, jnp.zeros((ts, ns_c), jnp.float32)
    )
    out_ref[0] = acc


def ball_group_pallas(radius, nsample, xyz, new_xyz, itself_idx, values, tile_s=256):
    """Fused PPFNet-style grouping: for each query in ``new_xyz`` select up
    to ``nsample`` in-ball neighbors of ``xyz`` (ascending index order, the
    query point itself excluded, short neighborhoods padded with the
    center, reference ppfnet_util.py:96-131) and gather ``values``
    (B, N, C) at them. Returns (B, S, nsample, C) float32.

    Inputs are geometry (no parameter dependence), so no VJP is defined —
    callers only differentiate downstream of the gathered values.
    """
    B, N, _ = xyz.shape
    S = new_xyz.shape[1]
    C = values.shape[2]
    Np = _round_up(N, 128)
    Sp = _round_up(S, tile_s)
    if nsample * C % 128:
        raise ValueError("nsample * C must be a multiple of 128")
    pt = jnp.swapaxes(xyz, 1, 2).astype(jnp.float32)
    qt = jnp.swapaxes(new_xyz, 1, 2).astype(jnp.float32)
    vt = jnp.swapaxes(values, 1, 2).astype(jnp.float32)  # (B, C, N)
    it = itself_idx.astype(jnp.int32)
    if Np != N:
        pt = jnp.pad(pt, ((0, 0), (0, 0), (0, Np - N)))
        vt = jnp.pad(vt, ((0, 0), (0, 0), (0, Np - N)))
    if Sp != S:
        qt = jnp.pad(qt, ((0, 0), (0, 0), (0, Sp - S)))
        it = jnp.pad(it, ((0, 0), (0, Sp - S)))
    it = it[:, None, :]  # (B, 1, Sp): keeps the block's trailing dims tileable
    out = pl.pallas_call(
        functools.partial(
            _ball_group_kernel,
            radius2=float(radius) ** 2,
            nsample=nsample,
            n_valid=N,
            n_chan=C,
        ),
        grid=(B, Sp // tile_s),
        in_specs=[
            pl.BlockSpec((1, 3, tile_s), lambda b, i: (b, 0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3, Np), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, tile_s), lambda b, i: (b, 0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C, Np), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, tile_s, nsample * C), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((B, Sp, nsample * C), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * Sp * Np * (3 + nsample * C),
            bytes_accessed=4 * B * (Np * (3 + C) + Sp * (3 + nsample * C)),
            transcendentals=0,
        ),
    )(qt, pt, it, vt)
    return out[:, :S, :].reshape(B, S, nsample, C)


def _ballq_kernel(q_ref, p_ref, out_ref, *, radius2, nsample, n_valid):
    qt = q_ref[0]  # (3, TS)
    pt = p_ref[0]  # (3, N)
    d0 = qt[0][:, None] - pt[0][None, :]
    d1 = qt[1][:, None] - pt[1][None, :]
    d2 = qt[2][:, None] - pt[2][None, :]
    d = d0 * d0 + d1 * d1 + d2 * d2  # (TS, N)
    col = jax.lax.broadcasted_iota(jnp.int32, d.shape, 1)
    N_sentinel = jnp.int32(n_valid)
    key = jnp.where((d <= radius2) & (col < n_valid), col, N_sentinel)

    picks = []
    for _ in range(nsample):
        m = jnp.min(key, axis=1)  # (TS,) smallest remaining in-ball index
        picks.append(m)
        key = jnp.where(key == m[:, None], N_sentinel, key)
    out = jnp.stack(picks, axis=1)  # (TS, nsample), ascending
    first = out[:, :1]
    out = jnp.where(out == N_sentinel, first, out)
    pad = out_ref.shape[2] - nsample
    if pad:
        out = jnp.concatenate([out, jnp.zeros((out.shape[0], pad), jnp.int32)], axis=1)
    out_ref[0] = out


def ball_query_pallas(radius, nsample, xyz, new_xyz, tile_s=256):
    """Exact query_ball_point semantics (ascending in-ball indices,
    first-fill padding) as one fused kernel. nsample <= 128."""
    if nsample > 128:
        raise ValueError("ball_query_pallas supports nsample <= 128")
    B, N, _ = xyz.shape
    S = new_xyz.shape[1]
    Np = _round_up(N, 128)
    Sp = _round_up(S, tile_s)
    pt = jnp.swapaxes(xyz, 1, 2).astype(jnp.float32)
    qt = jnp.swapaxes(new_xyz, 1, 2).astype(jnp.float32)
    if Np != N:
        pt = jnp.pad(pt, ((0, 0), (0, 0), (0, Np - N)))
    if Sp != S:
        qt = jnp.pad(qt, ((0, 0), (0, 0), (0, Sp - S)))
    out_c = _round_up(nsample, 128)
    out = pl.pallas_call(
        functools.partial(
            _ballq_kernel, radius2=float(radius) ** 2, nsample=nsample, n_valid=N
        ),
        grid=(B, Sp // tile_s),
        in_specs=[
            pl.BlockSpec((1, 3, tile_s), lambda b, i: (b, 0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3, Np), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, tile_s, out_c), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((B, Sp, out_c), jnp.int32),
    )(qt, pt)
    return out[:, :S, :nsample]
