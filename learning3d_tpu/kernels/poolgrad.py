"""Row-scatter as MXU one-hot matmuls — the max-pool backward primitive.

The Gram-matrix backward of the fused conv+BN+ReLU+maxpool stage
(utils/layers._linear_bn_relu_maxpool_train) needs

    dx_sp[b, n, :] = sum_{e : idx[b,e] == n} dsel[b, e] * W[:, e]

i.e. a scatter-add of E weighted weight-columns into N point rows. XLA's
native scatter lowers this to a serialized update stream (measured 4.3 ms
at B=256, N=1024, E=1024, K=128 on v5e — dominating the whole backward),
and the dense formulation writes a (B, N, E) one-hot dz to HBM (1.4 ms).
Here the one-hot never exists outside VMEM: each (b, n-tile) program
builds `(idx == row) * dsel` tiles on the VPU and feeds them straight to
the MXU against W^T, accumulating the (TN, K) output in registers
(~0.4 ms for the same shapes).

Precision: the MXU rounds operands to bf16. For bf16 weights that is
exactly the autodiff semantics of a bf16 Linear backward; for f32
weights a 3-term hi/lo split (a_hi*w_hi + a_hi*w_lo + a_lo*w_hi) keeps
~f32 accuracy at 3x the (tiny) FLOP cost.
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


def _split_hi_lo(a):
    hi = a.astype(jnp.bfloat16).astype(jnp.float32)
    return hi, a - hi


def _dot3(a, b, dims, hi_lo):
    """MXU dot with optional hi/lo f32 emulation (3 bf16 passes)."""
    if not hi_lo:
        return jax.lax.dot_general(
            a.astype(jnp.bfloat16), b, dims, preferred_element_type=jnp.float32
        )
    a_hi, a_lo = _split_hi_lo(a.astype(jnp.float32))
    b_hi, b_lo = _split_hi_lo(b.astype(jnp.float32))
    return (
        jax.lax.dot_general(a_hi, b_hi, dims, preferred_element_type=jnp.float32)
        + jax.lax.dot_general(a_hi, b_lo, dims, preferred_element_type=jnp.float32)
        + jax.lax.dot_general(a_lo, b_hi, dims, preferred_element_type=jnp.float32)
    )


def _scatter_kernel(idx_ref, dsel_ref, wt_ref, x_ref, out_ref, dw_ref, *,
                    tile_n, ec, hi_lo, n_valid):
    b = pl.program_id(0)
    t = pl.program_id(1)
    base = t * tile_n
    idx = idx_ref[0, 0]  # (E,)
    dsel = dsel_ref[0, 0]  # (E,) f32
    e_total = idx.shape[0]
    k = wt_ref.shape[1]
    x = x_ref[0]  # (TN, K); padded rows can't match idx (< n_valid)
    row = base + jax.lax.broadcasted_iota(jnp.int32, (tile_n, ec), 0)

    acc = jnp.zeros((tile_n, k), jnp.float32)
    dims = (((1,), (0,)), ((), ()))
    dimsT = (((0,), (0,)), ((), ()))
    for s in range(0, e_total, ec):
        a = jnp.where(
            idx[s : s + ec][None, :] == row, dsel[s : s + ec][None, :], 0.0
        )  # (TN, EC) one-hot*dsel == dz_sp tile, built and consumed in VMEM
        acc += _dot3(a, wt_ref[s : s + ec, :], dims, hi_lo)
        dw_t = _dot3(x, a, dimsT, hi_lo)  # (K, EC): the dW term x_sel^T dsel

        @pl.when((b == 0) & (t == 0))
        def _init():
            dw_ref[:, s : s + ec] = dw_t

        @pl.when((b != 0) | (t != 0))
        def _acc():
            dw_ref[:, s : s + ec] += dw_t

    out_ref[0] = acc


def _stats_kernel(x_ref, w_ref, c_ref, mx_ref, mn_ref, amax_ref, amin_ref,
                  g_ref, cs_ref, *, tile_n, n_valid):
    b = pl.program_id(0)
    t = pl.program_id(1)
    base = t * tile_n
    x = x_ref[0]  # (TN, K)
    z = jax.lax.dot_general(
        x, w_ref[...], (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    ) + c_ref[0, 0][None, :]  # (TN, E) f32, never leaves VMEM

    row = base + jax.lax.broadcasted_iota(jnp.int32, z.shape, 0)
    valid = row < n_valid
    zmax = jnp.where(valid, z, -_BIG)
    zmin = jnp.where(valid, z, _BIG)
    tmx = jnp.max(zmax, axis=0)  # (E,)
    tmn = jnp.min(zmin, axis=0)
    tamax = jnp.min(jnp.where(zmax == tmx[None, :], row, n_valid), axis=0)
    tamin = jnp.min(jnp.where(zmin == tmn[None, :], row, n_valid), axis=0)

    @pl.when(t == 0)
    def _init_bn():
        mx_ref[0, 0] = tmx
        mn_ref[0, 0] = tmn
        amax_ref[0, 0] = tamax
        amin_ref[0, 0] = tamin

    @pl.when(t != 0)
    def _acc_bn():
        pmx, pmn = mx_ref[0, 0], mn_ref[0, 0]
        up, dn = tmx > pmx, tmn < pmn
        mx_ref[0, 0] = jnp.where(up, tmx, pmx)
        mn_ref[0, 0] = jnp.where(dn, tmn, pmn)
        amax_ref[0, 0] = jnp.where(up, tamax, amax_ref[0, 0])
        amin_ref[0, 0] = jnp.where(dn, tamin, amin_ref[0, 0])

    rowk = base + jax.lax.broadcasted_iota(jnp.int32, x.shape, 0)
    xz = jnp.where(rowk < n_valid, x.astype(jnp.float32), 0.0)
    g_t = jax.lax.dot_general(
        xz, xz, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )  # (K, K)
    cs_t = jnp.sum(xz, axis=0)  # (K,)

    @pl.when((b == 0) & (t == 0))
    def _init_g():
        g_ref[...] = g_t
        cs_ref[0, 0] = cs_t

    @pl.when((b != 0) | (t != 0))
    def _acc_g():
        g_ref[...] += g_t
        cs_ref[0, 0] += cs_t


def pool_stats_pallas(x, W, c, tile_n=512):
    """One fused HBM pass over x for the train-mode fused-stage forward:

        z = x @ W + c   (VMEM only; (B, N, E) never hits HBM)

    returns (mx, mn, amax, amin, G, colsum) with per-(b, channel)
    max/min/argmax/argmin of z over the points axis, the K x K Gram
    matrix sum_bn x x^T, and the K column sum of x — everything the
    Gram-form batch statistics and the sparse backward need. Replaces
    ~2.3 ms of XLA arg-reduces + a second x pass (B=256, N=1024, K=128,
    E=1024 on v5e) with ~0.6 ms.
    """
    B, N, K = x.shape
    E = W.shape[1]
    Np = _round_up(N, tile_n)
    if Np != N:
        x = jnp.pad(x, ((0, 0), (0, Np - N), (0, 0)))
    f32 = jnp.float32
    outs = pl.pallas_call(
        functools.partial(_stats_kernel, tile_n=tile_n, n_valid=N),
        grid=(B, Np // tile_n),
        in_specs=[
            pl.BlockSpec((1, tile_n, K), lambda b, t: (b, t, 0)),
            pl.BlockSpec((K, E), lambda b, t: (0, 0)),
            pl.BlockSpec((1, 1, E), lambda b, t: (0, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, E), lambda b, t: (b, 0, 0)),
            pl.BlockSpec((1, 1, E), lambda b, t: (b, 0, 0)),
            pl.BlockSpec((1, 1, E), lambda b, t: (b, 0, 0)),
            pl.BlockSpec((1, 1, E), lambda b, t: (b, 0, 0)),
            pl.BlockSpec((K, K), lambda b, t: (0, 0)),
            pl.BlockSpec((1, 1, K), lambda b, t: (0, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, 1, E), f32),
            jax.ShapeDtypeStruct((B, 1, E), f32),
            jax.ShapeDtypeStruct((B, 1, E), jnp.int32),
            jax.ShapeDtypeStruct((B, 1, E), jnp.int32),
            jax.ShapeDtypeStruct((K, K), f32),
            jax.ShapeDtypeStruct((1, 1, K), f32),
        ],
    )(x, W, c.astype(f32)[None, None, :])
    mx, mn, amax, amin, G, cs = outs
    return (mx[:, 0], mn[:, 0], amax[:, 0], amin[:, 0], G, cs[0, 0])


def pool_stats_ok(N, E, K):
    """Shape gate for the fused forward-stats kernel."""
    return K % 128 == 0 and E % 128 == 0


def pool_bwd_ok(N, E, K):
    """Shape gate for the Pallas backward (lane-aligned K, MXU-friendly E)."""
    return K % 128 == 0 and E % 128 == 0


def pool_bwd_pallas(idx, dsel, W, x, tile_n=512, ec=1024):
    """Fused sparse backward of the pooled stage: given the selection
    indices idx (B, E) int32, pooled cotangents dsel (B, E) f32, weights
    W (K, E) and the input x (B, N, K), returns

        dx_sp (B, N, K) f32:  dx_sp[b, idx[b,e], :] += dsel[b,e] * W[:, e]
        dW_sel (K, E) f32:    dW_sel[:, e] = sum_b x[b, idx[b,e], :] * dsel[b,e]

    The one-hot dz tile is generated in VMEM and fed to the MXU twice
    (against W^T for dx_sp, against x^T for dW_sel) — neither the (B, N, E)
    dense dz, the (B, E, K) gathered rows, nor an XLA scatter ever exists.
    W in bf16 -> single-dot bf16 MXU semantics; any wider dtype -> hi/lo
    split (~f32 accurate).
    """
    B, E = idx.shape
    K = W.shape[0]
    N = x.shape[1]
    ec = min(ec, E)
    Np = _round_up(N, tile_n)
    hi_lo = W.dtype != jnp.bfloat16
    wt = jnp.swapaxes(W, 0, 1)  # (E, K)
    if Np != N:
        x = jnp.pad(x, ((0, 0), (0, Np - N), (0, 0)))

    out, dw = pl.pallas_call(
        functools.partial(
            _scatter_kernel, tile_n=tile_n, ec=ec, hi_lo=hi_lo, n_valid=N
        ),
        grid=(B, Np // tile_n),
        in_specs=[
            pl.BlockSpec((1, 1, E), lambda b, t: (b, 0, 0)),
            pl.BlockSpec((1, 1, E), lambda b, t: (b, 0, 0)),
            pl.BlockSpec((E, K), lambda b, t: (0, 0)),
            pl.BlockSpec((1, tile_n, K), lambda b, t: (b, t, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, tile_n, K), lambda b, t: (b, t, 0)),
            pl.BlockSpec((K, E), lambda b, t: (0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, Np, K), jnp.float32),
            jax.ShapeDtypeStruct((K, E), jnp.float32),
        ],
    )(idx[:, None, :], dsel.astype(jnp.float32)[:, None, :], wt, x)
    return (out[:, :N] if Np != N else out), dw
