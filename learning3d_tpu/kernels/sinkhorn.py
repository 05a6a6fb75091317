"""Pallas log-domain Sinkhorn (RPMNet's slack-padded variant).

The XLA path (utils/rigid.py::sinkhorn_log) re-streams the (B, J+1, K+1)
log-affinity matrix from HBM four times per iteration (two logsumexps,
each read+write) — 3.6 ms for 5 iterations at B=16, N=1024 on v5e. Here
each batch item's matrix lives in VMEM across all iterations: HBM traffic
drops to one read + one write total.

Semantics match the reference (rpmnet.py:157-218): a zero slack row/column
absorbs unmatched mass; row normalization covers all K+1 columns but skips
the slack row, column normalization covers all J+1 rows but skips the
slack column. Padding stays at -1e30 and never contributes to a logsumexp.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG = -1e30


def _round_up(x, m):
    return (x + m - 1) // m * m


def _sinkhorn_kernel(a_ref, o_ref, *, j, k, n_iters):
    la = a_ref[0]  # (Jp, Kp); caller pre-fills: slack row/col 0, padding -1e30
    jp, kp = la.shape
    rowi = jax.lax.broadcasted_iota(jnp.int32, (jp, kp), 0)
    coli = jax.lax.broadcasted_iota(jnp.int32, (jp, kp), 1)
    norm_row = rowi < j  # rows that get row-normalized (not slack, not pad)
    norm_col = coli < k  # columns that get column-normalized

    def body(_, la):
        # row normalization over all K+1 columns (padding is -1e30 -> exp 0)
        m = jnp.max(la, axis=1, keepdims=True)
        lse = m + jnp.log(jnp.sum(jnp.exp(la - m), axis=1, keepdims=True))
        la = jnp.where(norm_row, la - lse, la)
        # column normalization over all J+1 rows
        m = jnp.max(la, axis=0, keepdims=True)
        lse = m + jnp.log(jnp.sum(jnp.exp(la - m), axis=0, keepdims=True))
        return jnp.where(norm_col, la - lse, la)

    o_ref[0] = jax.lax.fori_loop(0, n_iters, body, la)


def sinkhorn_log_pallas(log_alpha, n_iters: int = 5):
    """Slack-padded log-Sinkhorn: log_alpha (B, J, K) -> (B, J, K) log perm.

    Equivalent to utils/rigid.py::sinkhorn_log(..., slack=True).
    """
    B, J, K = log_alpha.shape
    Jp = _round_up(J + 1, 8)
    Kp = _round_up(K + 1, 128)
    la = jnp.full((B, Jp, Kp), _NEG, jnp.float32)
    la = la.at[:, :J, :K].set(log_alpha.astype(jnp.float32))
    la = la.at[:, J, :K].set(0.0).at[:, :J, K].set(0.0).at[:, J, K].set(0.0)
    out = pl.pallas_call(
        functools.partial(_sinkhorn_kernel, j=J, k=K, n_iters=n_iters),
        grid=(B,),
        in_specs=[pl.BlockSpec((1, Jp, Kp), lambda b: (b, 0, 0), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, Jp, Kp), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, Jp, Kp), jnp.float32),
        # the matrix is updated in place; aliasing halves the VMEM
        # footprint (in+out+pipeline buffers OOM at J=K=1024 otherwise)
        input_output_aliases={0: 0},
        cost_estimate=pl.CostEstimate(
            flops=6 * n_iters * B * Jp * Kp,
            bytes_accessed=8 * B * Jp * Kp,
            transcendentals=2 * n_iters * B * Jp * Kp,
        ),
    )(la)
    return out[:, :J, :K]
