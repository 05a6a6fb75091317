"""Pipeline parallelism (GPipe schedule) over a mesh axis.

The reference is single-device (SURVEY.md §2.3); dp/tp/ring-sp live in
``parallel/mesh.py`` / ``parallel/ring.py``. This module adds the fourth
axis of the parallelism story: S homogeneous stages laid out one per
device along a mesh axis, microbatches streamed through with
``lax.ppermute`` so all stages compute concurrently after the fill
bubble. The schedule is the classic GPipe one: T = M + S - 1 ticks for M
microbatches; stage s processes microbatch m at tick m + s. Activations
move one hop per tick over ICI; the whole schedule is one jitted program
and is differentiable (ppermute transposes to the reverse permute, so
the backward pass pipelines in the opposite direction).

Scope: homogeneous stages (same activation shape in/out), the layout
real pipelined stacks have (repeated blocks). fn is applied during
bubble ticks to zero activations and the results are masked out — wasted
FLOPs bounded by (S-1)/(M+S-1), the standard GPipe bubble.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import PartitionSpec as P


def pipeline_apply(fn, stage_params, x, mesh, axis="model", num_microbatches=None):
    """Apply S stages sequentially: ``fn(p_S, ... fn(p_1, x))``, pipelined.

    fn: (params, act) -> act with act shape preserved.
    stage_params: pytree whose leaves are stacked on a leading axis of
        size S = mesh.shape[axis] (params of stage s at index s).
    x: (B, ...) — B must divide into ``num_microbatches`` (default S).
    Returns the same value as the sequential loop, batch-replicated.
    """
    S = mesh.shape[axis]
    M = int(num_microbatches or S)
    B = x.shape[0]
    if B % M:
        raise ValueError(f"batch {B} not divisible into {M} microbatches")
    mb = B // M
    xm = x.reshape((M, mb) + x.shape[1:])
    perm = [(i, (i + 1) % S) for i in range(S)]

    def stage_fn(p_loc, xm_loc):
        p = jax.tree.map(lambda a: a[0], p_loc)  # this device's stage
        idx = jax.lax.axis_index(axis)
        zero = jnp.zeros_like(xm_loc[0])
        ym0 = jnp.zeros((M,) + xm_loc.shape[1:], xm_loc.dtype)

        def tick(t, carry):
            prev_out, ym = carry
            recv = jax.lax.ppermute(prev_out, axis, perm)
            feed = jax.lax.dynamic_index_in_dim(
                xm_loc, jnp.clip(t, 0, M - 1), 0, keepdims=False
            )
            act_in = jnp.where(idx == 0, jnp.where(t < M, feed, zero), recv)
            out = fn(p, act_in)
            m = t - (S - 1)  # microbatch finishing at the last stage
            upd = jax.lax.dynamic_update_index_in_dim(
                ym, out, jnp.clip(m, 0, M - 1), 0
            )
            ym = jnp.where((idx == S - 1) & (m >= 0), upd, ym)
            return out, ym

        _, ym = jax.lax.fori_loop(0, M + S - 1, tick, (zero, ym0))
        # only the last stage holds results; replicate them around the ring
        ym = jax.lax.psum(jnp.where(idx == S - 1, ym, jnp.zeros_like(ym)), axis)
        return ym

    spec_p = jax.tree.map(lambda _: P(axis), stage_params)
    ym = shard_map(
        stage_fn,
        mesh=mesh,
        in_specs=(spec_p, P()),
        out_specs=P(),
        check_vma=False,
    )(stage_params, xm)
    return ym.reshape((B,) + x.shape[1:])
