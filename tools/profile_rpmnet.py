#!/usr/bin/env python
"""Segment-level timing of the RPMNet pipeline on TPU (differential method)."""

import functools
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
from flax import nnx


def timed(fn_many, iters=11, reps=3):
    float(fn_many(1))
    float(fn_many(iters))

    def t(n):
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            float(fn_many(n))
            best = min(best, time.perf_counter() - t0)
        return best

    return (t(iters) - t(1)) / (iters - 1)


def main():
    from learning3d_tpu.models import RPMNet
    from learning3d_tpu.ops.grouping import sample_and_group_multi
    from learning3d_tpu.utils.rigid import sinkhorn_log, weighted_kabsch

    B, N = 16, 1024
    dtype = jnp.bfloat16
    net = RPMNet(dtype=dtype, rngs=nnx.Rngs(0))
    net.eval()
    graphdef, state = nnx.split(net)
    ppf_def, ppf_state = nnx.split(net.feat_extractor)
    wn_def, wn_state = nnx.split(net.weights_net)

    xyz = jax.random.normal(jax.random.PRNGKey(0), (B, N, 3))
    nrm = xyz / jnp.linalg.norm(xyz, axis=-1, keepdims=True)
    t6 = jnp.concatenate([xyz, nrm], -1)
    s6 = jnp.concatenate([xyz + 0.1, nrm], -1)
    aff = jax.random.normal(jax.random.PRNGKey(2), (B, N, N)).astype(jnp.float32)
    perm = jax.nn.softmax(aff, axis=-1)

    def bench(name, body):
        @functools.partial(jax.jit, static_argnums=0)
        def many(n):
            def step(i, acc):
                return acc + body(i)

            return jax.lax.fori_loop(0, n, step, jnp.float32(0))

        per = timed(lambda n: many(n))
        print(f"{name:34s}: {per*1e3:7.2f} ms  ({B/per:,.0f} pairs/s)")

    bench("full RPMNet (2 iters)", lambda i: jnp.sum(
        nnx.merge(graphdef, state)(t6 + 1e-5 * i, s6, max_iterations=2)["est_T"]).astype(jnp.float32))
    bench("full RPMNet (1 iter)", lambda i: jnp.sum(
        nnx.merge(graphdef, state)(t6 + 1e-5 * i, s6, max_iterations=1)["est_T"]).astype(jnp.float32))
    bench("PPFNet features (x1)", lambda i: jnp.sum(
        nnx.merge(ppf_def, ppf_state)(xyz + 1e-5 * i, nrm)).astype(jnp.float32))
    bench("sample_and_group_multi", lambda i: jnp.sum(
        sample_and_group_multi(-1, 0.3, 64, xyz + 1e-5 * i, nrm)["ppf"]).astype(jnp.float32))
    bench("ParameterPredictionNet", lambda i: jnp.sum(
        nnx.merge(wn_def, wn_state)(xyz + 1e-5 * i, xyz)[0]).astype(jnp.float32))
    bench("sinkhorn_log (5 it, slack)", lambda i: jnp.sum(
        sinkhorn_log(aff + 1e-5 * i, n_iters=5, slack=True)).astype(jnp.float32))
    bench("weighted_kabsch", lambda i: jnp.sum(
        weighted_kabsch(xyz + 1e-5 * i, xyz + 0.1, jnp.sum(perm, axis=2))).astype(jnp.float32))


if __name__ == "__main__":
    main()
