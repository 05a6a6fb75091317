#!/usr/bin/env python
"""Segment-level timing of the DCP pipeline on TPU (differential method)."""

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
    from learning3d_tpu.models import DCP, DGCNN
    from learning3d_tpu.ops.geometry import get_graph_feature, knn, square_distance
    from learning3d_tpu.utils.svd import SVDHead

    B, N, E = 32, 1024, 512
    dtype = jnp.bfloat16
    dg = DGCNN(emb_dims=E, dtype=dtype, rngs=nnx.Rngs(0))
    dcp = DCP(dg, dtype=dtype, rngs=nnx.Rngs(1))
    dcp.eval()
    graphdef, state = nnx.split(dcp)
    gdef_dg, state_dg = nnx.split(dg)

    t = jax.random.normal(jax.random.PRNGKey(0), (B, N, 3))
    s = jax.random.normal(jax.random.PRNGKey(1), (B, N, 3))
    emb = jax.random.normal(jax.random.PRNGKey(2), (B, N, E))

    def bench(name, body):
        @functools.partial(jax.jit, static_argnums=0)
        def many(n):
            def step(i, acc):
                return acc + body(i)

            return jax.lax.fori_loop(0, n, step, jnp.float32(0))

        per = timed(lambda n: many(n))
        print(f"{name:28s}: {per*1e3:7.2f} ms  ({B/per:,.0f} pairs/s)")

    bench("full DCP", lambda i: jnp.sum(
        nnx.merge(graphdef, state)(t + 1e-4 * i, s)["est_T"]).astype(jnp.float32))
    bench("DGCNN encoder (x2)", lambda i: (
        jnp.sum(nnx.merge(gdef_dg, state_dg)(t + 1e-4 * i))
        + jnp.sum(nnx.merge(gdef_dg, state_dg)(s + 1e-4 * i))
    ).astype(jnp.float32))
    bench("knn(N=1024,k=20) x2", lambda i: (
        jnp.sum(knn(t + 1e-4 * i, 20)) + jnp.sum(knn(s + 1e-4 * i, 20))
    ).astype(jnp.float32))
    bench("sqdist only x2", lambda i: (
        jnp.sum(square_distance(t + 1e-4 * i, t)) + jnp.sum(square_distance(s + 1e-4 * i, s))
    ).astype(jnp.float32))
    bench("graph_feature x2", lambda i: (
        jnp.sum(get_graph_feature(t + 1e-4 * i, 20)) + jnp.sum(get_graph_feature(s + 1e-4 * i, 20))
    ).astype(jnp.float32))

    from learning3d_tpu.kernels.dgcnn_fused import dgcnn_encode_fused

    def fused_enc(st, a):
        m = nnx.merge(gdef_dg, st)
        return dgcnn_encode_fused(a, m.convs, m.bns, m.k)

    bench("DGCNN fused kernel (x2)", lambda i: (
        jnp.sum(fused_enc(state_dg, t + 1e-4 * i))
        + jnp.sum(fused_enc(state_dg, s + 1e-4 * i))
    ).astype(jnp.float32))

    tr = dcp.pointer
    gdef_tr, state_tr = nnx.split(tr)
    bench("transformer pointer", lambda i: jnp.sum(
        nnx.merge(gdef_tr, state_tr)(emb + 1e-4 * i, emb)[0]).astype(jnp.float32))

    head = SVDHead(E)
    bench("SVD head", lambda i: jnp.sum(
        head(emb + 1e-4 * i, emb, t, s)[0]).astype(jnp.float32))


if __name__ == "__main__":
    main()
