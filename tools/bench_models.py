#!/usr/bin/env python
"""Inference throughput for every headline model (difference-quotient
timing; see bench.py). Run on TPU; results go to BENCH_NOTES.md."""

import functools
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
from flax import nnx


def timed(many, iters=11, reps=3):
    float(many(1))
    float(many(iters))

    def t(n):
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            float(many(n))
            best = min(best, time.perf_counter() - t0)
        return best

    return (t(iters) - t(1)) / (iters - 1)


def bench(name, B, body):
    @functools.partial(jax.jit, static_argnums=0)
    def many(n):
        return jax.lax.fori_loop(0, n, lambda i, acc: acc + body(i).astype(jnp.float32), jnp.float32(0))

    per = timed(many)
    print(f"{name:28s}: {per*1e3:8.2f} ms  ({B/per:,.0f} clouds-or-pairs/s)")


def main():
    from learning3d_tpu import models

    dtype = jnp.bfloat16
    x1024 = jax.random.normal(jax.random.PRNGKey(0), (32, 1024, 3))

    pc = models.PointConvDensityClsSsg(classifier=True, dtype=dtype, rngs=nnx.Rngs(0))
    pc.eval()
    gd, st = nnx.split(pc)
    bench("PointConv cls B=32", 32, lambda i, gd=gd, st=st: jnp.sum(nnx.merge(gd, st)(x1024 + 1e-4 * i)))

    cn = models.CurveNet(dtype=dtype, rngs=nnx.Rngs(0))
    cn.eval()
    gd2, st2 = nnx.split(cn)
    bench("CurveNet cls B=32", 32, lambda i, gd=gd2, st=st2: jnp.sum(nnx.merge(gd, st)(x1024 + 1e-4 * i)))

    pn = models.Classifier(models.PointNet(emb_dims=1024, use_bn=True, dtype=dtype, rngs=nnx.Rngs(0)), dtype=dtype, rngs=nnx.Rngs(1))
    pn.eval()
    gd3, st3 = nnx.split(pn)
    bench("PointNet cls B=32", 32, lambda i, gd=gd3, st=st3: jnp.sum(nnx.merge(gd, st)(x1024 + 1e-4 * i)))


if __name__ == "__main__":
    main()
