#!/usr/bin/env python
"""Round-3 final on-chip measurement batch: kernel-restructure effects,
the int8 DCP serving mode, and a DCP batch-size re-sweep. One process,
sequential, prints a summary table. Results land in BENCH_NOTES.md."""

import functools
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
from flax import nnx


def timed(many, iters=21, reps=3):
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


def bench(name, body, iters=21):
    @functools.partial(jax.jit, static_argnums=0)
    def many(n):
        def step(i, acc):
            return acc + body(i)

        return jax.lax.fori_loop(0, n, step, jnp.float32(0))

    per = timed(many, iters)
    print(f"{name:44s}: {per * 1e3:8.3f} ms", flush=True)
    return per


def main():
    from learning3d_tpu.kernels.knn import knn_pallas
    from learning3d_tpu.models import DCP, DGCNN, PRNet
    from learning3d_tpu.quant import quantize_dcp

    # 1) kNN kernel after the 2-pass restructure (was 2.75 ms r1)
    x = jax.random.normal(jax.random.PRNGKey(0), (32, 1024, 3))
    bench(
        "knn_pallas B=32 N=1024 k=21 (was 2.75)",
        lambda i: jnp.sum(knn_pallas(x + 1e-4 * i, x + 1e-4 * i, 21)[0]).astype(jnp.float32),
    )

    # 2) PRNet eval (feature kNN + attention kernel; was 26.5 ms r2)
    pr = PRNet(dtype=jnp.bfloat16, rngs=nnx.Rngs(0))
    pr.eval()
    gdp, stp = nnx.split(pr)
    t768 = jax.random.normal(jax.random.PRNGKey(1), (16, 768, 3))
    s768 = jax.random.normal(jax.random.PRNGKey(2), (16, 768, 3))

    def pr_body(i):
        m = nnx.merge(gdp, stp)
        return jnp.sum(m(s768 + 2e-4 * i, t768 + 1e-4 * i)["est_T"]).astype(jnp.float32)

    bench("PRNet eval B=16 N=768 (was 26.5, s-hoisted)", pr_body, iters=11)

    # 3) DCP bf16 vs full-int8 serving mode + batch sweep
    for B in (16, 32, 48):
        model = DCP(DGCNN(emb_dims=512, dtype=jnp.bfloat16, rngs=nnx.Rngs(0)),
                    dtype=jnp.bfloat16, rngs=nnx.Rngs(1))
        model.eval()
        gd, st = nnx.split(model)
        t = jax.random.normal(jax.random.PRNGKey(3), (B, 1024, 3))
        s = jax.random.normal(jax.random.PRNGKey(4), (B, 1024, 3))

        def body(i, gd=gd, st=st, t=t, s=s):
            m = nnx.merge(gd, st)
            return jnp.sum(m(t + 1e-4 * i, s + 2e-4 * i)["est_T"]).astype(jnp.float32)

        per = bench(f"DCP bf16 B={B}", body)
        print(f"    -> {B / per:,.0f} clouds/s", flush=True)

        if B == 32:
            qm = quantize_dcp(model, t[:8], s[:8])
            gq, sq = nnx.split(qm)

            def qbody(i, gq=gq, sq=sq, t=t, s=s):
                m = nnx.merge(gq, sq)
                return jnp.sum(m(t + 1e-4 * i, s + 2e-4 * i)["est_T"]).astype(jnp.float32)

            per = bench(f"DCP int8 serving B={B}", qbody)
            print(f"    -> {B / per:,.0f} clouds/s", flush=True)


if __name__ == "__main__":
    main()
