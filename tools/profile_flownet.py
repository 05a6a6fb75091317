#!/usr/bin/env python
"""FlowNet3D stage-level profile on TPU (difference-quotient timing)."""

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


def main():
    from learning3d_tpu.models import FlowNet3D

    B, N = 16, 2048
    dtype = jnp.bfloat16
    model = FlowNet3D(dtype=dtype, rngs=nnx.Rngs(0))
    model.eval()
    gd, st = nnx.split(model)

    pc1 = jax.random.normal(jax.random.PRNGKey(0), (B, N, 3))
    pc2 = pc1 + 0.05 * jax.random.normal(jax.random.PRNGKey(1), (B, N, 3))
    l1p = jax.random.normal(jax.random.PRNGKey(2), (B, 1024, 3))
    l1f = jax.random.normal(jax.random.PRNGKey(3), (B, 1024, 64), dtype=dtype)
    l2p = jax.random.normal(jax.random.PRNGKey(4), (B, 256, 3))
    l2f = jax.random.normal(jax.random.PRNGKey(5), (B, 256, 128), dtype=dtype)
    l3p = jax.random.normal(jax.random.PRNGKey(6), (B, 64, 3))
    l3f = jax.random.normal(jax.random.PRNGKey(7), (B, 64, 256), dtype=dtype)
    l4p = jax.random.normal(jax.random.PRNGKey(8), (B, 16, 3))
    l4f = jax.random.normal(jax.random.PRNGKey(9), (B, 16, 512), dtype=dtype)

    def bench(name, body):
        @functools.partial(jax.jit, static_argnums=0)
        def many(n):
            return jax.lax.fori_loop(
                0, n, lambda i, acc: acc + jnp.sum(body(i)).astype(jnp.float32), jnp.float32(0)
            )

        per = timed(many)
        print(f"{name:28s}: {per*1e3:7.2f} ms", flush=True)

    m = lambda: nnx.merge(gd, st)
    bench("full FlowNet3D", lambda i: m()(pc1 + 1e-4 * i, pc2, pc1, pc2))
    bench("sa1 (2048->1024, ns16)", lambda i: m().sa1(pc1 + 1e-4 * i, pc1)[1])
    bench("sa2 (1024->256, ns16)", lambda i: m().sa2(l1p + 1e-4 * i, l1f)[1])
    bench("fe_layer (256, k in ball)", lambda i: m().fe_layer(l2p + 1e-4 * i, l2p + 0.1, l2f, l2f)[1])
    bench("sa3+sa4", lambda i: m().sa4(*m().sa3(l2p + 1e-4 * i, l2f))[1])
    bench("su1 (64<-16)", lambda i: m().su1(l3p + 1e-4 * i, l4p, l3f, l4f))
    bench("su2 (256<-64)", lambda i: m().su2(l2p + 1e-4 * i, l3p, jnp.concatenate([l2f, l2f], -1), l3f))
    l2f256 = jax.random.normal(jax.random.PRNGKey(10), (B, 256, 256), dtype=dtype)
    l1f256 = jax.random.normal(jax.random.PRNGKey(11), (B, 1024, 256), dtype=dtype)
    bench("su3 (1024<-256)", lambda i: m().su3(l1p + 1e-4 * i, l2p, l1f, l2f256))
    bench("fp (2048<-1024)", lambda i: m().fp(pc1 + 1e-4 * i, l1p, pc1.astype(dtype), l1f256))


if __name__ == "__main__":
    main()
