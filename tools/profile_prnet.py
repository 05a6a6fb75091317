#!/usr/bin/env python
"""PRNet stage-level profile on TPU (difference-quotient timing)."""

import functools
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
from flax import nnx


def timed(many, iters=7, reps=3):
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
    from learning3d_tpu import models
    from learning3d_tpu.ops.geometry import index_points, knn

    B, NS, E = 16, 768, 512
    dtype = jnp.bfloat16
    model = models.PRNet(
        emb_dims=E, num_keypoints=512, num_subsampled_points=NS, num_iters=3,
        dtype=dtype, rngs=nnx.Rngs(0),
    )
    model.eval()
    gd, st = nnx.split(model)
    src = jax.random.normal(jax.random.PRNGKey(0), (B, NS, 3))
    tgt = jax.random.normal(jax.random.PRNGKey(1), (B, NS, 3))
    emb = jax.random.normal(jax.random.PRNGKey(2), (B, NS, E))
    h64 = jax.random.normal(jax.random.PRNGKey(3), (B, NS, 64))

    def bench(name, body):
        @functools.partial(jax.jit, static_argnums=0)
        def many(n):
            return jax.lax.fori_loop(0, n, lambda i, acc: acc + body(i).astype(jnp.float32), jnp.float32(0))

        per = timed(many)
        print(f"{name:32s}: {per*1e3:8.2f} ms", flush=True)

    # NOTE: merge INSIDE the jitted body — a module merged outside and
    # captured by closure turns every parameter into a traced constant and
    # compilation never finishes.
    part = (sys.argv[1:] or ["a"])[0]
    if part == "full":
        bench("full PRNet (3 it)", lambda i: jnp.sum(nnx.merge(gd, st)(src + 1e-4 * i, tgt)["est_T"]))
    if part == "a":
        bench("emb_nn (x1)", lambda i: jnp.sum(nnx.merge(gd, st).emb_nn(src + 1e-4 * i)))
        bench("knn C=64 (x1)", lambda i: jnp.sum(knn(h64 + 1e-4 * i, 20)))
        bench("knn C=3 (x1)", lambda i: jnp.sum(knn(src + 1e-4 * i, 20)))
        bench("gather k=20 C=64 (x1)", lambda i: jnp.sum(index_points(h64 + 1e-4 * i, knn(h64, 20))))
    if part == "b":
        bench("attention (x1)", lambda i: jnp.sum(nnx.merge(gd, st).attention(emb + 1e-4 * i, emb)[0]))
        bench("temp_net (x1)", lambda i: jnp.sum(nnx.merge(gd, st).temp_net(emb + 1e-4 * i, emb)[0]))
        bench("keypointnet (x1)", lambda i: jnp.sum(nnx.merge(gd, st).keypointnet(src + 1e-4 * i, tgt, emb, emb)[0]))
        bench("head (x1)", lambda i: jnp.sum(nnx.merge(gd, st).head(emb[:, :512] + 1e-4 * i, emb[:, :512], src[:, :512], tgt[:, :512], jnp.ones((B, 1)))[0]))


if __name__ == "__main__":
    main()
