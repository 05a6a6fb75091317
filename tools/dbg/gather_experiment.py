#!/usr/bin/env python
"""Compare neighbor-gather strategies at PRNet shapes on TPU.

take_along_axis gather vs one-hot MXU matmul gather, each followed by
max+min reduction over k (the eval EdgeConv aggregation).

NOTE: operands are passed as jit arguments — closing over device arrays
bakes them into the program as constants and the compile can hang.
"""

import functools
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent.parent))

import jax
import jax.numpy as jnp

from learning3d_tpu.ops.geometry import index_points


def timed(many, zn, idx, iters=11, reps=3):
    float(many(1, zn, idx))
    float(many(iters, zn, idx))

    def t(n):
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            float(many(n, zn, idx))
            best = min(best, time.perf_counter() - t0)
        return best

    return (t(iters) - t(1)) / (iters - 1)


def bench(name, body, zn, idx):
    @functools.partial(jax.jit, static_argnums=0)
    def many(n, zn, idx):
        return jax.lax.fori_loop(
            0, n,
            lambda i, acc: acc + body(zn + i * jnp.zeros((), zn.dtype), idx),
            jnp.float32(0),
        )

    per = timed(many, zn, idx)
    print(f"{name:44s}: {per*1e3:8.2f} ms", flush=True)


def gather_onehot(zn, idx):
    """(B,N,Co) values, (B,N,k) idx -> (B,N,k,Co) via one-hot matmul."""
    N = zn.shape[1]
    onehot = (idx[..., None] == jnp.arange(N)).astype(zn.dtype)  # (B,N,k,N)
    return jnp.einsum("bnkm,bmc->bnkc", onehot, zn)


def agg(g):
    return jnp.sum((jnp.max(g, axis=2) + jnp.min(g, axis=2)).astype(jnp.float32))


def main():
    from learning3d_tpu.ops.geometry import knn

    B, N, k = 16, 768, 20
    h = jax.random.normal(jax.random.PRNGKey(1), (B, N, 64))
    idx = jax.jit(lambda h: knn(h, k))(h)
    for C in (64, 256):
        zn = jax.random.normal(jax.random.PRNGKey(0), (B, N, C), dtype=jnp.bfloat16)
        bench(f"take_along_axis C={C} bf16", lambda zn, idx: agg(index_points(zn, idx)), zn, idx)
        bench(f"onehot-matmul   C={C} bf16", lambda zn, idx: agg(gather_onehot(zn, idx)), zn, idx)


if __name__ == "__main__":
    main()
