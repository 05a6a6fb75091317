#!/usr/bin/env python
"""Train-step segment timings for PointNet classifier on TPU."""

import functools
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import optax
from flax import nnx


def timed(many, *args, iters=21, reps=3):
    float(many(1, *args))
    float(many(iters, *args))

    def t(n):
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            float(many(n, *args))
            best = min(best, time.perf_counter() - t0)
        return best

    return (t(iters) - t(1)) / (iters - 1)


def main():
    from learning3d_tpu.models import Classifier, PointNet

    B, N = 256, 1024
    dtype = jnp.bfloat16
    model = Classifier(
        PointNet(emb_dims=1024, use_bn=True, dtype=dtype, rngs=nnx.Rngs(0)),
        num_classes=40, dtype=dtype, rngs=nnx.Rngs(1),
    )
    model.train()
    graphdef, params, rest = nnx.split(model, nnx.Param, ...)
    tx = optax.adam(1e-3)
    opt_state = tx.init(params)
    x = jax.random.normal(jax.random.PRNGKey(0), (B, N, 3), jnp.float32)
    y = jax.random.randint(jax.random.PRNGKey(1), (B,), 0, 40)

    def loss_fn(params, rest, x, y):
        m = nnx.merge(graphdef, params, rest, copy=True)
        logits = m(x)
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        loss = -jnp.mean(jnp.take_along_axis(logp, y[:, None], axis=1))
        _, _, rest_new = nnx.split(m, nnx.Param, ...)
        return loss, rest_new

    def bench(name, body):
        @functools.partial(jax.jit, static_argnums=0)
        def many(n, params, rest, opt_state, x, y):
            def step(i, carry):
                return body(i, carry, x, y)

            carry = jax.lax.fori_loop(0, n, step, (params, rest, opt_state, jnp.float32(0)))
            return carry[-1]

        per = timed(many, params, rest, opt_state, x, y)
        print(f"{name:36s}: {per*1e3:7.2f} ms  ({B/per:,.0f} clouds/s)", flush=True)

    def fwd_only(i, carry, x, y):
        params, rest, opt_state, acc = carry
        loss, rest = loss_fn(params, rest, x + 1e-4 * i, y)
        return params, rest, opt_state, acc + loss

    def fwd_bwd(i, carry, x, y):
        params, rest, opt_state, acc = carry
        (loss, rest), grads = jax.value_and_grad(loss_fn, has_aux=True)(params, rest, x + 1e-4 * i, y)
        # consume every grad leaf with a non-zero coefficient so XLA cannot
        # dead-code-eliminate the backward pass (a *0 reduction gets DCE'd
        # and this row collapses to fwd-only)
        gsum = sum(jnp.sum(l).astype(jnp.float32) for l in jax.tree.leaves(grads))
        acc = acc + loss + gsum * jnp.float32(1e-30)
        return params, rest, opt_state, acc

    def full(i, carry, x, y):
        params, rest, opt_state, acc = carry
        (loss, rest), grads = jax.value_and_grad(loss_fn, has_aux=True)(params, rest, x + 1e-4 * i, y)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, rest, opt_state, acc + loss

    bench("fwd only (train-mode BN)", fwd_only)
    bench("fwd+bwd", fwd_bwd)
    bench("fwd+bwd+adam", full)

    # eval-mode forward at the same batch for reference
    model.eval()
    gd2, st2 = nnx.split(model)

    @functools.partial(jax.jit, static_argnums=0)
    def many_eval(n, st2, x):
        def step(i, acc):
            return acc + jnp.sum(nnx.merge(gd2, st2)(x + 1e-4 * i)).astype(jnp.float32)

        return jax.lax.fori_loop(0, n, step, jnp.float32(0))

    per = timed(many_eval, st2, x)
    print(f"{'fwd only (eval-mode BN)':36s}: {per*1e3:7.2f} ms  ({B/per:,.0f} clouds/s)", flush=True)


if __name__ == "__main__":
    main()
