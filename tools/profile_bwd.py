#!/usr/bin/env python
"""Locate the train-step backward cost for the PointNet classifier.

Times grad variants of the pooled-encoder path at B=256, N=1024 bf16 to
attribute the fwd+bwd gap (tools/profile_train.py: fwd 1.9 ms,
fwd+bwd 6.3 ms):

  * full        — grad through batch stats (training semantics)
  * stopstats   — stop_gradient on BN batch mean/var (isolates the dense
                  stats term of dz vs the sparse argmax term)
  * evalbn      — running-average BN (no stats pass at all)
  * encoder5    — conv5+BN+relu+maxpool alone (the 128->1024 stage)
"""

import functools
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
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


def bench(name, loss_fn, params, *consts, B=256):
    @functools.partial(jax.jit, static_argnums=0)
    def many(n, params, *consts):
        def step(i, carry):
            params, acc = carry
            loss, grads = jax.value_and_grad(loss_fn)(params, *consts, i)
            gsum = sum(jnp.sum(l).astype(jnp.float32) for l in jax.tree.leaves(grads))
            return params, acc + loss + gsum * jnp.float32(1e-30)

        carry = jax.lax.fori_loop(0, n, step, (params, jnp.float32(0)))
        return carry[-1]

    per = timed(many, params, *consts)
    print(f"{name:34s}: {per*1e3:7.2f} ms  ({B/per:,.0f} clouds/s)", flush=True)


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
    x = jax.random.normal(jax.random.PRNGKey(0), (B, N, 3), jnp.float32)
    y = jax.random.randint(jax.random.PRNGKey(1), (B,), 0, 40)

    def loss_of(m, xi):
        logits = m(xi)
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        return -jnp.mean(jnp.take_along_axis(logp, y[:, None], axis=1))

    def full(params, rest, i):
        m = nnx.merge(graphdef, params, rest, copy=True)
        return loss_of(m, x + 1e-4 * i)

    bench("full fwd+bwd", full, params, rest)

    # stop_gradient through BN batch statistics: monkey-wrap BatchNorm /
    # fused pool stats by running eval-mode BN but with batch stats
    # precomputed under stop_gradient is invasive; approximate with
    # eval-mode BN (running stats, constant) — removes BOTH the stats
    # forward pass and its backward term.
    model.eval()
    gd_e, params_e, rest_e = nnx.split(model, nnx.Param, ...)

    def evalbn(params, rest, i):
        m = nnx.merge(gd_e, params, rest, copy=True)
        return loss_of(m, x + 1e-4 * i)

    bench("fwd+bwd, eval-mode BN", evalbn, params_e, rest_e)
    model.train()

    # conv5 + fused BN/relu/maxpool stage alone, training semantics
    pn = model.feature_model
    x4 = jax.random.normal(jax.random.PRNGKey(2), (B, N, 128), dtype)
    gd5, p5, r5 = nnx.split(pn, nnx.Param, ...)

    def stage5(p5, r5, i):
        from learning3d_tpu.utils.layers import fused_bn_relu_maxpool

        m = nnx.merge(gd5, p5, r5, copy=True)
        z = m.convs[-1](x4 + 1e-4 * i)
        out = fused_bn_relu_maxpool(z, m.bns[-1], None)
        return jnp.sum(out.astype(jnp.float32))

    bench("stage5 (conv5+bn+relu+max) f+b", stage5, p5, r5)

    # stage5 with batch stats under stop_gradient (sparse dz only)
    def stage5_stop(p5, r5, i):
        m = nnx.merge(gd5, p5, r5, copy=True)
        bn = m.bns[-1]
        z = m.convs[-1](x4 + 1e-4 * i)
        zf = z.astype(jnp.float32)
        mean = jax.lax.stop_gradient(jnp.mean(zf, axis=(0, 1)))
        var = jax.lax.stop_gradient(
            jnp.maximum(jnp.mean(zf * zf, axis=(0, 1)) - mean * mean, 0.0)
        )
        s = bn.scale[...] * jax.lax.rsqrt(var.astype(bn.scale[...].dtype) + bn.epsilon)
        b = bn.bias[...] - mean.astype(s.dtype) * s
        sel = jnp.where(s >= 0, jnp.max(z, axis=-2), jnp.min(z, axis=-2))
        return jnp.sum(jax.nn.relu(s * sel + b).astype(jnp.float32))

    bench("stage5, stats stop_grad  f+b", stage5_stop, p5, r5)

    # stage5 with the Gram-form custom VJP (linear_bn_relu_maxpool)
    def stage5_fused(p5, r5, i):
        from learning3d_tpu.utils.layers import linear_bn_relu_maxpool

        m = nnx.merge(gd5, p5, r5, copy=True)
        out = linear_bn_relu_maxpool(x4 + 1e-4 * i, m.convs[-1], m.bns[-1], None)
        return jnp.sum(out.astype(jnp.float32))

    bench("stage5 custom-vjp f+b", stage5_fused, p5, r5)

    # stage5 forward only (merge INSIDE the loop body: the fused pool
    # mutates BN running stats, which must happen at the loop trace level)
    @functools.partial(jax.jit, static_argnums=0)
    def many_f(n, p5, r5):
        def step(i, acc):
            m = nnx.merge(gd5, p5, r5, copy=True)
            z = m.convs[-1](x4 + 1e-4 * i)
            from learning3d_tpu.utils.layers import fused_bn_relu_maxpool

            out = fused_bn_relu_maxpool(z, m.bns[-1], None)
            return acc + jnp.sum(out.astype(jnp.float32))

        return jax.lax.fori_loop(0, n, step, jnp.float32(0))

    per = timed(many_f, p5, r5)
    print(f"{'stage5 fwd only':34s}: {per*1e3:7.2f} ms", flush=True)


if __name__ == "__main__":
    main()
