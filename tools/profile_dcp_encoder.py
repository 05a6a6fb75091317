#!/usr/bin/env python
"""Post-fused-pointer DCP bottleneck hunt (round-4 VERDICT item 8): with
the pointer on the int8 MXU the wall moved to the two fused-DGCNN
encoder passes (~5.3 ms of ~11-12 ms at B=32). Measures, on the attached
TPU, the two candidate next steps the round-4 ledger names:

  * int8 edge-conv chain (kernels/dgcnn_fused.dgcnn_encode_fused_int8)
    vs bf16 — does the int8 MXU buy anything when the k-selection VPU
    loop, not the conv matmuls, may dominate the kernel?
  * batching template+source into ONE 2B encoder pass vs two B passes —
    same FLOPs, half the pallas_call fixed costs. (The 2B-batched
    POINTER measured 2.4x slower, round-3 notes; the encoder has no
    cross-cloud op so the failure mode doesn't apply a priori.)

plus the head (SVD) so the full-forward ledger adds up.

Timing: fori_loop difference quotient, every input varied per iteration,
every output consumed (BENCH_NOTES round-3 honesty rules).
"""

import functools
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx


def timed_per_iter(fn_many, iters=21, reps=3, rounds=6, tag=""):
    float(fn_many(1))
    float(fn_many(iters))

    def t(n):
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            float(fn_many(n))
            best = min(best, time.perf_counter() - t0)
        return best

    best = float("inf")
    per_round = []
    for r in range(rounds):
        if r:
            time.sleep(1.0)
        v = (t(iters) - t(1)) / (iters - 1)
        per_round.append(v)
        best = min(best, v)
    print(f"[{tag}] per-round ms: " + " ".join(f"{v*1e3:.3f}" for v in per_round),
          flush=True)
    return best


def main():
    from learning3d_tpu.models import DCP, DGCNN
    from learning3d_tpu.quant import quantize_dcp

    B, N, E = 32, 1024, 512
    model = DCP(DGCNN(emb_dims=E, dtype=jnp.bfloat16, rngs=nnx.Rngs(0)),
                dtype=jnp.bfloat16, rngs=nnx.Rngs(1))
    model.eval()
    t = jax.random.normal(jax.random.PRNGKey(0), (B, N, 3), jnp.float32)
    s = jax.random.normal(jax.random.PRNGKey(1), (B, N, 3), jnp.float32)
    qmodel = quantize_dcp(model, t[:8], s[:8])  # int8 encoder + pointer

    def bench_encoder(m, tag, batched):
        """Encoder cost of one DCP forward: two B-passes or one 2B-pass."""
        gd, st = nnx.split(m)

        @functools.partial(jax.jit, static_argnums=0)
        def many(n, st, t, s):
            mm = nnx.merge(gd, st)

            def body(i, acc):
                ti = t + 1e-4 * i
                si = s + 2e-4 * i
                if batched:
                    emb = mm.emb_nn(jnp.concatenate([ti, si], 0))
                    e1, e2 = emb[:B], emb[B:]
                else:
                    e1, e2 = mm.emb_nn(ti), mm.emb_nn(si)
                return acc + jnp.sum(e1) + jnp.sum(e2)

            return jax.lax.fori_loop(0, n, body, jnp.float32(0))

        per = timed_per_iter(lambda n: many(n, st, t, s), tag=tag)
        print(f"{tag}: {per*1e3:.2f} ms per template+source pair", flush=True)
        return per

    results = {}
    results["enc-bf16-2pass"] = bench_encoder(model, "enc-bf16-2pass", False)
    results["enc-bf16-batched2B"] = bench_encoder(model, "enc-bf16-batched2B", True)
    results["enc-int8-2pass"] = bench_encoder(qmodel, "enc-int8-2pass", False)
    results["enc-int8-batched2B"] = bench_encoder(qmodel, "enc-int8-batched2B", True)

    # quantized-key single-pass selection (round-5 ledger's "relaxing
    # exactness" candidate): one fused VPU traversal per pick instead of
    # two — the min int32 key identifies the neighbor, no argmin resolve
    from learning3d_tpu.kernels.dgcnn_fused import dgcnn_encode_fused

    def bench_encoder_approx(m, tag):
        gd, st = nnx.split(m)

        @functools.partial(jax.jit, static_argnums=0)
        def many(n, st, t, s):
            mm = nnx.merge(gd, st)
            enc = mm.emb_nn

            def body(i, acc):
                e1 = dgcnn_encode_fused(
                    t + 1e-4 * i, enc.convs, enc.bns, enc.k, approx_knn=True
                )
                e2 = dgcnn_encode_fused(
                    s + 2e-4 * i, enc.convs, enc.bns, enc.k, approx_knn=True
                )
                return acc + jnp.sum(e1) + jnp.sum(e2)

            return jax.lax.fori_loop(0, n, body, jnp.float32(0))

        per = timed_per_iter(lambda n: many(n, st, t, s), tag=tag)
        print(f"{tag}: {per*1e3:.2f} ms per template+source pair", flush=True)
        return per

    results["enc-bf16-approxknn"] = bench_encoder_approx(model, "enc-bf16-approxknn")
    # int8 + approx picks: DGCNN.__call__ reads L3D_APPROX_KNN at trace
    # time, so toggling it around a fresh jit gives the int8-approx row
    import os

    os.environ["L3D_APPROX_KNN"] = "1"
    try:
        results["enc-int8-approxknn"] = bench_encoder(
            qmodel, "enc-int8-approxknn", False
        )
    finally:
        os.environ.pop("L3D_APPROX_KNN", None)
    e_exact = model.emb_nn(t).astype(jnp.float32)
    e_apx = dgcnn_encode_fused(
        t, model.emb_nn.convs, model.emb_nn.bns, model.emb_nn.k, approx_knn=True
    ).astype(jnp.float32)
    rel_a = float(jnp.mean(jnp.abs(e_apx - e_exact)) / (jnp.mean(jnp.abs(e_exact)) + 1e-9))
    flip = float(jnp.mean((jnp.abs(e_apx - e_exact).max(-1)
                           > 1e-2 * jnp.abs(e_exact).max()).astype(jnp.float32)))
    print(f"approx-knn closeness: mean rel {rel_a:.2e}, point flip frac {flip:.2e}",
          flush=True)

    # int8 encoder closeness at the serving shape (random weights — the
    # trained-checkpoint delta is evaluate.py --quantize's job)
    e_bf = model.emb_nn(t)
    e_q = qmodel.emb_nn(t)
    rel = float(jnp.mean(jnp.abs(e_q.astype(jnp.float32) - e_bf.astype(jnp.float32)))
                / (jnp.mean(jnp.abs(e_bf.astype(jnp.float32))) + 1e-9))
    print(f"int8 encoder closeness: mean rel {rel:.2e}", flush=True)

    # head-only (pointer output faked as embeddings): completes the ledger
    gd, st = nnx.split(model)

    @functools.partial(jax.jit, static_argnums=0)
    def head_many(n, st, t, s):
        mm = nnx.merge(gd, st)
        e1 = jax.random.normal(jax.random.PRNGKey(2), (B, N, E), jnp.bfloat16)
        e2 = jax.random.normal(jax.random.PRNGKey(3), (B, N, E), jnp.bfloat16)

        def body(i, acc):
            r, tt, _ = mm.head(e1 + (1e-3 * i), e2 - (1e-3 * i),
                               s + 2e-4 * i, t + 1e-4 * i)
            return acc + jnp.sum(r) + jnp.sum(tt)

        return jax.lax.fori_loop(0, n, body, jnp.float32(0))

    per = timed_per_iter(lambda n: head_many(n, st, t, s), tag="head-svd")
    print(f"head-svd: {per*1e3:.2f} ms/batch", flush=True)
    results["head"] = per

    best_enc = min((k for k in results if k.startswith("enc-")), key=results.get)
    print("SUMMARY " + " ".join(f"{k}={v*1e3:.2f}ms" for k, v in results.items()),
          flush=True)
    print(f"best encoder config: {best_enc}", flush=True)


if __name__ == "__main__":
    main()
