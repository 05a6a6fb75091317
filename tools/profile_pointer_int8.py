#!/usr/bin/env python
"""A/B the int8 serving pointer (quant.QuantMHA/QuantFF + int8 attention
core) against bf16 on the attached TPU.

Measures, at the DCP shape (B=32, N=1024, E=512, h=4):
  * full DCP forward: bf16 vs int8 (hybrid PV) vs int8 (int8 PV)
  * pointer-only: float Transformer vs quantized clone
  * output closeness of each quantized variant vs bf16 (max |dR| angle)

Timing: fori_loop difference quotient with BOTH inputs varied per
iteration and every output consumed (BENCH_NOTES round-3 honesty rules).
Run in background; first compiles are slow on this host.
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

    B, N = 32, 1024
    model = DCP(DGCNN(emb_dims=512, dtype=jnp.bfloat16, rngs=nnx.Rngs(0)),
                dtype=jnp.bfloat16, rngs=nnx.Rngs(1))
    model.eval()
    t = jax.random.normal(jax.random.PRNGKey(0), (B, N, 3), jnp.float32)
    s = jax.random.normal(jax.random.PRNGKey(1), (B, N, 3), jnp.float32)

    def bench_model(m, tag):
        gd, st = nnx.split(m)

        @functools.partial(jax.jit, static_argnums=0)
        def many(n, st, t, s):
            mm = nnx.merge(gd, st)

            def body(i, acc):
                return acc + jnp.sum(mm(t + 1e-4 * i, s + 2e-4 * i)["est_T"])

            return jax.lax.fori_loop(0, n, body, jnp.float32(0))

        per = timed_per_iter(lambda n: many(n, st, t, s), tag=tag)
        print(f"{tag}: {per*1e3:.2f} ms/batch = {B/per:.0f} clouds/s", flush=True)
        return per

    def rot_delta(m_ref, m_q):
        def jit_R(m):
            gd, st = nnx.split(m)

            @jax.jit
            def f(st, t, s):
                return nnx.merge(gd, st)(t, s)["est_R"]

            return np.asarray(f(st, t, s), np.float64)

        R0, R1 = jit_R(m_ref), jit_R(m_q)
        dR = R0 @ np.transpose(R1, (0, 2, 1))
        tr = np.clip((np.trace(dR, axis1=-2, axis2=-1) - 1) / 2, -1, 1)
        return np.degrees(np.arccos(tr)).max()

    per_bf16 = bench_model(model, "dcp-bf16")

    # module path (fused_layers=False) vs the fused VMEM-resident layer
    # kernels (kernels/transformer_int8) — both int8-PV and hybrid
    q_mod = quantize_dcp(model, t[:8], s[:8], int8_pv=True, fused_layers=False)
    print(f"closeness int8pv-module: max dR = {rot_delta(model, q_mod):.4f} deg", flush=True)
    per_mod = bench_model(q_mod, "dcp-int8-pv-module")

    q_pv = quantize_dcp(model, t[:8], s[:8], int8_pv=True, fused_layers=True)
    print(f"closeness int8pv-fused: max dR = {rot_delta(model, q_pv):.4f} deg", flush=True)
    per_pv = bench_model(q_pv, "dcp-int8-pv-fused")

    q_hyb = quantize_dcp(model, t[:8], s[:8], int8_pv=False, fused_layers=True)
    print(f"closeness hybrid-fused: max dR = {rot_delta(model, q_hyb):.4f} deg", flush=True)
    per_hyb = bench_model(q_hyb, "dcp-int8-hybrid-fused")

    # pointer-only A/B at the embedding shape
    emb_t = jax.random.normal(jax.random.PRNGKey(2), (B, N, 512), jnp.float32).astype(jnp.bfloat16)
    emb_s = jax.random.normal(jax.random.PRNGKey(3), (B, N, 512), jnp.float32).astype(jnp.bfloat16)

    for tag, ptr in [("pointer-bf16", model.pointer),
                     ("pointer-int8-pv-module", q_mod.pointer),
                     ("pointer-int8-pv-fused", q_pv.pointer),
                     ("pointer-int8-hybrid-fused", q_hyb.pointer)]:
        gd, st = nnx.split(ptr)

        @functools.partial(jax.jit, static_argnums=0)
        def many(n, st, a, b):
            p = nnx.merge(gd, st)

            def body(i, acc):
                r1, r2 = p(a + 1e-3 * i, b + 2e-3 * i)
                return acc + jnp.sum(r1.astype(jnp.float32)) + jnp.sum(r2.astype(jnp.float32))

            return jax.lax.fori_loop(0, n, body, jnp.float32(0))

        per = timed_per_iter(lambda n: many(n, st, emb_t, emb_s), tag=tag)
        print(f"{tag}: {per*1e3:.2f} ms/call", flush=True)

    print(f"SUMMARY bf16={per_bf16*1e3:.2f}ms pv-module={per_mod*1e3:.2f}ms "
          f"pv-fused={per_pv*1e3:.2f}ms hybrid-fused={per_hyb*1e3:.2f}ms "
          f"(clouds/s: {B/per_bf16:.0f} / {B/per_mod:.0f} / {B/per_pv:.0f} / "
          f"{B/per_hyb:.0f})", flush=True)


if __name__ == "__main__":
    main()
