"""Benchmark harness — prints ONE JSON line for the driver.

Metric: ModelNet40-shaped PointNet-classifier inference throughput
(clouds/sec/chip) on the attached TPU, bf16 compute. ``vs_baseline``
compares against an estimated H100 PyTorch eager inference throughput for
the same model (see _H100_BASELINE below; the reference publishes no
throughput numbers — its logs only contain accuracy curves, BASELINE.md).

Run directly: python bench.py [--batch 512] [--points 1024] [--all]
"""

import argparse
import json
import time

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx

# Estimated H100 PyTorch eager inference throughput for reference
# learning3d PointNet(emb=1024)+Classifier, B=512, N=1024, fp16/TF32 —
# derived from the model's ~0.3 GFLOP/cloud forward cost and typical torch
# eager smalll-conv efficiency on H100 (~5-10% MXU util at this size).
_H100_BASELINE = 60_000.0  # clouds/sec


def bench_pointnet_cls(batch=512, points=1024, dtype=jnp.bfloat16, iters=50):
    from learning3d_tpu.models import Classifier, PointNet

    model = Classifier(
        PointNet(emb_dims=1024, use_bn=True, dtype=dtype, rngs=nnx.Rngs(0)),
        num_classes=40,
        dtype=dtype,
        rngs=nnx.Rngs(1),
    )
    model.eval()
    graphdef, state = nnx.split(model)

    @jax.jit
    def fwd(state, x):
        return nnx.merge(graphdef, state)(x)

    x = jax.random.normal(jax.random.PRNGKey(0), (batch, points, 3), jnp.float32)
    fwd(state, x).block_until_ready()  # compile
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fwd(state, x)
    out.block_until_ready()
    dt = (time.perf_counter() - t0) / iters
    return batch / dt


def bench_dcp(batch=32, points=1024, dtype=jnp.bfloat16, iters=20):
    from learning3d_tpu.models import DCP, DGCNN

    model = DCP(DGCNN(emb_dims=512, dtype=dtype, rngs=nnx.Rngs(0)), dtype=dtype, rngs=nnx.Rngs(1))
    model.eval()
    graphdef, state = nnx.split(model)

    @jax.jit
    def fwd(state, t, s):
        return nnx.merge(graphdef, state)(t, s)["est_T"]

    t = jax.random.normal(jax.random.PRNGKey(0), (batch, points, 3), jnp.float32)
    s = jax.random.normal(jax.random.PRNGKey(1), (batch, points, 3), jnp.float32)
    fwd(state, t, s).block_until_ready()
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fwd(state, t, s)
    out.block_until_ready()
    dt = (time.perf_counter() - t0) / iters
    return batch / dt


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=512)
    p.add_argument("--points", type=int, default=1024)
    p.add_argument("--all", action="store_true", help="also bench DCP registration")
    args = p.parse_args()

    value = bench_pointnet_cls(args.batch, args.points)
    result = {
        "metric": "pointnet_cls_clouds_per_sec_per_chip",
        "value": round(value, 1),
        "unit": "clouds/s",
        "vs_baseline": round(value / _H100_BASELINE, 3),
    }
    if args.all:
        result["dcp_clouds_per_sec"] = round(bench_dcp(), 1)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
