#!/usr/bin/env python
"""Inference throughput for every model in the zoo (difference-quotient
timing; see bench.py). Run on TPU; results go to BENCH_NOTES.md.

Usage: python tools/bench_models.py [--only pointnet,dcp,...]
"""

import argparse
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


def bench(name, B, body, iters=11):
    @functools.partial(jax.jit, static_argnums=0)
    def many(n):
        return jax.lax.fori_loop(0, n, lambda i, acc: acc + body(i).astype(jnp.float32), jnp.float32(0))

    t0 = time.perf_counter()
    per = timed(many, iters=iters)
    print(
        f"{name:28s}: {per*1e3:8.2f} ms  ({B/per:,.0f} clouds-or-pairs/s)"
        f"   [compile+run {time.perf_counter()-t0:.0f}s]",
        flush=True,
    )


def split_eval(model):
    model.eval()
    return nnx.split(model)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--only", default="", help="comma-separated subset of model names")
    args = p.parse_args()
    only = set(filter(None, args.only.split(",")))

    def want(name):
        return not only or name in only

    from learning3d_tpu import models

    dtype = jnp.bfloat16
    key = jax.random.PRNGKey(0)
    x1024 = jax.random.normal(key, (32, 1024, 3))
    y1024 = jax.random.normal(jax.random.PRNGKey(1), (32, 1024, 3))

    if want("pointconv"):
        gd, st = split_eval(models.PointConvDensityClsSsg(classifier=True, dtype=dtype, rngs=nnx.Rngs(0)))
        bench("PointConv cls B=32", 32, lambda i, gd=gd, st=st: jnp.sum(nnx.merge(gd, st)(x1024 + 1e-4 * i)))

    if want("curvenet"):
        gd, st = split_eval(models.CurveNet(dtype=dtype, rngs=nnx.Rngs(0)))
        bench("CurveNet cls B=32", 32, lambda i, gd=gd, st=st: jnp.sum(nnx.merge(gd, st)(x1024 + 1e-4 * i)))

    if want("pointnet"):
        gd, st = split_eval(models.Classifier(models.PointNet(emb_dims=1024, use_bn=True, dtype=dtype, rngs=nnx.Rngs(0)), dtype=dtype, rngs=nnx.Rngs(1)))
        bench("PointNet cls B=32", 32, lambda i, gd=gd, st=st: jnp.sum(nnx.merge(gd, st)(x1024 + 1e-4 * i)))

    if want("dgcnn"):
        gd, st = split_eval(models.Classifier(models.DGCNN(emb_dims=1024, dtype=dtype, rngs=nnx.Rngs(0)), dtype=dtype, rngs=nnx.Rngs(1)))
        bench("DGCNN cls B=32", 32, lambda i, gd=gd, st=st: jnp.sum(nnx.merge(gd, st)(x1024 + 1e-4 * i)))

    if want("segmentation"):
        gd, st = split_eval(models.Segmentation(models.PointNet(emb_dims=1024, use_bn=True, global_feat=False, dtype=dtype, rngs=nnx.Rngs(0)), num_classes=40, dtype=dtype, rngs=nnx.Rngs(1)))
        bench("Segmentation B=32", 32, lambda i, gd=gd, st=st: jnp.sum(nnx.merge(gd, st)(x1024 + 1e-4 * i)))

    if want("pcn"):
        gd, st = split_eval(models.PCN(emb_dims=1024, num_coarse=1024, detailed_output=True, dtype=dtype, rngs=nnx.Rngs(0)))
        bench("PCN (folding) B=32", 32, lambda i, gd=gd, st=st: jnp.sum(nnx.merge(gd, st)(x1024 + 1e-4 * i)["fine_output"]))

    if want("dcp"):
        gd, st = split_eval(models.DCP(models.DGCNN(emb_dims=512, dtype=dtype, rngs=nnx.Rngs(0)), dtype=dtype, rngs=nnx.Rngs(1)))
        bench("DCP B=32", 32, lambda i, gd=gd, st=st: jnp.sum(nnx.merge(gd, st)(x1024 + 1e-4 * i, y1024)["est_T"]))

    if want("ipcrnet"):
        gd, st = split_eval(models.iPCRNet(models.PointNet(emb_dims=1024, use_bn=False, dtype=dtype, rngs=nnx.Rngs(0)), rngs=nnx.Rngs(1), dtype=dtype))
        bench("iPCRNet (8 it) B=32", 32, lambda i, gd=gd, st=st: jnp.sum(nnx.merge(gd, st)(x1024 + 1e-4 * i, y1024)["est_T"]))

    if want("pointnetlk"):
        gd, st = split_eval(models.PointNetLK(models.PointNet(emb_dims=1024, use_bn=False, dtype=dtype, rngs=nnx.Rngs(0))))
        bench("PointNetLK (10 it) B=32", 32, lambda i, gd=gd, st=st: jnp.sum(nnx.merge(gd, st)(x1024 + 1e-4 * i, y1024)["est_T"]))

    if want("prnet"):
        x768 = x1024[:16, :768]
        y768 = y1024[:16, :768]
        gd, st = split_eval(models.PRNet(emb_dims=512, num_keypoints=512, num_subsampled_points=768, num_iters=3, dtype=dtype, rngs=nnx.Rngs(0)))
        bench("PRNet (3 it) B=16", 16, lambda i, gd=gd, st=st: jnp.sum(nnx.merge(gd, st)(x768 + 1e-4 * i, y768)["est_T"]), iters=5)

    if want("rpmnet"):
        n = jax.random.normal(jax.random.PRNGKey(2), (16, 1024, 3))
        nn_ = n / jnp.linalg.norm(n, axis=-1, keepdims=True)
        xn = jnp.concatenate([x1024[:16], nn_], axis=-1)
        yn = jnp.concatenate([y1024[:16], nn_], axis=-1)
        gd, st = split_eval(models.RPMNet(dtype=dtype, rngs=nnx.Rngs(0)))
        bench("RPMNet (2 it) B=16", 16, lambda i, gd=gd, st=st: jnp.sum(nnx.merge(gd, st)(xn + 1e-4 * i, yn, max_iterations=2)["est_T"]), iters=5)

    if want("deepgmr"):
        from learning3d_tpu.ops.geometry import get_rri

        feats = get_rri(x1024, k=20)
        xr = jnp.concatenate([x1024, feats], axis=-1)
        featsy = get_rri(y1024, k=20)
        yr = jnp.concatenate([y1024, featsy], axis=-1)
        gd, st = split_eval(models.DeepGMR(use_rri=True, dtype=dtype, rngs=nnx.Rngs(0)))
        bench("DeepGMR B=32", 32, lambda i, gd=gd, st=st: jnp.sum(nnx.merge(gd, st)(xr + 1e-4 * i, yr)["est_T"]))

    if want("masknet"):
        gd, st = split_eval(models.MaskNet(models.PointNet(emb_dims=1024, use_bn=True, dtype=dtype, rngs=nnx.Rngs(0)), rngs=nnx.Rngs(1), dtype=dtype))
        bench("MaskNet B=32", 32, lambda i, gd=gd, st=st: jnp.sum(nnx.merge(gd, st)(x1024 + 1e-4 * i, y1024)[1]))

    if want("masknet2"):
        gd, st = split_eval(models.MaskNet2(rngs=nnx.Rngs(0), dtype=dtype))
        bench("MaskNet2 B=32", 32, lambda i, gd=gd, st=st: jnp.sum(nnx.merge(gd, st)(x1024 + 1e-4 * i, y1024)[1]))

    if want("ppfnet"):
        n = jax.random.normal(jax.random.PRNGKey(3), (16, 1024, 3))
        nn_ = n / jnp.linalg.norm(n, axis=-1, keepdims=True)
        gd, st = split_eval(models.PPFNet(rngs=nnx.Rngs(0), dtype=dtype))
        bench("PPFNet B=16", 16, lambda i, gd=gd, st=st: jnp.sum(nnx.merge(gd, st)(x1024[:16] + 1e-4 * i, nn_)))

    if want("flownet3d"):
        x2048 = jax.random.normal(jax.random.PRNGKey(4), (16, 2048, 3))
        y2048 = jax.random.normal(jax.random.PRNGKey(5), (16, 2048, 3))
        f = jnp.zeros((16, 2048, 3))
        gd, st = split_eval(models.FlowNet3D(dtype=dtype, rngs=nnx.Rngs(0)))
        bench("FlowNet3D B=16 N=2048", 16, lambda i, gd=gd, st=st: jnp.sum(nnx.merge(gd, st)(x2048 + 1e-4 * i, y2048, f, f)), iters=5)


if __name__ == "__main__":
    main()
