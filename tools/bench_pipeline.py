#!/usr/bin/env python
"""Input-pipeline benchmark: host path (sync vs prefetch) vs on-device
synthesis (VERDICT r2 item 8 evidence).

Measures wall-clock per epoch of the PointNet-classifier TRAIN loop fed
three ways:
  host-sync     — batch_iterator consumed inline (r1 behavior)
  host-prefetch — prefetch_to_device thread assembling + device_put'ing
  on-device     — data resident, only PRNG keys cross the host boundary

Run on the attached TPU: python tools/bench_pipeline.py
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import optax
from flax import nnx


def main(batch=64, points=1024, size=2048, epochs=3):
    from learning3d_tpu.data import ClassificationData, SyntheticModelNet40, batch_iterator
    from learning3d_tpu.data.device_pipeline import prefetch_to_device

    ds = ClassificationData(SyntheticModelNet40(num_points=points, size=size))

    from learning3d_tpu.models import Classifier, PointNet

    model = Classifier(
        PointNet(emb_dims=1024, use_bn=True, dtype=jnp.bfloat16, rngs=nnx.Rngs(0)),
        num_classes=40,
        dtype=jnp.bfloat16,
        rngs=nnx.Rngs(1),
    )
    model.train()
    optimizer = nnx.Optimizer(model, optax.adam(1e-3), wrt=nnx.Param)

    @nnx.jit
    def step(model, optimizer, pts, lbl):
        def lf(m):
            logits = m(pts)
            logp = jax.nn.log_softmax(logits.astype(jnp.float32), -1)
            return -jnp.mean(jnp.take_along_axis(logp, lbl[:, None], axis=1))

        loss, grads = nnx.value_and_grad(lf)(model)
        optimizer.update(model, grads)
        return loss

    def run_host(prefetch):
        last = None
        it = batch_iterator(ds, batch, shuffle=True, seed=1)
        if prefetch:
            it = prefetch_to_device(it, put=lambda b: jax.tree.map(jnp.asarray, b))
        for pts, lbl in it:
            last = step(model, optimizer, jnp.asarray(pts), jnp.asarray(lbl))
        return last

    # on-device: all clouds resident; batches are just device-side slices
    all_pts = jnp.asarray(
        # stack the whole synthetic set once
        jax.numpy.stack([jnp.asarray(ds[i][0]) for i in range(size)])
    )
    all_lbl = jnp.asarray([int(ds[i][1]) for i in range(size)])

    def run_device(epoch):
        order = jax.random.permutation(jax.random.PRNGKey(epoch), size)
        last = None
        for s in range(0, size - batch + 1, batch):
            idx = jax.lax.dynamic_slice_in_dim(order, s, batch)
            last = step(model, optimizer, all_pts[idx], all_lbl[idx])
        return last

    results = {}
    for name, fn in (
        ("host-sync", lambda e: run_host(False)),
        ("host-prefetch", lambda e: run_host(True)),
        ("on-device", run_device),
    ):
        float(fn(0))  # warm compile + caches
        times = []
        for e in range(epochs):
            t0 = time.perf_counter()
            last = fn(e + 1)
            float(last)  # barrier
            times.append(time.perf_counter() - t0)
        results[name] = min(times)
        print(f"{name}: {min(times):.2f}s/epoch (all: {[f'{t:.2f}' for t in times]})", flush=True)

    ratio = results["host-prefetch"] / results["on-device"]
    print(f"host-prefetch / on-device = {ratio:.2f}x")


if __name__ == "__main__":
    main()
