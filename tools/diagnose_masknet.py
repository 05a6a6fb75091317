#!/usr/bin/env python
"""Diagnose the r4_masknet all-0.5 saturation (loss pinned at exactly 0.25 =
sigmoid outputting exactly 0.5 everywhere). Run real train steps on CPU at
the campaign config and watch the mask-head logits."""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np
import optax
from flax import nnx

from learning3d_tpu import models
from learning3d_tpu.data import RegistrationData, SyntheticModelNet40
from learning3d_tpu.train.tasks import masknet as masknet_loss

model = models.MaskNet(models.PointNet(emb_dims=1024, use_bn=True, rngs=nnx.Rngs(1234)), rngs=nnx.Rngs(1234))
base = SyntheticModelNet40(train=True, num_points=1024, size=64)
ds = RegistrationData(algorithm="DCP", data_class=base, partial_source=True,
                      additional_params={"use_masknet": True})
B = 8
items = [ds[i] for i in range(B)]
batch = tuple(jnp.stack([jnp.asarray(it[k]) for it in items]) for k in range(4))
print("shapes:", [b.shape for b in batch], "gt inlier frac:", float(jnp.mean(batch[3])))

optimizer = nnx.Optimizer(model, optax.adam(1e-3), wrt=nnx.Param)


@nnx.jit
def step(model, optimizer):
    def lf(m):
        return masknet_loss(m, batch, jax.random.key(0), loss_fn="bce")

    (loss, aux), grads = nnx.value_and_grad(lf, has_aux=True)(model)
    leaves = jax.tree.leaves(grads)
    gnorm = jnp.sqrt(sum(jnp.sum(g.astype(jnp.float32) ** 2) for g in leaves))
    nf = sum(jnp.sum(~jnp.isfinite(g)) for g in leaves)
    optimizer.update(model, grads)
    return loss, gnorm, nf, aux


for i in range(10):
    loss, gnorm, nf, aux = step(model, optimizer)
    if i % 2 == 0 or i == 9:
        _, mask = model(batch[0], batch[1])
        print(
            f"step {i}: loss={float(loss):.5f} gnorm={float(gnorm):.3e} nf={int(nf)} "
            f"mask[min/mean/max]={float(mask.min()):.4f}/{float(mask.mean()):.4f}/{float(mask.max()):.4f} "
            f"f1={float(aux['f1']):.3f}"
        )
