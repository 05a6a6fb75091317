#!/usr/bin/env python
"""Diagnose the r4_rpmnet freeze: test loss was bit-identical from epoch 1
(docs/runs/r4_rpmnet.log), the signature of every step being skipped by the
Trainer's non-finite-grad guard. Run a few real train steps on CPU and
report the gradient global norm / finiteness per step."""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np
from flax import nnx

from learning3d_tpu import models
from learning3d_tpu.data import RegistrationData, SyntheticModelNet40
from learning3d_tpu.train.tasks import rpmnet as rpmnet_loss

model = models.RPMNet(rngs=nnx.Rngs(1234))
base = SyntheticModelNet40(train=True, num_points=512, size=64)
ds = RegistrationData(algorithm="RPMNet", data_class=base)
B = 4
batch_np = [ds[i] for i in range(B)]
batch = tuple(
    jnp.stack([jnp.asarray(item[k]) for item in batch_np]) for k in range(3)
)
print("shapes:", [b.shape for b in batch])

import optax

opt = optax.adam(1e-3)
graphdef, params, rest = nnx.split(model, nnx.Param, ...)
opt_state = opt.init(params)


def loss_fn(params):
    m = nnx.merge(graphdef, params, rest)
    loss, aux = rpmnet_loss(m, batch, jax.random.key(0))
    return loss, aux


@jax.jit
def step(params, opt_state):
    (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
    leaves = jax.tree.leaves(grads)
    gnorm = jnp.sqrt(sum(jnp.sum(g.astype(jnp.float32) ** 2) for g in leaves))
    nonfinite = sum(jnp.sum(~jnp.isfinite(g)) for g in leaves)
    updates, opt_state = opt.update(grads, opt_state, params)
    params = optax.apply_updates(params, updates)
    return params, opt_state, loss, gnorm, nonfinite, aux


for i in range(6):
    params, opt_state, loss, gnorm, nonfinite, aux = step(params, opt_state)
    print(
        f"step {i}: loss={float(loss):.4f} gnorm={float(gnorm):.4e} "
        f"nonfinite_grad_elems={int(nonfinite)} rot_deg={float(jnp.mean(aux["rot_deg"])):.2f}"
    )

# Also inspect which parameter groups carry non-finite grads on step 0
(loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
flat = jax.tree_util.tree_flatten_with_path(grads)[0]
bad = [(jax.tree_util.keystr(k), int(jnp.sum(~jnp.isfinite(v)))) for k, v in flat if not bool(jnp.all(jnp.isfinite(v)))]
print("non-finite grad tensors:", bad[:20] if bad else "none")
