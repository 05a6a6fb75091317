#!/usr/bin/env python
"""On-TPU gradient finiteness check for RPMNet at the frozen r4 checkpoint
and at init, at the campaign's real batch shape (B=16, N=1024)."""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np
import orbax.checkpoint as ocp
from flax import nnx

from learning3d_tpu import models
from learning3d_tpu.data import RegistrationData, SyntheticModelNet40
from learning3d_tpu.train.tasks import rpmnet as rpmnet_loss

print("backend:", jax.default_backend())

model = models.RPMNet(rngs=nnx.Rngs(1234))
base = SyntheticModelNet40(train=True, num_points=1024, size=64)
ds = RegistrationData(algorithm="RPMNet", data_class=base)
B = 16
items = [ds[i] for i in range(B)]
batch = tuple(jnp.stack([jnp.asarray(it[k]) for it in items]) for k in range(3))

graphdef, params, rest = nnx.split(model, nnx.Param, ...)


@jax.jit
def gradcheck(params):
    def loss_fn(p):
        m = nnx.merge(graphdef, p, rest)
        loss, aux = rpmnet_loss(m, batch, jax.random.key(0))
        return loss

    loss, grads = jax.value_and_grad(loss_fn)(params)
    leaves = jax.tree.leaves(grads)
    gnorm = jnp.sqrt(sum(jnp.sum(g.astype(jnp.float32) ** 2) for g in leaves))
    nonfinite = sum(jnp.sum(~jnp.isfinite(g)) for g in leaves)
    return loss, gnorm, nonfinite


for tag, p in [("init", params)]:
    loss, gnorm, nf = gradcheck(p)
    print(f"{tag}: loss={float(loss):.4f} gnorm={float(gnorm):.4e} nonfinite={int(nf)}")

with ocp.StandardCheckpointer() as ck:
    abstract = jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), nnx.state(model)
    )
    nnx.update(model, ck.restore(Path("checkpoints/r4_rpmnet/latest/model").resolve(), abstract))
graphdef, ckpt, rest = nnx.split(model, nnx.Param, ...)
loss, gnorm, nf = gradcheck(ckpt)
print(f"ckpt: loss={float(loss):.4f} gnorm={float(gnorm):.4e} nonfinite={int(nf)}")

# per-tensor non-finite map at the checkpoint
def loss_fn(p):
    m = nnx.merge(graphdef, p, rest)
    loss, aux = rpmnet_loss(m, batch, jax.random.key(0))
    return loss

grads = jax.jit(jax.grad(loss_fn))(ckpt)
flat = jax.tree_util.tree_flatten_with_path(grads)[0]
bad = [(jax.tree_util.keystr(k), int(jnp.sum(~jnp.isfinite(v)))) for k, v in flat if not bool(jnp.all(jnp.isfinite(v)))]
print("non-finite grad tensors at ckpt:", bad[:25] if bad else "none")
