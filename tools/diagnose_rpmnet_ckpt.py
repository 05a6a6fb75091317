#!/usr/bin/env python
"""Inspect the frozen r4_rpmnet checkpoint: is est_T input-independent
(model collapse), and what do beta/alpha (the annealing params) look like?"""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np
import orbax.checkpoint as ocp
from flax import nnx

from learning3d_tpu import models
from learning3d_tpu.data import RegistrationData, SyntheticModelNet40

model = models.RPMNet(rngs=nnx.Rngs(1234))
path = Path("checkpoints/r4_rpmnet/latest/model").resolve()
with ocp.StandardCheckpointer() as ck:
    abstract = jax.tree.map(lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), nnx.state(model))
    nnx.update(model, ck.restore(path, abstract))

# param sanity
state = nnx.state(model, nnx.Param)
leaves = jax.tree.leaves(state)
print("params finite:", all(bool(jnp.all(jnp.isfinite(l))) for l in leaves))
print("param absmax:", max(float(jnp.max(jnp.abs(l))) for l in leaves))

base = SyntheticModelNet40(train=False, num_points=512, size=64)
ds = RegistrationData(algorithm="RPMNet", data_class=base)
for i in range(3):
    t, s, igt = ds[i]
    t = jnp.asarray(t)[None]
    s = jnp.asarray(s)[None]
    out = model(t, s, max_iterations=2)
    beta, alpha = model.weights_net(s[..., :3], t[..., :3])
    print(
        f"item {i}: est_T[0,:3,3]={np.asarray(out['est_T'][0, :3, 3]).round(4)} "
        f"est_R diag={np.asarray(jnp.diagonal(out['est_T'][0, :3, :3])).round(4)} "
        f"beta={float(beta[0]):.6f} alpha={float(alpha[0]):.6f}"
    )
    r = out["r"]
    print("   r absmax:", float(jnp.max(jnp.abs(r))), "finite:", bool(jnp.all(jnp.isfinite(out["est_T"]))))
