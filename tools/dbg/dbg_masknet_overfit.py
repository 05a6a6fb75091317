import sys; sys.path.insert(0, '/root/repo')
import numpy as np
import jax, jax.numpy as jnp
from flax import nnx
import optax
from learning3d_tpu import models
from learning3d_tpu.data import RegistrationData, SyntheticModelNet40
from learning3d_tpu.train.tasks import masknet as mask_loss

ds = RegistrationData("DCP", SyntheticModelNet40(num_points=1024, size=8),
                      partial_source=True, additional_params={"use_masknet": True})
items = [ds[i] for i in range(8)]
batch = tuple(jnp.asarray(np.stack([it[j] for it in items])) for j in range(4))
print("shapes:", [b.shape for b in batch], "gt mean:", float(batch[3].mean()))

pn = models.PointNet(emb_dims=512, use_bn=True, rngs=nnx.Rngs(0))
model = models.MaskNet(pn, rngs=nnx.Rngs(1))
model.train()
opt = nnx.Optimizer(model, optax.adam(1e-3), wrt=nnx.Param)

@nnx.jit
def step(model, opt, batch):
    def lf(m):
        return mask_loss(m, batch, None)
    (loss, aux), grads = nnx.value_and_grad(lf, has_aux=True)(model)
    opt.update(model, grads)
    return loss

losses = [float(step(model, opt, batch)) for _ in range(60)]
print("losses:", [f"{l:.4f}" for l in losses[::10]], "final", f"{losses[-1]:.4f}")
