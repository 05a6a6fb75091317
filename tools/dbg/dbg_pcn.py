import sys; sys.path.insert(0, '/root/repo')
import jax, jax.numpy as jnp
from flax import nnx
from learning3d_tpu.models import PCN
from learning3d_tpu.train.tasks import pcn as pcn_loss
import optax

model = PCN(emb_dims=1024, rngs=nnx.Rngs(0))
model.train()
opt = nnx.Optimizer(model, optax.adam(1e-3), wrt=nnx.Param)
points = jax.random.normal(jax.random.PRNGKey(0), (32, 256, 3))

@nnx.jit
def step(model, opt, batch):
    def lf(m):
        return pcn_loss(m, batch, None)
    (loss, aux), grads = nnx.value_and_grad(lf, has_aux=True)(model)
    opt.update(model, grads)
    return loss

print("loss:", float(step(model, opt, (points,))))
