import sys; sys.path.insert(0, '/root/repo')
import jax, jax.numpy as jnp
from flax import nnx
from learning3d_tpu.models import PCN
from learning3d_tpu.train.tasks import pcn as pcn_loss

model = PCN(emb_dims=1024, rngs=nnx.Rngs(0))
model.eval()
points = jax.random.normal(jax.random.PRNGKey(0), (32, 256, 3))
labels = jnp.zeros((32,), jnp.int32)

@nnx.jit
def eval_step(model, batch, key):
    return pcn_loss(model, batch, key)

loss, aux = eval_step(model, (points, labels), jax.random.PRNGKey(1))
print("eval loss:", float(loss))
