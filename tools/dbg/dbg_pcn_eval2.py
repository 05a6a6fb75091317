import sys; sys.path.insert(0, '/root/repo')
import jax, jax.numpy as jnp
from flax import nnx
from learning3d_tpu.models import PCN
from learning3d_tpu.losses.losses import chamfer_distance_loss

model = PCN(emb_dims=1024, rngs=nnx.Rngs(0))
model.eval()
graphdef, state = nnx.split(model)
points = jax.random.normal(jax.random.PRNGKey(0), (32, 256, 3))

@jax.jit
def f(state, points):
    m = nnx.merge(graphdef, state)
    out = m(points)
    return chamfer_distance_loss(points, out["coarse_output"])

print("plain jit eval:", float(f(state, points)))
