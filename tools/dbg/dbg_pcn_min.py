import sys; sys.path.insert(0, '/root/repo')
import jax, jax.numpy as jnp
from flax import nnx
from learning3d_tpu.models import PCN

model = PCN(emb_dims=1024, rngs=nnx.Rngs(0))
model.eval()
graphdef, state = nnx.split(model)
points = jax.random.normal(jax.random.PRNGKey(0), (32, 256, 3))

@jax.jit
def enc_only(state, points):
    m = nnx.merge(graphdef, state)
    return jnp.sum(m(points)["coarse_output"])

print("encoder+decoder only:", float(enc_only(state, points)))

from learning3d_tpu.ops.geometry import square_distance
@jax.jit
def sq_highest(state, points):
    m = nnx.merge(graphdef, state)
    c = m(points)["coarse_output"]
    return jnp.sum(square_distance(points, c))

print("pcn + square_distance HIGHEST:", float(sq_highest(state, points)))
