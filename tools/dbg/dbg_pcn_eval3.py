import sys; sys.path.insert(0, '/root/repo')
import jax, jax.numpy as jnp
from flax import nnx
from learning3d_tpu.models import PCN
from learning3d_tpu.kernels.chamfer import chamfer_distance, nn_distance

model = PCN(emb_dims=1024, rngs=nnx.Rngs(0))
model.eval()
graphdef, state = nnx.split(model)
points = jax.random.normal(jax.random.PRNGKey(0), (32, 256, 3))

@jax.jit
def f_xla(state, points):
    m = nnx.merge(graphdef, state)
    out = m(points)
    d1, i1, d2, i2 = nn_distance(points, out["coarse_output"], use_pallas=False)
    return jnp.mean(d1) + jnp.mean(d2)

print("xla-path composition:", float(f_xla(state, points)))

@jax.jit
def f_pallas(state, points):
    m = nnx.merge(graphdef, state)
    out = m(points)
    d1, i1, d2, i2 = nn_distance(points, out["coarse_output"], use_pallas=True)
    return jnp.mean(d1) + jnp.mean(d2)

print("pallas-path composition:", float(f_pallas(state, points)))
