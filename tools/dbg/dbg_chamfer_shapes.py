import sys; sys.path.insert(0, '/root/repo')
import jax, jax.numpy as jnp
from learning3d_tpu.kernels.chamfer import chamfer_distance, nn_distance
from learning3d_tpu.losses.losses import chamfer_distance_loss

x = jax.random.normal(jax.random.PRNGKey(0), (32, 256, 3))
y = jax.random.normal(jax.random.PRNGKey(1), (32, 1024, 3))
print("A: nn_distance pallas...")
d1, i1, d2, i2 = jax.jit(lambda x, y: nn_distance(x, y))(x, y)
print("A ok", float(d1.sum()))
print("B: chamfer_distance (custom_vjp primal)...")
a, b = jax.jit(chamfer_distance)(x, y)
print("B ok", float(a.sum()))
print("C: chamfer loss...")
v = jax.jit(chamfer_distance_loss)(x, y)
print("C ok", float(v))
