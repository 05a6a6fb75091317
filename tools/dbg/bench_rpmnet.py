import sys, time, functools
sys.path.insert(0, '/root/repo')
import jax, jax.numpy as jnp
from flax import nnx
from learning3d_tpu.models import RPMNet

dtype = jnp.bfloat16
net = RPMNet(dtype=dtype, rngs=nnx.Rngs(0))
net.eval()
gd, st = nnx.split(net)
B, N = 16, 1024
xyz = jax.random.normal(jax.random.PRNGKey(0), (B, N, 3))
nrm = xyz / jnp.linalg.norm(xyz, axis=-1, keepdims=True)
t = jnp.concatenate([xyz, nrm], -1)
s = jnp.concatenate([xyz + 0.1, nrm], -1)

@functools.partial(jax.jit, static_argnums=0)
def many(n, st):
    m = nnx.merge(gd, st)
    return jax.lax.fori_loop(0, n, lambda i, acc: acc + jnp.sum(m(t + 1e-4*i, s, max_iterations=2)["est_T"]).astype(jnp.float32), jnp.float32(0))

def timed(iters=11, reps=3):
    float(many(1, st)); float(many(iters, st))
    def tt(n):
        best = 1e9
        for _ in range(reps):
            t0=time.perf_counter(); float(many(n, st)); best=min(best, time.perf_counter()-t0)
        return best
    return (tt(iters)-tt(1))/(iters-1)

per = timed()
print(f"RPMNet (2 iters) B={B} N={N}: {per*1e3:.2f} ms -> {B/per:,.0f} pairs/s")
