"""PCN — point-cloud completion network.

Capability parity with reference models/pcn.py:8-153: two-stage shared-MLP
encoder (3->128->256, concat pooled global, 512->emb), fully-connected
coarse decoder (emb->1024->1024->3*num_coarse), and an optional folding
fine decoder tiling a 2-D grid per coarse point.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx

from learning3d_tpu.models.pooling import Pooling


class PCN(nnx.Module):
    def __init__(
        self,
        emb_dims: int = 1024,
        input_shape: str = "bnc",
        num_coarse: int = 1024,
        grid_size: int = 4,
        detailed_output: bool = False,
        *,
        dtype=None,
        rngs: nnx.Rngs,
    ):
        if input_shape not in ("bnc", "bcn"):
            raise ValueError("Allowed shapes are 'bcn' and 'bnc'.")
        self.input_shape = input_shape
        self.emb_dims = emb_dims
        self.num_coarse = num_coarse
        self.grid_size = grid_size
        self.detailed_output = detailed_output
        self.num_fine = grid_size**2 * num_coarse

        self.pooling = Pooling("max")
        # Encoder stage 1 and 2 (no norms — matches the reference, which has
        # them commented out).
        self.conv1 = nnx.Linear(3, 128, dtype=dtype, rngs=rngs)
        self.conv2 = nnx.Linear(128, 256, dtype=dtype, rngs=rngs)
        self.conv3 = nnx.Linear(512, 512, dtype=dtype, rngs=rngs)
        self.conv4 = nnx.Linear(512, emb_dims, dtype=dtype, rngs=rngs)
        # Coarse decoder.
        self.linear1 = nnx.Linear(emb_dims, 1024, dtype=dtype, rngs=rngs)
        self.linear2 = nnx.Linear(1024, 1024, dtype=dtype, rngs=rngs)
        self.linear3 = nnx.Linear(1024, num_coarse * 3, dtype=dtype, rngs=rngs)
        if detailed_output:
            self.conv5 = nnx.Linear(emb_dims + 5, 512, dtype=dtype, rngs=rngs)
            self.conv6 = nnx.Linear(512, 512, dtype=dtype, rngs=rngs)
            self.conv7 = nnx.Linear(512, 3, dtype=dtype, rngs=rngs)

    def _encode(self, x):
        h = self.conv2(jax.nn.relu(self.conv1(x)))  # (B, N, 256)
        # Fusion fence: XLA's TPU fusion pass CHECK-crashes when it fuses
        # this max-pool + broadcast-concat with the surrounding matmuls
        # (fusion_util.cc TransformWindow) at some (B, N) shapes.
        h = jax.lax.optimization_barrier(h)
        g = self.pooling(h)  # (B, 256)
        g = jnp.broadcast_to(g[:, None, :], h.shape)
        h = jnp.concatenate([h, g], axis=-1)  # (B, N, 512)
        h = self.conv4(jax.nn.relu(self.conv3(h)))
        return self.pooling(h)  # (B, emb)

    def _decode(self, v):
        h = jax.nn.relu(self.linear1(v))
        h = jax.nn.relu(self.linear2(h))
        return self.linear3(h).reshape(v.shape[0], self.num_coarse, 3)

    def _fine(self, coarse, v):
        B = coarse.shape[0]
        g = self.grid_size
        lin = np.linspace(-0.05, 0.05, g, dtype=np.float32)
        grid = np.stack(np.meshgrid(lin, lin, indexing="ij"), axis=2).reshape(-1, 2)
        grid_feat = jnp.tile(jnp.asarray(grid)[None], (B, self.num_coarse, 1))  # (B, F, 2)
        center = jnp.repeat(coarse, g * g, axis=1)  # (B, F, 3)
        # conv5 on concat(grid, center, global) split by linearity: the
        # global part is per-cloud, so its (emb x 512) product runs once
        # per cloud instead of once per fine point — the (B, F, emb+5)
        # tensor never exists and first-layer FLOPs drop ~200x. Identical
        # math to conv5(concat(...)) (reference pcn.py:70-109).
        local = jnp.concatenate([grid_feat, center], axis=-1)  # (B, F, 5)
        # cast like nnx.Linear.__call__ would — using conv5.kernel
        # directly bypasses the module's compute-dtype promotion
        dt = self.conv5.dtype or jnp.promote_types(
            local.dtype, self.conv5.kernel.value.dtype
        )
        kern = self.conv5.kernel.value.astype(dt)
        h_local = local.astype(dt) @ kern[:5]
        h_glob = v.astype(dt) @ kern[5:] + self.conv5.bias.value.astype(dt)  # (B, 512)
        h = jax.nn.relu(h_local + h_glob[:, None, :])
        h = jax.nn.relu(self.conv6(h))
        return self.conv7(h) + center

    def __call__(self, input_data):
        x = input_data
        if self.input_shape == "bcn":
            x = jnp.swapaxes(x, 1, 2)
        if x.shape[-1] != 3:
            raise RuntimeError("expected 3-channel point clouds")
        v = self._encode(x)
        coarse = self._decode(v)
        result = {"coarse_output": coarse}
        if self.detailed_output:
            result["fine_output"] = self._fine(coarse, v)
        return result
