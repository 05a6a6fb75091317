"""PPFNet feature extractor (reference models/ppfnet.py:15-101).

Hybrid per-cluster features {ppf, dxyz, xyz} -> shared Conv2d prepool stack
with GroupNorm -> max over neighbors -> Conv1d postpool -> L2-normalized
per-point features (B, N, emb_dims).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import nnx

from learning3d_tpu.utils.layers import to_bnc, validate_input_shape

from learning3d_tpu.ops.grouping import sample_and_group_multi

_RAW_SIZES = {"xyz": 3, "dxyz": 3, "ppf": 4}
_RAW_ORDER = {"xyz": 0, "dxyz": 1, "ppf": 2}


class _ConvGN(nnx.Module):
    def __init__(self, i, o, groups=8, act=True, *, dtype=None, rngs: nnx.Rngs):
        self.lin = nnx.Linear(i, o, dtype=dtype, rngs=rngs)
        self.gn = nnx.GroupNorm(o, num_groups=groups, dtype=dtype, rngs=rngs)
        self.act = act

    def __call__(self, x):
        x = self.gn(self.lin(x))
        return jax.nn.relu(x) if self.act else x


class PPFNet(nnx.Module):
    def __init__(
        self,
        features=("ppf", "dxyz", "xyz"),
        emb_dims: int = 96,
        radius: float = 0.3,
        num_neighbors: int = 64,
        input_shape: str = "bnc",
        *,
        dtype=None,
        rngs: nnx.Rngs,
    ):
        self.input_shape = validate_input_shape(input_shape)
        self.emb_dims = emb_dims
        self.radius = radius
        self.n_sample = num_neighbors
        self.features = sorted(features, key=lambda f: _RAW_ORDER[f])
        raw_dim = sum(_RAW_SIZES[f] for f in self.features)
        mid = emb_dims  # = (emb_dims * 2) // 2
        self.prepool = nnx.List([
            _ConvGN(raw_dim, mid, dtype=dtype, rngs=rngs),
            _ConvGN(mid, mid, dtype=dtype, rngs=rngs),
            _ConvGN(mid, emb_dims * 2, dtype=dtype, rngs=rngs),
        ])
        self.postpool = nnx.List([
            _ConvGN(emb_dims * 2, emb_dims * 2, dtype=dtype, rngs=rngs),
            _ConvGN(emb_dims * 2, emb_dims, dtype=dtype, rngs=rngs),
        ])
        self.post_final = nnx.Linear(emb_dims, emb_dims, dtype=dtype, rngs=rngs)

    def __call__(self, xyz, normals):
        """xyz, normals (B, N, 3) -> (B, N, emb_dims) unit features."""
        xyz = to_bnc(xyz, self.input_shape)
        normals = to_bnc(normals, self.input_shape)
        feats = sample_and_group_multi(-1, self.radius, self.n_sample, xyz, normals)
        feats["xyz"] = jnp.broadcast_to(
            feats["xyz"][:, :, None, :], feats["dxyz"].shape
        )
        fused = jnp.concatenate([feats[f] for f in self.features], axis=-1)
        x = fused  # (B, N, n_sample, raw)
        for blk in self.prepool:
            x = blk(x)
        x = jnp.max(x, axis=2)  # (B, N, 2*emb)
        for blk in self.postpool:
            x = blk(x)
        x = self.post_final(x)
        return x / jnp.maximum(jnp.linalg.norm(x, axis=-1, keepdims=True), 1e-12)
