"""DGCNN encoder (reference models/dgcnn.py:6-49).

Edge features are computed once — kNN(k=20) with (neighbor, center)
concatenation — then four 1x1-conv stages, each max-pooled over neighbors,
concatenated (64+64+128+256=512) into the final embedding conv. Conv
layers are bias-free + BatchNorm, as in the reference.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import nnx

from learning3d_tpu.kernels.dgcnn_fused import dgcnn_encode_fused, dgcnn_fused_ok
from learning3d_tpu.kernels.edgeconv import get_graph_feature_fused


class DGCNN(nnx.Module):
    def __init__(self, emb_dims: int = 1024, input_shape: str = "bnc", k: int = 20, *, dtype=None, rngs: nnx.Rngs):
        if input_shape not in ("bnc", "bcn"):
            raise ValueError("Allowed shapes are 'bcn' and 'bnc'.")
        self.input_shape = input_shape
        self.emb_dims = emb_dims
        self.k = k
        # set by quant.quantize_dcp (static tuple of per-stage activation
        # scales): routes eval to the int8 fused encoder kernel
        self.int8_scales = None
        dims = [(6, 64), (64, 64), (64, 128), (128, 256), (512, emb_dims)]
        self.convs = nnx.List([
            nnx.Linear(i, o, use_bias=False, dtype=dtype, rngs=rngs) for i, o in dims
        ])
        self.bns = nnx.List([
            nnx.BatchNorm(o, use_running_average=False, momentum=0.9, dtype=dtype, rngs=rngs)
            for _, o in dims
        ])

    def __call__(self, input_data):
        """-> (B, N, emb_dims) per-point features."""
        x = input_data
        if self.input_shape == "bcn":
            x = jnp.swapaxes(x, 1, 2)
        if x.shape[-1] != 3:
            raise RuntimeError("expected 3-channel point clouds")

        if dgcnn_fused_ok(x, self.convs, self.bns, self.k):
            import os

            approx = os.environ.get("L3D_APPROX_KNN", "") == "1"
            if self.int8_scales is not None:
                # int8 serving mode (quant.quantize_dcp): int8 one-hot
                # gathers + int8 conv chain on the int8 MXU
                from learning3d_tpu.kernels.dgcnn_fused import dgcnn_encode_fused_int8

                return dgcnn_encode_fused_int8(
                    x, self.convs, self.bns, self.k, self.int8_scales,
                    approx_knn=approx,
                )
            # Eval-mode TPU bf16: the whole encoder (kNN + edge gather +
            # 5 BN-folded conv stages + neighbor max) runs as one Pallas
            # kernel; edge tensors never leave VMEM (kernels/dgcnn_fused.py).
            # L3D_APPROX_KNN=1 opts the selection loop into quantized-key
            # single-pass picks (serving knob; near-ties inside a
            # max(d)/2^20 bucket resolve toward the smaller index).
            return dgcnn_encode_fused(
                x, self.convs, self.bns, self.k, approx_knn=approx
            )

        e = get_graph_feature_fused(x, k=self.k)  # (B, N, k, 6); Pallas on TPU
        stage_outputs = []
        for conv, bn in zip(self.convs[:4], self.bns[:4]):
            e = jax.nn.relu(bn(conv(e)))  # (B, N, k, C)
            stage_outputs.append(jnp.max(e, axis=2))  # (B, N, C)
        cat = jnp.concatenate(stage_outputs, axis=-1)  # (B, N, 512)
        return jax.nn.relu(self.bns[4](self.convs[4](cat)))  # (B, N, emb)
