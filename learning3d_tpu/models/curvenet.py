"""CurveNet — classification with guided curve walks.

Capability parity with reference models/curvenet.py:45-112: LPFA initial
9-channel geometric lifting, 8 CIC blocks over npoint 1024 -> 256 -> 64
with per-stage curve configs, then conv -> max+avg pool -> FC classifier.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import nnx

from learning3d_tpu.ops.geometry import knn
from learning3d_tpu.utils.curvenet_blocks import CIC, LPFA

curve_config = {
    "default": [[100, 5], [100, 5], None, None],
    "long": [[10, 30], None, None, None],
}


class CurveNet(nnx.Module):
    def __init__(
        self,
        num_classes: int = 40,
        k: int = 20,
        setting: str = "default",
        input_shape: str = "bnc",
        *,
        dtype=None,
        rngs: nnx.Rngs,
    ):
        if input_shape not in ("bnc", "bcn"):
            raise ValueError("Allowed shapes are 'bcn' and 'bnc'.")
        if setting not in curve_config:
            raise ValueError(setting)
        self.input_shape = input_shape
        self.emb_dims = 1024

        cc = curve_config[setting]
        additional = 32
        self.lpfa = LPFA(9, additional, k=k, mlp_num=1, initial=True, dtype=dtype, rngs=rngs)
        mk = lambda np_, r, ic, oc, br, conf: CIC(
            npoint=np_, radius=r, k=k, in_channels=ic, output_channels=oc,
            bottleneck_ratio=br, mlp_num=1, curve_config=conf, dtype=dtype, rngs=rngs,
        )
        self.cic11 = mk(1024, 0.05, additional, 64, 2, cc[0])
        self.cic12 = mk(1024, 0.05, 64, 64, 4, cc[0])
        self.cic21 = mk(1024, 0.05, 64, 128, 2, cc[1])
        self.cic22 = mk(1024, 0.1, 128, 128, 4, cc[1])
        self.cic31 = mk(256, 0.1, 128, 256, 2, cc[2])
        self.cic32 = mk(256, 0.2, 256, 256, 4, cc[2])
        self.cic41 = mk(64, 0.2, 256, 512, 2, cc[3])
        self.cic42 = mk(64, 0.4, 512, 512, 4, cc[3])

        self.conv0_lin = nnx.Linear(512, 1024, use_bias=False, dtype=dtype, rngs=rngs)
        self.conv0_bn = nnx.BatchNorm(1024, use_running_average=False, momentum=0.9, dtype=dtype, rngs=rngs)
        self.conv1 = nnx.Linear(1024 * 2, 512, use_bias=False, dtype=dtype, rngs=rngs)
        self.bn1 = nnx.BatchNorm(512, use_running_average=False, momentum=0.9, dtype=dtype, rngs=rngs)
        self.dp1 = nnx.Dropout(0.5, rngs=rngs)
        self.conv2 = nnx.Linear(512, num_classes, dtype=dtype, rngs=rngs)

    def __call__(self, xyz):
        """xyz (B, N, 3) -> logits (B, num_classes)."""
        if self.input_shape == "bcn":
            xyz = jnp.swapaxes(xyz, 1, 2)
        # one self-inclusive kNN per resolution, shared by the LPFA lifting
        # and every same-resolution CIC block (identical indices to the
        # reference's per-block recomputation; see CIC.__call__)
        idx0 = knn(xyz, self.lpfa.k + 1)
        l0 = self.lpfa(xyz, xyz, idx=idx0[..., : self.lpfa.k])
        x1, p1, i1 = self.cic11(xyz, l0, idx=idx0)
        x1, p1, i1 = self.cic12(x1, p1, idx=i1)
        x2, p2, i2 = self.cic21(x1, p1, idx=i1)
        x2, p2, i2 = self.cic22(x2, p2, idx=i2)
        x3, p3, i3 = self.cic31(x2, p2)
        x3, p3, i3 = self.cic32(x3, p3, idx=i3)
        x4, p4, i4 = self.cic41(x3, p3)
        x4, p4, i4 = self.cic42(x4, p4, idx=i4)

        h = jax.nn.relu(self.conv0_bn(self.conv0_lin(p4)))  # (B, 64, 1024)
        h = jnp.concatenate([jnp.max(h, axis=1), jnp.mean(h, axis=1)], axis=-1)
        h = jax.nn.relu(self.bn1(self.conv1(h)))
        h = self.dp1(h)
        return self.conv2(h)
