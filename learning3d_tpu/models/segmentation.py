"""Per-point segmentation head (reference models/segmentation.py:6-27):
encoder with global_feat=False -> 1x1 conv stack (emb+64)->512->256->128->
num_classes -> (B, N, num_classes) logits."""

from __future__ import annotations

import jax
from flax import nnx


class Segmentation(nnx.Module):
    def __init__(self, feature_model: nnx.Module, num_classes: int = 40, *, dtype=None, rngs: nnx.Rngs):
        self.feature_model = feature_model
        self.num_classes = num_classes
        emb = feature_model.emb_dims + 64
        self.conv1 = nnx.Linear(emb, 512, dtype=dtype, rngs=rngs)
        self.conv2 = nnx.Linear(512, 256, dtype=dtype, rngs=rngs)
        self.conv3 = nnx.Linear(256, 128, dtype=dtype, rngs=rngs)
        self.conv4 = nnx.Linear(128, num_classes, dtype=dtype, rngs=rngs)
        self.bn1 = nnx.BatchNorm(512, use_running_average=False, momentum=0.9, dtype=dtype, rngs=rngs)
        self.bn2 = nnx.BatchNorm(256, use_running_average=False, momentum=0.9, dtype=dtype, rngs=rngs)
        self.bn3 = nnx.BatchNorm(128, use_running_average=False, momentum=0.9, dtype=dtype, rngs=rngs)

    def __call__(self, input_data):
        x = self.feature_model(input_data)  # (B, N, emb + 64)
        x = jax.nn.relu(self.bn1(self.conv1(x)))
        x = jax.nn.relu(self.bn2(self.conv2(x)))
        x = jax.nn.relu(self.bn3(self.conv3(x)))
        return self.conv4(x)  # (B, N, num_classes)
