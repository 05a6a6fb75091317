"""Classification head (reference models/classifier.py:6-29): pooled
encoder features -> Linear 512 -> 256 -> num_classes with BatchNorm and
dropout 0.7. Returns logits (the train loop applies log_softmax + NLL,
examples/train_pointnet.py:91-93)."""

from __future__ import annotations

import jax
from flax import nnx

from learning3d_tpu.models.pooling import Pooling


class Classifier(nnx.Module):
    def __init__(self, feature_model: nnx.Module, num_classes: int = 40, *, dtype=None, rngs: nnx.Rngs):
        self.feature_model = feature_model
        self.num_classes = num_classes
        emb = feature_model.emb_dims
        self.linear1 = nnx.Linear(emb, 512, dtype=dtype, rngs=rngs)
        self.bn1 = nnx.BatchNorm(512, use_running_average=False, momentum=0.9, dtype=dtype, rngs=rngs)
        self.dropout1 = nnx.Dropout(0.7, rngs=rngs)
        self.linear2 = nnx.Linear(512, 256, dtype=dtype, rngs=rngs)
        self.bn2 = nnx.BatchNorm(256, use_running_average=False, momentum=0.9, dtype=dtype, rngs=rngs)
        self.dropout2 = nnx.Dropout(0.7, rngs=rngs)
        self.linear3 = nnx.Linear(256, num_classes, dtype=dtype, rngs=rngs)
        self.pooling = Pooling("max")

    def __call__(self, input_data):
        if hasattr(self.feature_model, "pooled_features"):
            # fused BN+ReLU+max-pool tail (identical math; see
            # utils.layers.fused_bn_relu_maxpool)
            x = self.feature_model.pooled_features(input_data)
        else:
            x = self.pooling(self.feature_model(input_data))
        x = self.dropout1(jax.nn.relu(self.bn1(self.linear1(x))))
        x = self.dropout2(jax.nn.relu(self.bn2(self.linear2(x))))
        return self.linear3(x)
