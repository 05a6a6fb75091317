#!/usr/bin/env python
"""Re-export the classifier's feature_model from a packaged release.

The gitignored checkpoints/ tree does not survive a machine snapshot
restore; releases/ does (full orbax model+opt+meta). Training runs that
warm-start from the classifier (train.py --transfer_ptnet, mirroring
the reference's ptnet export consumed by PointNetLK,
examples/train_pointnet.py:138) need
checkpoints/<exp>/feature_model/model — this tool rebuilds it from the
restored classifier checkpoint. CPU-only: never touches the TPU, safe
to run while a campaign holds the chip.

Usage: python tools/reexport_feature_model.py [exp_name=r4_pointnet_cls]
"""
import sys
from pathlib import Path

import jax

jax.config.update("jax_platforms", "cpu")  # before any backend touch

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from flax import nnx  # noqa: E402

from learning3d_tpu import models  # noqa: E402
from learning3d_tpu.train import TrainConfig, Trainer  # noqa: E402


def main():
    exp = sys.argv[1] if len(sys.argv) > 1 else "r4_pointnet_cls"
    rngs = nnx.Rngs(0)
    pn = models.PointNet(emb_dims=1024, use_bn=True, rngs=rngs)
    model = models.Classifier(feature_model=pn, num_classes=40, rngs=rngs)
    tr = Trainer(TrainConfig(exp_name=exp, task="classification"), model)
    tr.load("best")
    tr.export_feature_model()
    print(f"exported checkpoints/{exp}/feature_model/model")


if __name__ == "__main__":
    main()
