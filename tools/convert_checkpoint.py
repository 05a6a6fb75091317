#!/usr/bin/env python
"""Convert a reference (PyTorch learning3d) checkpoint into a framework
orbax checkpoint, end to end.

The reference ships per-model ``.t7``/``.pth`` files
(/root/reference/README.md:47-60); users switching frameworks convert
them once with this CLI and then load with ``Trainer.load`` /
``examples/evaluate.py --ckpt`` / ``learning3d_tpu.serve.load_model``:

    python tools/convert_checkpoint.py --model pointnet \
        --torch_ckpt exp_classifier/models/best_ptnet_model.t7 \
        --exp_name converted_pointnet --ckpt_dir checkpoints

Weight-name mapping is the tested importer
(learning3d_tpu/utils/torch_import.py — weight-copy parity for every
architecture is pinned by tests/test_torch_parity.py); the round trip
torch file -> orbax -> identical logits is pinned by
tests/test_torch_import.py::TestConvertCheckpoint.
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def convert(model_name, torch_ckpt, exp_name, ckpt_dir, args=None):
    """Build the named model, install the torch checkpoint, save orbax.

    Returns (trainer, import_report)."""
    from flax import nnx

    from examples.train import build_model
    from learning3d_tpu.train import TrainConfig, Trainer
    from learning3d_tpu.utils.torch_import import load_torch_checkpoint

    if args is None:
        args = argparse.Namespace(
            emb_dims=1024, nearest_neighbors=20, num_points=1024
        )
    model = build_model(model_name, args, nnx.Rngs(0))
    report = load_torch_checkpoint(model, torch_ckpt)
    cfg = TrainConfig(exp_name=exp_name, task="classification", ckpt_dir=ckpt_dir)
    # loss_fn placeholder: conversion never trains, it only needs save()
    trainer = Trainer(cfg, model, loss_fn=lambda *a, **k: (0.0, {}))
    trainer.save("converted")
    return trainer, report


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--model", required=True, help="model name (examples/train.py registry)")
    p.add_argument("--torch_ckpt", required=True, help="reference .t7/.pth state_dict file")
    p.add_argument("--exp_name", default=None)
    p.add_argument("--ckpt_dir", default="checkpoints")
    p.add_argument("--emb_dims", type=int, default=1024)
    p.add_argument("--nearest_neighbors", type=int, default=20)
    p.add_argument("--num_points", type=int, default=1024)
    a = p.parse_args()
    exp = a.exp_name or f"converted_{a.model}"
    _, report = convert(a.model, a.torch_ckpt, exp, a.ckpt_dir, a)
    print(f"converted {a.torch_ckpt} -> {a.ckpt_dir}/{exp} ({len(report.used)} tensors)")


if __name__ == "__main__":
    main()
