#!/usr/bin/env python
"""Unified evaluation CLI — covers the reference's 11 test_*.py scripts:
load a checkpoint, run the eval loop, print task metrics (accuracy /
rotation-translation errors / mask F1 / EPE)."""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from flax import nnx


def main():
    from examples.train import build_dataset, build_model

    p = argparse.ArgumentParser()
    p.add_argument("--model", default="pointnet")
    p.add_argument("--task", default="classification")
    p.add_argument("--ckpt", default="")
    p.add_argument("--ckpt_name", default="best")
    p.add_argument("--batch_size", type=int, default=32)
    p.add_argument("--num_points", type=int, default=1024)
    p.add_argument("--emb_dims", type=int, default=1024)
    p.add_argument("--nearest_neighbors", type=int, default=20)
    p.add_argument("--noise", action="store_true")
    p.add_argument("--seed", type=int, default=1234)
    args = p.parse_args()

    from learning3d_tpu.train import TrainConfig, Trainer

    cfg = TrainConfig(
        exp_name=args.ckpt or f"exp_{args.model}",
        task=args.task,
        batch_size=args.batch_size,
        num_points=args.num_points,
    )
    model = build_model(args.model, args, nnx.Rngs(args.seed))
    trainer = Trainer(cfg, model)
    if args.ckpt:
        trainer.load(args.ckpt_name)
    test_data = build_dataset(args, train=False)
    loss, aux = trainer.evaluate(test_data)
    print(f"test_loss={loss:.6f} " + " ".join(f"{k}={v:.4f}" for k, v in aux.items()))


if __name__ == "__main__":
    main()
