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
    p.add_argument("--ckpt_dir", default="checkpoints")
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
        ckpt_dir=args.ckpt_dir,
    )
    model = build_model(args.model, args, nnx.Rngs(args.seed))
    trainer = Trainer(cfg, model)
    if args.ckpt:
        trainer.load(args.ckpt_name)
    test_data = build_dataset(args, train=False)
    loss, aux = trainer.evaluate(test_data)
    print(f"test_loss={loss:.6f} " + " ".join(f"{k}={v:.4f}" for k, v in aux.items()))

    REGISTRATION_TASKS = ("dcp", "prnet", "ipcrnet", "pointnetlk", "rpmnet", "deepgmr")
    if args.task in REGISTRATION_TASKS:
        summary = evaluate_registration(model, test_data, args)
        from learning3d_tpu.train.metrics import format_registration_summary

        print(format_registration_summary(summary))


def evaluate_registration(model, test_data, args):
    """Whole-testset Rot_RMSE/Rot_MAE/Trans_RMSE/point-RMSE aggregation
    in the reference's units (examples/test_deepgmr.py:36-82 formulas,
    pretrained/exp_prnet/log names)."""
    import numpy as np

    from learning3d_tpu.data.device_pipeline import batch_iterator
    from learning3d_tpu.train.metrics import summarize_registration

    model.eval()
    graphdef, state = nnx.split(model)
    prnet_order = args.task == "prnet"  # PRNet estimates src->tgt with (src, tgt) args

    import jax

    @jax.jit
    def fwd(state, template, source):
        m = nnx.merge(graphdef, state)
        out = m(source, template) if prnet_order else m(template, source)
        return out["est_T"]

    est_Ts, igts, templates = [], [], []
    for batch in batch_iterator(test_data, args.batch_size, shuffle=False, seed=0):
        template, source, igt = batch[0], batch[1], batch[2]
        est_Ts.append(np.asarray(fwd(state, template, source)))
        igts.append(np.asarray(igt))
        templates.append(np.asarray(template)[..., :3])
    return summarize_registration(
        np.concatenate(est_Ts), np.concatenate(igts), np.concatenate(templates)
    )


if __name__ == "__main__":
    main()
