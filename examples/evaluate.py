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
    p.add_argument("--dataset_size", type=int, default=2048,
                   help="SyntheticModelNet40 item count — match the training run's")
    p.add_argument("--param_jitter", type=float, default=0.0,
                   help="synthetic per-item shape jitter — match the training run's")
    p.add_argument("--hard_cls", action="store_true",
                   help="hard synthetic classification benchmark — match the "
                   "training run's (see train.py --hard_cls)")
    p.add_argument("--detail_amp", type=float, default=0.04,
                   help="hard-mode corrugation amplitude — match the training run's")
    p.add_argument("--pcn_detailed", action="store_true",
                   help="PCN: build with the folding fine decoder — match the "
                   "training run's (see train.py --pcn_detailed)")
    p.add_argument("--cls_noise", type=float, default=None,
                   help="synthetic per-point noise sigma override — match the "
                   "training run's")
    p.add_argument(
        "--masknet_ckpt",
        default="",
        help="chain a trained MaskNet before registration: the template is "
        "filtered by the predicted inlier mask and mask P/R/F1 is reported "
        "(reference examples/test_masknet.py workflow)",
    )
    p.add_argument(
        "--num_iters",
        type=int,
        default=0,
        help="override the refinement iteration count of iterative "
        "registration models (prnet/rpmnet/ipcrnet) at eval time; the "
        "iterations share weights, so more eval iterations is a "
        "serving-time knob, no retraining (0 = model default)",
    )
    p.add_argument(
        "--multistart",
        type=int,
        default=0,
        help="serving-time multi-start registration: fold K coarse "
        "octahedral-group initial rotations into the batch and keep the "
        "start with the lowest symmetric chamfer per item "
        "(learning3d_tpu.serve.multistart_register). Escapes the "
        "wrong-pose chamfer attractors of iterative registration "
        "(tools/diagnose_ipcrnet_attractor.py) without retraining "
        "(0 = off; K in [1, 24])",
    )
    p.add_argument(
        "--use_bn",
        action="store_true",
        help="build the encoder with BatchNorm (required to load ipcrnet "
        "checkpoints trained with --transfer_ptnet, whose transferred "
        "classifier PointNet is use_bn=True)",
    )
    p.add_argument(
        "--quantize",
        action="store_true",
        help="also evaluate the int8 PTQ serving mode (learning3d_tpu/quant.py) "
        "of the loaded checkpoint and print the metric delta vs bf16 "
        "(supported: --task dcp, --task classification)",
    )
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
    if args.num_iters:
        # instance-default iteration attrs (plain ints, not checkpoint
        # state): PRNet carries num_iters, RPMNet/iPCRNet default_iterations
        for attr in ("num_iters", "default_iterations"):
            if hasattr(model, attr):
                setattr(model, attr, args.num_iters)
    test_data = build_dataset(args, train=False)
    loss, aux = trainer.evaluate(test_data)
    print(f"test_loss={loss:.6f} " + " ".join(f"{k}={v:.4f}" for k, v in aux.items()), flush=True)

    REGISTRATION_TASKS = ("dcp", "prnet", "ipcrnet", "pointnetlk", "rpmnet", "deepgmr")
    if args.task in REGISTRATION_TASKS:
        mask_model = None
        if args.masknet_ckpt:
            # MaskNet workflow (reference test_masknet.py): partial source,
            # gt masks in the batches, template filtered by predicted mask
            from learning3d_tpu.data import RegistrationData
            from learning3d_tpu.models import MaskNet, PointNet

            test_data = RegistrationData(
                algorithm="PointNetLK",
                data_class=test_data.data_class,
                partial_source=True,
                noise=args.noise,
                additional_params={"use_masknet": True},
            )
            # same config train.py's masknet task builds (build_model)
            mask_model = MaskNet(
                PointNet(emb_dims=1024, use_bn=True, rngs=nnx.Rngs(0)),
                rngs=nnx.Rngs(1),
            )
            mask_cfg = TrainConfig(
                exp_name=args.masknet_ckpt, task="masknet", ckpt_dir=args.ckpt_dir
            )
            Trainer(mask_cfg, mask_model).load(args.ckpt_name)
        summary = evaluate_registration(model, test_data, args, mask_model=mask_model)
        from learning3d_tpu.train.metrics import format_registration_summary

        print(format_registration_summary(summary), flush=True)
        if args.quantize and args.task == "dcp":
            # int8 PTQ serving-mode delta on the TRAINED checkpoint — the
            # accuracy-parity evidence bench.py's dcp headline cites.
            from learning3d_tpu.data.device_pipeline import batch_iterator
            from learning3d_tpu.quant import quantize_dcp

            calib = next(
                iter(batch_iterator(test_data, min(args.batch_size, 8), shuffle=False, seed=0))
            )
            qmodel = quantize_dcp(model, calib[0][..., :3], calib[1][..., :3])
            q_summary = evaluate_registration(qmodel, test_data, args, mask_model=mask_model)
            print("int8-ptq " + format_registration_summary(q_summary), flush=True)
            # the all-int8 attention-core variant (int8 PV): reported so
            # the recorded eval shows what the extra MXU speed costs
            qpv = quantize_dcp(model, calib[0][..., :3], calib[1][..., :3], int8_pv=True)
            pv_summary = evaluate_registration(qpv, test_data, args, mask_model=mask_model)
            print("int8-pv " + format_registration_summary(pv_summary), flush=True)
    elif args.quantize and args.task == "classification":
        evaluate_classification_quantized(model, test_data, args)


def evaluate_classification_quantized(model, test_data, args):
    """bf16-vs-int8 top-1 accuracy of the loaded Classifier(PointNet)
    checkpoint (the PTQ parity evidence for bench.py's headline;
    same recipe tests/test_quant.py pins on a freshly-trained model)."""
    import jax
    import numpy as np

    from learning3d_tpu.data.device_pipeline import batch_iterator
    from learning3d_tpu.quant import quantize_pointnet_classifier

    model.eval()
    first = next(iter(batch_iterator(test_data, args.batch_size, shuffle=False, seed=0)))
    qm = quantize_pointnet_classifier(model, first[0][: min(args.batch_size, 64)])
    graphdef, state = nnx.split(model)

    @jax.jit
    def logits_bf16(state, x):
        return nnx.merge(graphdef, state)(x)

    q_fwd = jax.jit(lambda qm, x: qm(x))
    n = hits = qhits = agree = 0
    for batch in batch_iterator(test_data, args.batch_size, shuffle=False, seed=0):
        x, y = batch[0], np.asarray(batch[1]).reshape(-1)
        p = np.asarray(logits_bf16(state, x)).argmax(-1)
        pq = np.asarray(q_fwd(qm, x)).argmax(-1)
        hits += (p == y).sum()
        qhits += (pq == y).sum()
        agree += (p == pq).sum()
        n += len(y)
    print(
        f"bf16_acc={hits / n:.4f} int8_acc={qhits / n:.4f} "
        f"top1_agreement={agree / n:.4f} (n={n})"
    )


def evaluate_registration(model, test_data, args, mask_model=None):
    """Whole-testset Rot_RMSE/Rot_MAE/Trans_RMSE/point-RMSE aggregation
    in the reference's units (examples/test_deepgmr.py:36-82 formulas,
    pretrained/exp_prnet/log names).

    The argument order is MODEL-declared (``forward_arg_order``; PRNet is
    "source_template", everything else "template_source") — no per-task
    special case. When ``mask_model`` is given (MaskNet workflow,
    reference examples/test_masknet.py:45-110) the template is filtered
    through the predicted inlier mask before registration, and mask
    precision/recall/F1 vs the dataset's gt masks join the summary."""
    import numpy as np

    from learning3d_tpu.data.device_pipeline import batch_iterator
    from learning3d_tpu.train.metrics import mask_scores, summarize_registration

    model.eval()
    graphdef, state = nnx.split(model)
    order = getattr(model, "forward_arg_order", "template_source")

    import jax

    if getattr(args, "multistart", 0):
        from learning3d_tpu.serve import multistart_register, rotation_starts

        rots = rotation_starts(args.multistart)

        @jax.jit
        def fwd(state, template, source):
            m = nnx.merge(graphdef, state)
            return multistart_register(m, template, source, rots)["est_T"]

    else:

        @jax.jit
        def fwd(state, template, source):
            m = nnx.merge(graphdef, state)
            out = m(source, template) if order == "source_template" else m(template, source)
            return out["est_T"]

    if mask_model is not None:
        mask_model.eval()
        mask_gd, mask_state = nnx.split(mask_model)

        @jax.jit
        def mask_fwd(mask_state, template, source):
            m = nnx.merge(mask_gd, mask_state)
            return m(template, source)  # (masked_template, mask)

    est_Ts, igts, templates = [], [], []
    mask_metrics = []
    for batch in batch_iterator(test_data, args.batch_size, shuffle=False, seed=0):
        template, source, igt = batch[0], batch[1], batch[2]
        gt_mask = batch[3] if len(batch) > 3 else None
        if mask_model is not None:
            masked_template, pred_mask = mask_fwd(mask_state, template, source)
            if gt_mask is not None:
                mask_metrics.append(
                    {k: float(v) for k, v in mask_scores(pred_mask, gt_mask).items()}
                )
            template = masked_template
        est_Ts.append(np.asarray(fwd(state, template, source)))
        igts.append(np.asarray(igt))
        templates.append(np.asarray(template)[..., :3])
    summary = summarize_registration(
        np.concatenate(est_Ts), np.concatenate(igts), np.concatenate(templates)
    )
    if mask_metrics:
        for k in mask_metrics[0]:
            summary[f"mask_{k}"] = float(np.mean([m[k] for m in mask_metrics]))
    return summary


if __name__ == "__main__":
    main()
