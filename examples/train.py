#!/usr/bin/env python
"""Unified train CLI — covers the reference's 11 train_*.py scripts.

Usage:
    python examples/train.py --model pointnet --task classification
    python examples/train.py --model dcp --task dcp
    python examples/train.py --model pointnetlk --task pointnetlk \
        --transfer_ptnet path/to/feature_model

Dataset: real ModelNet40 if downloadable / present under
$LEARNING3D_DATA, otherwise the synthetic procedural stand-in (zero-egress
environments).
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from flax import nnx


def build_model(name, args, rngs):
    from learning3d_tpu import models

    if name == "pointnet":
        pn = models.PointNet(emb_dims=args.emb_dims, use_bn=True, rngs=rngs)
        return models.Classifier(pn, num_classes=40, rngs=rngs)
    if name == "pointconv":
        return models.PointConvDensityClsSsg(classifier=True, rngs=rngs)
    if name == "curvenet":
        return models.CurveNet(rngs=rngs)
    if name == "dgcnn-cls":
        return models.Classifier(models.DGCNN(emb_dims=args.emb_dims, rngs=rngs), rngs=rngs)
    if name == "segmentation":
        pn = models.PointNet(emb_dims=args.emb_dims, use_bn=True, global_feat=False, rngs=rngs)
        return models.Segmentation(pn, rngs=rngs)
    if name == "dcp":
        return models.DCP(models.DGCNN(emb_dims=512, rngs=rngs), rngs=rngs)
    if name == "prnet":
        return models.PRNet(rngs=rngs)
    if name == "ipcrnet":
        # --transfer_ptnet initializes the encoder from the classifier's
        # exported feature_model (use_bn=True to match its structure) —
        # the same warm start that took PointNetLK from ~30 deg to 0.73
        # (docs/runs/r4_pnlk_eval.log); cold starts keep the reference
        # default (train_pcrnet.py:206, use_bn=False).
        use_bn = bool(
            getattr(args, "transfer_ptnet", "") or getattr(args, "use_bn", False)
        )
        return models.iPCRNet(
            models.PointNet(emb_dims=1024, use_bn=use_bn, rngs=rngs), rngs=rngs
        )
    if name == "pointnetlk":
        return models.PointNetLK(models.PointNet(emb_dims=1024, use_bn=True, rngs=rngs))
    if name == "rpmnet":
        return models.RPMNet(rngs=rngs)
    if name == "deepgmr":
        return models.DeepGMR(use_rri=True, nearest_neighbors=args.nearest_neighbors, rngs=rngs)
    if name == "masknet":
        return models.MaskNet(models.PointNet(emb_dims=1024, use_bn=True, rngs=rngs), rngs=rngs)
    if name == "masknet2":
        return models.MaskNet2(rngs=rngs)
    if name == "pcn":
        # --pcn_detailed adds the folding fine decoder (the PCN paper's
        # full model; the reference default trains coarse-only,
        # examples/train_pcn.py:58) — the pcn task then trains and
        # reports both stages' chamfer.
        return models.PCN(
            emb_dims=1024,
            detailed_output=getattr(args, "pcn_detailed", False),
            rngs=rngs,
        )
    if name == "flownet":
        return models.FlowNet3D(rngs=rngs)
    raise ValueError(
        f"unknown model {name!r}; choose from: pointnet, pointconv, curvenet, "
        "dgcnn-cls, segmentation, dcp, prnet, ipcrnet, pointnetlk, rpmnet, "
        "deepgmr, masknet, masknet2, pcn, flownet"
    )


def build_dataset(args, train):
    from learning3d_tpu.data import (
        ClassificationData,
        ModelNet40Data,
        RegistrationData,
        SceneflowDataset,
        SyntheticModelNet40,
    )

    use_normals = args.task == "rpmnet"
    try:
        base = ModelNet40Data(
            train=train, num_points=args.num_points, use_normals=use_normals
        )
    except Exception as e:
        print(f"[data] ModelNet40 unavailable ({e}); using SyntheticModelNet40")
        base = SyntheticModelNet40(
            train=train,
            num_points=args.num_points,
            size=getattr(args, "dataset_size", 2048),
            param_jitter=getattr(args, "param_jitter", 0.0),
            use_normals=use_normals,
            hard=getattr(args, "hard_cls", False),
            detail_amp=getattr(args, "detail_amp", 0.04),
            noise=getattr(args, "cls_noise", None),
        )

    if args.task == "segmentation":
        from learning3d_tpu.data import SegmentationData, SyntheticPartSegmentation

        return SegmentationData(
            SyntheticPartSegmentation(train=train, num_points=args.num_points)
        )
    if args.task in ("classification", "pcn"):
        return ClassificationData(base)
    if args.task == "flow":
        ds = SceneflowDataset(npoints=args.num_points, partition="train" if train else "test")
        if len(ds) == 0:
            from learning3d_tpu.data import SyntheticSceneflow

            print("[data] Sceneflow npz unavailable; using SyntheticSceneflow")
            ds = SyntheticSceneflow(npoints=args.num_points)
        return ds
    algo = {
        "dcp": "DCP", "prnet": "PRNet", "ipcrnet": "iPCRNet",
        "pointnetlk": "PointNetLK", "rpmnet": "RPMNet", "deepgmr": "DeepGMR",
        "masknet": "DCP",
    }[args.task]
    extra = {}
    # deepgmr: RRI features are computed ON DEVICE inside the jitted step
    # (models/deepgmr.py) — do NOT precompute them per item on the host
    # (a device round trip per cloud on tunneled attachments). The host
    # path (RegistrationData additional_params nearest_neighbors>0) stays
    # for reference-contract parity.
    if args.task == "masknet":
        # reference train_masknet.py:157: partial SOURCE; the gt mask marks
        # which template-ordered points survive in the partial source
        extra["use_masknet"] = True
        return RegistrationData(
            algorithm=algo, data_class=base, partial_source=True,
            noise=args.noise, additional_params=extra,
        )
    return RegistrationData(
        algorithm=algo, data_class=base,
        partial_source=args.task == "prnet", noise=args.noise, additional_params=extra,
    )


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--model", default="pointnet")
    p.add_argument("--task", default="classification")
    p.add_argument("--pcn_detailed", action="store_true",
                   help="PCN: add the folding fine decoder (trains and "
                   "reports coarse+fine chamfer)")
    p.add_argument("--exp_name", default=None)
    p.add_argument("--batch_size", type=int, default=32)
    p.add_argument("--num_points", type=int, default=1024)
    p.add_argument("--emb_dims", type=int, default=1024)
    p.add_argument("--epochs", type=int, default=200)
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--optimizer", default="adam")
    p.add_argument("--cosine", action="store_true", help="cosine lr decay (the reference's CurveNet recipe)")
    p.add_argument("--momentum", type=float, default=0.9)
    p.add_argument("--noise", action="store_true")
    p.add_argument("--augment", action="store_true",
                   help="on-device rotate/scale/jitter augmentation (classification)")
    p.add_argument("--label_smoothing", type=float, default=0.0)
    p.add_argument("--weight_decay", type=float, default=0.0)
    p.add_argument("--masknet_loss", default="bce", choices=["bce", "mse"],
                   help="masknet training loss (reference train_masknet.py "
                   "offers both; bce survives the saturated-sigmoid init)")
    p.add_argument("--grad_clip", type=float, default=0.0,
                   help="global-norm gradient clipping (0 = off); non-finite "
                   "steps are always skipped (TrainConfig.skip_nonfinite)")
    p.add_argument("--curriculum", type=int, default=0,
                   help="registration transform-magnitude curriculum: ramp "
                   "the train loader's transform scale 0.2 -> 1.0 over this "
                   "many epochs (0 = off; eval difficulty is always 1.0)")
    p.add_argument("--best_metric", default="loss",
                   help="test-aux key for best-checkpoint selection (e.g. "
                   "rot_deg for registration; default: test loss)")
    p.add_argument("--nearest_neighbors", type=int, default=20)
    p.add_argument("--seed", type=int, default=1234)
    p.add_argument("--resume", default="")
    p.add_argument("--ckpt_dir", default="checkpoints")
    p.add_argument("--dataset_size", type=int, default=2048,
                   help="SyntheticModelNet40 item count (synthetic fallback only)")
    p.add_argument("--param_jitter", type=float, default=0.0,
                   help="per-item relative shape-parameter jitter of the "
                   "synthetic set (intra-class diversity for heavy classifiers)")
    p.add_argument("--hard_cls", action="store_true",
                   help="hard synthetic classification benchmark: classes "
                   "aliased into groups sharing all global shape statistics, "
                   "separated only by label-keyed local corrugations near the "
                   "noise floor (discriminates local-geometry models from "
                   "global max-pool ones instead of saturating)")
    p.add_argument("--detail_amp", type=float, default=0.04,
                   help="hard-mode corrugation amplitude")
    p.add_argument("--cls_noise", type=float, default=None,
                   help="synthetic per-point noise sigma override")
    p.add_argument("--transfer_ptnet", default="",
                   help="exp_name whose exported feature_model initializes this "
                   "model's encoder (the reference's PointNetLK workflow: "
                   "train_pointnetlk.py --transfer_ptnet, pretrained/exp_pnlk)")
    p.add_argument("--export_feature", action="store_true",
                   help="after training, export just the feature_model for "
                   "transfer (reference train_pointnet.py ptnet export)")
    args = p.parse_args()

    from learning3d_tpu.train import TrainConfig, Trainer

    cfg = TrainConfig(
        exp_name=args.exp_name or f"exp_{args.model}",
        task=args.task,
        batch_size=args.batch_size,
        num_points=args.num_points,
        epochs=args.epochs,
        lr=args.lr,
        optimizer=args.optimizer,
        cosine_decay=args.cosine,
        momentum=args.momentum,
        seed=args.seed,
        resume=args.resume,
        ckpt_dir=args.ckpt_dir,
        noise=args.noise,
        augment=args.augment,
        label_smoothing=args.label_smoothing,
        weight_decay=args.weight_decay,
        grad_clip_norm=args.grad_clip,
        masknet_loss=args.masknet_loss,
        curriculum_epochs=args.curriculum,
        best_metric=args.best_metric,
    )
    model = build_model(args.model, args, nnx.Rngs(args.seed))
    if args.transfer_ptnet:
        # Initialize the encoder from an exported feature_model checkpoint
        # (Trainer.export_feature_model): the reference's signature
        # PointNetLK recipe trains the classifier first and transfers its
        # PointNet (pretrained/exp_pnlk/run.log:1 --transfer_ptnet).
        import jax
        import orbax.checkpoint as ocp
        from pathlib import Path as _P

        sub = model.feature_model
        path = _P(args.ckpt_dir).resolve() / args.transfer_ptnet / "feature_model" / "model"
        with ocp.StandardCheckpointer() as ck:
            abstract = jax.tree.map(
                lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), nnx.state(sub)
            )
            nnx.update(sub, ck.restore(path, abstract))
        print(f"[transfer] feature_model initialized from {path}")
    trainer = Trainer(cfg, model)
    train_data = build_dataset(args, train=True)
    test_data = build_dataset(args, train=False)
    trainer.fit(train_data, test_data)
    if args.export_feature:
        try:  # export the BEST snapshot's encoder, not the last epoch's
            trainer.load("best")
        except Exception:
            pass
        trainer.export_feature_model()
        print(f"[transfer] exported feature_model under {cfg.exp_name}/feature_model")


if __name__ == "__main__":
    main()
