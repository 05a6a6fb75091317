"""Single config dataclass with CLI override — replaces the 11 duplicated
argparse blocks (reference examples/train_*.py:153-195)."""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field


@dataclass
class TrainConfig:
    # experiment
    exp_name: str = "exp"
    task: str = "classification"  # classification | registration | completion | masknet | flow | segmentation
    algorithm: str = ""  # registration transform sampler name, if task == registration
    seed: int = 1234

    # data
    batch_size: int = 32
    num_points: int = 1024
    noise: bool = False
    augment: bool = False  # on-device train-time augmentation (classification)

    # optimization
    optimizer: str = "adam"  # adam | sgd
    lr: float = 1e-3
    momentum: float = 0.9
    weight_decay: float = 0.0
    epochs: int = 200
    cosine_decay: bool = False
    accum_steps: int = 1  # gradient accumulation: microbatches per optimizer update
    remat: bool = False  # jax.checkpoint the forward: trade recompute for HBM
    label_smoothing: float = 0.0  # CurveNet/DGCNN cal_loss epsilon
    # masknet loss: "bce" or "mse" (reference train_masknet.py offers
    # both). Default bce: the mask head's sigmoid starts saturated at
    # ~1.0 on pooled PointNet features, and MSE's gradient vanishes
    # under saturation (the r4 run sat at loss=0.25, gnorm -> 0 within
    # 2 steps) while BCE's (sigmoid(z) - gt) does not.
    masknet_loss: str = "bce"
    grad_clip_norm: float = 0.0  # >0: clip grads to this global L2 norm
    # transform-magnitude curriculum for registration tasks: >0 ramps the
    # train loader's transform scale 0.2 -> 1.0 over this many epochs
    # (RegistrationData.set_difficulty). Chamfer-trained iterative
    # registration falls into a wide wrong-pose attractor when it starts
    # at full +-45deg/+-1.0 magnitudes (r5_ipcrnet.log: loss improved
    # while rot_deg climbed 42deg -> ~100deg); small early transforms
    # keep the gradient inside the gt basin. Eval difficulty stays 1.0.
    curriculum_epochs: int = 0
    # test-aux key that selects the "best" checkpoint ("loss" = test
    # loss). Chamfer ranks wrong-pose solutions above half-converged
    # ones on symmetric-ish shapes, so registration runs should select
    # on rot_deg — loss-selected "best" at r5_ipcrnet's end was the
    # 70deg attractor while epoch 6 sat at 42deg.
    best_metric: str = "loss"
    # failure detection: a non-finite gradient (exploding SVD/gumbel step)
    # zeroes the update instead of poisoning the params forever — the
    # run continues from finite weights (r3 PRNet NaN'd at epoch 22/70
    # without this; docs/runs/ has the post-guard convergence log)
    skip_nonfinite: bool = True

    # checkpointing
    ckpt_dir: str = "checkpoints"
    resume: str = ""
    save_every: int = 1

    # parallel
    mesh_shape: tuple | None = None  # e.g. (8, 1); None -> all-data mesh

    extras: dict = field(default_factory=dict)

    @classmethod
    def from_cli(cls, argv=None):
        import argparse

        parser = argparse.ArgumentParser("learning3d_tpu trainer")
        for f in dataclasses.fields(cls):
            if f.name in ("extras", "mesh_shape"):
                continue
            t = f.type if isinstance(f.type, type) else str
            if f.type in ("bool", bool):
                parser.add_argument(f"--{f.name}", action="store_true", default=f.default)
            else:
                typ = {"int": int, "float": float, "str": str}.get(str(f.type), str)
                parser.add_argument(f"--{f.name}", type=typ, default=f.default)
        args = parser.parse_args(argv)
        return cls(**vars(args))
