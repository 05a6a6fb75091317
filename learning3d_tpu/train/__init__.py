"""Training harness — one generic Trainer replacing the reference's 11
copy-pasted train scripts (SURVEY.md §7 stage 8): config dataclass, optax
optimizers, jitted sharded train/eval steps, orbax checkpoint/resume with
best/latest split and feature-model export for transfer."""

from learning3d_tpu.train.config import TrainConfig  # noqa: F401
from learning3d_tpu.train.metrics import (  # noqa: F401
    mask_scores,
    registration_errors,
    rotation_error_deg,
    translation_error,
)
from learning3d_tpu.train.trainer import Trainer  # noqa: F401
