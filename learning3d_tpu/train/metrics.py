"""Evaluation metrics matching the reference's test scripts.

rotation_error (deg, arccos((tr-1)/2)) and translation error follow
examples/test_deepgmr.py:36-52; mask precision/recall/F1 follow
examples/test_masknet.py:45-77.
"""

from __future__ import annotations

import jax.numpy as jnp


def rotation_error_deg(R_pred, R_gt):
    """Geodesic rotation error in degrees, (B,)."""
    M = jnp.einsum("bij,bkj->bik", R_pred, R_gt)  # R_pred R_gt^T
    tr = jnp.trace(M, axis1=-2, axis2=-1)
    cos = jnp.clip((tr - 1.0) / 2.0, -1.0, 1.0)
    return jnp.degrees(jnp.arccos(cos))


def translation_error(t_pred, t_gt):
    return jnp.linalg.norm(t_pred - t_gt, axis=-1)


def registration_errors(est_T, igt):
    """est_T maps source -> template; igt maps template -> source
    (so ground truth for est is igt^{-1}). Returns dict of (B,) arrays:
    rot_deg, trans, plus the MSE-style summaries the reference logs."""
    R_gt = jnp.swapaxes(igt[..., :3, :3], -1, -2)
    t_gt = -jnp.einsum("bij,bj->bi", R_gt, igt[..., :3, 3])
    rot = rotation_error_deg(est_T[..., :3, :3], R_gt)
    trans = translation_error(est_T[..., :3, 3], t_gt)
    return {"rot_deg": rot, "trans": trans}


def point_rmse(transformed_source, template):
    """Per-item RMSE between aligned clouds (row-paired)."""
    return jnp.sqrt(jnp.mean(jnp.sum((transformed_source - template) ** 2, -1), -1))


def mask_scores(pred_mask, gt_mask, threshold=0.5):
    """accuracy / precision / recall / F1 over binarized masks
    (reference test_masknet.py:45-77)."""
    p = (pred_mask > threshold).astype(jnp.float32)
    g = (gt_mask > 0.5).astype(jnp.float32)
    tp = jnp.sum(p * g)
    fp = jnp.sum(p * (1 - g))
    fn = jnp.sum((1 - p) * g)
    tn = jnp.sum((1 - p) * (1 - g))
    acc = (tp + tn) / jnp.maximum(tp + tn + fp + fn, 1.0)
    prec = tp / jnp.maximum(tp + fp, 1.0)
    rec = tp / jnp.maximum(tp + fn, 1.0)
    f1 = 2 * prec * rec / jnp.maximum(prec + rec, 1e-12)
    return {"accuracy": acc, "precision": prec, "recall": rec, "f1": f1}
