"""Evaluation metrics matching the reference's test scripts.

rotation_error (deg, arccos((tr-1)/2)) and translation error follow
examples/test_deepgmr.py:36-52; mask precision/recall/F1 follow
examples/test_masknet.py:45-77.
"""

from __future__ import annotations

import jax.numpy as jnp


def rotation_error_deg(R_pred, R_gt):
    """Geodesic rotation error in degrees, (B,).

    f32 + HIGHEST matmul precision: at the default TPU bf16 precision the
    trace picks up ~1e-3 error, which arccos amplifies into a ~1-degree
    floor — enough to mask sub-degree convergence in the trainer logs
    (round-3 DeepGMR logged 1.29 deg where the f64 host metric said 0.099).
    """
    import jax

    M = jnp.einsum(
        "bij,bkj->bik",
        R_pred.astype(jnp.float32),
        R_gt.astype(jnp.float32),
        precision=jax.lax.Precision.HIGHEST,
    )  # R_pred R_gt^T
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


def summarize_registration(est_T, igt, template=None, n_rmse_points=100):
    """Epoch-level registration summary in the reference's own metric
    names and units.

    Euler-angle Rot_MSE/Rot_RMSE/Rot_MAE/Rot_R2 and component-wise
    Trans_* follow the PRNet log format
    (/root/reference/pretrained/exp_prnet/log: "Rot_RMSE: 5.34 ...");
    geodesic ``rot_deg`` / ``trans`` and the point-RMSE under est-vs-gt
    transforms follow /root/reference/examples/test_deepgmr.py:36-52.

    Args:
      est_T: (B, 4, 4) estimated source->template transforms (stacked
        over the whole eval set).
      igt: (B, 4, 4) ground-truth template->source transforms.
      template: optional (B, N, 3) template clouds for the point-RMSE
        (first ``n_rmse_points`` points per cloud, like test_deepgmr).

    Returns a dict of python floats.
    """
    import numpy as np
    from scipy.spatial.transform import Rotation

    est_T = np.asarray(est_T, np.float64).reshape(-1, 4, 4)
    igt = np.asarray(igt, np.float64).reshape(-1, 4, 4)
    R_pred, t_pred = est_T[:, :3, :3], est_T[:, :3, 3]
    R_gt = np.transpose(igt[:, :3, :3], (0, 2, 1))
    t_gt = -np.einsum("bij,bj->bi", R_gt, igt[:, :3, 3])

    # Euler-angle metrics (zyx degrees — DCP/PRNet's npmat2euler convention)
    e_pred = Rotation.from_matrix(R_pred).as_euler("zyx", degrees=True)
    e_gt = Rotation.from_matrix(R_gt).as_euler("zyx", degrees=True)

    def _mse_rmse_mae_r2(pred, gt):
        err = pred - gt
        mse = float(np.mean(err**2))
        mae = float(np.mean(np.abs(err)))
        ss_res = float(np.sum(err**2))
        ss_tot = float(np.sum((gt - gt.mean(0)) ** 2))
        r2 = 1.0 - ss_res / ss_tot if ss_tot > 0 else 0.0
        return mse, float(np.sqrt(mse)), mae, r2

    rot_mse, rot_rmse, rot_mae, rot_r2 = _mse_rmse_mae_r2(e_pred, e_gt)
    tr_mse, tr_rmse, tr_mae, tr_r2 = _mse_rmse_mae_r2(t_pred, t_gt)

    # Geodesic rotation error + translation norm (test_deepgmr.py:36-47)
    tr = np.einsum("bii->b", np.einsum("bij,bkj->bik", R_pred, R_gt))
    geo = np.degrees(np.arccos(np.clip((tr - 1.0) / 2.0, -1.0, 1.0)))

    out = {
        "Rot_MSE": rot_mse,
        "Rot_RMSE": rot_rmse,
        "Rot_MAE": rot_mae,
        "Rot_R2": rot_r2,
        "Trans_MSE": tr_mse,
        "Trans_RMSE": tr_rmse,
        "Trans_MAE": tr_mae,
        "Trans_R2": tr_r2,
        "rot_deg": float(np.mean(geo)),
        "trans": float(np.mean(np.linalg.norm(t_pred - t_gt, axis=-1))),
    }
    if template is not None:
        pts = np.asarray(template, np.float64)[:, :n_rmse_points, :3]
        p_pred = np.einsum("bnj,bij->bni", pts, R_pred) + t_pred[:, None]
        p_gt = np.einsum("bnj,bij->bni", pts, R_gt) + t_gt[:, None]
        out["point_RMSE"] = float(
            np.mean(np.linalg.norm(p_pred - p_gt, axis=-1))
        )
    return out


def format_registration_summary(summary, stage="test"):
    """PRNet-log-style one-liner (pretrained/exp_prnet/log format)."""
    keys = [
        "Rot_MSE", "Rot_RMSE", "Rot_MAE", "Rot_R2",
        "Trans_MSE", "Trans_RMSE", "Trans_MAE", "Trans_R2",
    ]
    body = ", ".join(f"{k}: {summary[k]:.6f}" for k in keys if k in summary)
    extra_keys = ("rot_deg", "trans", "point_RMSE") + tuple(
        k for k in sorted(summary) if k.startswith("mask_")
    )
    extra = ", ".join(f"{k}: {summary[k]:.6f}" for k in extra_keys if k in summary)
    return f"Stage: {stage}, {body}" + (f", {extra}" if extra else "")


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
