"""Per-task loss functions, matching the reference train scripts exactly
(see each docstring for the file:line source). Every loss_fn has the
signature ``loss_fn(model, batch, key) -> (loss, aux_dict)`` so the
generic Trainer can jit them uniformly.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from learning3d_tpu.losses import losses
from learning3d_tpu.train.metrics import registration_errors


def classification(model, batch, key, smoothing: float = 0.0):
    """NLL on log-softmax logits + accuracy
    (reference examples/train_pointnet.py:91-107). ``smoothing`` enables
    the label-smoothed cross entropy the original CurveNet/DGCNN recipe
    trains with (cal_loss, eps=0.2 — visible in the reference's
    pretrained/exp_curvenet/run.log: loss 2.55 at 52% train acc)."""
    points, labels = batch
    logits = model(points)
    logp = jax.nn.log_softmax(logits, axis=-1)
    if smoothing:
        n = logits.shape[-1]
        one_hot = jax.nn.one_hot(labels, n, dtype=logp.dtype)
        one_hot = one_hot * (1.0 - smoothing) + (1.0 - one_hot) * smoothing / (n - 1)
        loss = -jnp.mean(jnp.sum(one_hot * logp, axis=-1))
    else:
        loss = losses.classification_loss(logp, labels)
    acc = jnp.mean((jnp.argmax(logits, -1) == labels).astype(jnp.float32))
    return loss, {"accuracy": acc}


def pointnetlk(model, batch, key):
    """FrobeniusNorm(est_T, igt) + RMSEFeatures(r)
    (reference examples/train_PointNetLK.py:86, train_rpmnet.py:85)."""
    template, source, igt = batch
    out = model(template, source)
    loss = losses.frobenius_norm_loss(out["est_T"], igt) + losses.rmse_features_loss(
        out["r"]
    )
    return loss, registration_errors(out["est_T"], igt)


def rpmnet(model, batch, key):
    """Same loss as PointNetLK (reference train_rpmnet.py:85). The
    iteration count is attr-driven (model.default_iterations, recipe
    default 2 — a deliberate deviation from the reference forward's
    1-iteration default, see models/rpmnet.py; RPMNet's forward cuts
    gradients between iterations so every iteration trains), so
    evaluate.py --num_iters applies to the loss path too."""
    template, source, igt = batch
    out = model(template, source)
    loss = losses.frobenius_norm_loss(out["est_T"], igt) + losses.rmse_features_loss(
        out["r"]
    )
    return loss, registration_errors(out["est_T"], igt)


def ipcrnet(model, batch, key):
    """Chamfer(template, transformed_source)
    (reference examples/train_pcrnet.py)."""
    template, source, igt = batch
    out = model(template, source)
    loss = losses.chamfer_distance_loss(template[..., :3], out["transformed_source"])
    return loss, registration_errors(out["est_T"], igt)


def dcp(model, batch, key):
    """MSE(est_R^T R_ab, I) + MSE(est_t, t_ab) + 0.1 * cycle
    (reference examples/train_dcp.py:68-73)."""
    template, source, igt = batch
    out = model(template, source)
    eye = jnp.eye(3, dtype=igt.dtype)
    # ab: source -> template = igt^{-1}
    R_ab = jnp.swapaxes(igt[:, :3, :3], -1, -2)
    t_ab = -jnp.einsum("bij,bj->bi", R_ab, igt[:, :3, 3])
    R_ba = igt[:, :3, :3]
    t_ba = igt[:, :3, 3]
    loss = jnp.mean(
        (jnp.einsum("bji,bjk->bik", out["est_R"], R_ab) - eye) ** 2
    ) + jnp.mean((out["est_t"] - t_ab) ** 2)
    cycle = jnp.mean(
        (jnp.einsum("bji,bjk->bik", out["est_R_"], R_ba) - eye) ** 2
    ) + jnp.mean((out["est_t_"] - t_ba) ** 2)
    loss = loss + 0.1 * cycle
    return loss, registration_errors(out["est_T"], igt)


def prnet(model, batch, key):
    """PRNet computes its own discounted internal loss in forward
    (reference models/prnet.py:349-375)."""
    template, source, igt = batch
    out = model(source, template, igt=jnp.linalg.inv(igt))
    return out["loss"], registration_errors(out["est_T"], igt)


def deepgmr(model, batch, key):
    """MSE(est_T_inverse @ igt^{-1}, I) + MSE(est_T @ igt, I)
    (reference examples/train_deepgmr.py:66-68)."""
    template, source, igt = batch
    out = model(template, source)
    eye = jnp.eye(4, dtype=igt.dtype)
    mse1 = jnp.mean((out["est_T_inverse"] @ jnp.linalg.inv(igt) - eye) ** 2)
    mse2 = jnp.mean((out["est_T"] @ igt - eye) ** 2)
    return mse1 + mse2, registration_errors(out["est_T"], igt)


def pcn(model, batch, key):
    """Chamfer(points, coarse_output) (reference examples/train_pcn.py:58);
    with the folding decoder on (PCN(detailed_output=True), the PCN
    paper's full model) the fine stage's chamfer joins the loss so the
    decoder actually trains — the coarse-only recipe is unchanged when
    the decoder is absent.

    Aux carries the per-stage chamfer the reference's test script reports
    (test_pcn.py:25-60): coarse always, fine when the folding decoder is
    on — so evaluate.py --task pcn prints real completion metrics."""
    (points,) = batch if isinstance(batch, tuple) and len(batch) == 1 else (batch[0],)
    out = model(points)
    coarse = losses.chamfer_distance_loss(points, out["coarse_output"])
    loss = coarse
    aux = {"chamfer_coarse": coarse}
    if "fine_output" in out:
        fine = losses.chamfer_distance_loss(points, out["fine_output"])
        aux["chamfer_fine"] = fine
        loss = coarse + fine
    return loss, aux


def masknet(model, batch, key, loss_fn="mse"):
    """MSE or BCE between predicted and gt inlier masks
    (reference examples/train_masknet.py:62-65); aux carries the
    accuracy/precision/recall/F1 the reference's test script reports
    (test_masknet.py:45-77)."""
    from learning3d_tpu.models import MaskNet2
    from learning3d_tpu.train.metrics import mask_scores

    template, source, igt, gt_mask = batch
    out = model(template, source)
    # gt_mask marks which TEMPLATE points survive in the partial source
    # (data/dataloaders.py::farthest_subsample_points). MaskNet returns
    # (masked_template, template_mask); MaskNet2 returns
    # (template_mask, source_mask) — select the template mask either way.
    mask = out[0] if isinstance(model, MaskNet2) else out[1]
    if loss_fn == "bce":
        eps = 1e-7
        m = jnp.clip(mask, eps, 1 - eps)
        loss = -jnp.mean(gt_mask * jnp.log(m) + (1 - gt_mask) * jnp.log(1 - m))
    else:
        loss = jnp.mean((mask - gt_mask) ** 2)
    return loss, mask_scores(mask, gt_mask)


def flownet(model, batch, key):
    """Masked EPE-style MSE/2 (reference examples/train_flownet.py:94).

    Aux adds the standard FlowNet3D benchmark metrics the reference
    doesn't compute: EPE3D plus Acc3D-strict (<0.05 m or <5% rel) and
    Acc3D-relaxed (<0.10 m or <10% rel)."""
    pos1, pos2, color1, color2, flow, mask1 = batch
    pred = model(pos1, pos2, color1, color2)
    loss = jnp.mean(mask1 * jnp.sum((pred - flow) ** 2, -1) / 2.0)
    err = jnp.linalg.norm(pred - flow, axis=-1)
    mag = jnp.linalg.norm(flow, axis=-1)
    acc_s = jnp.mean(((err < 0.05) | (err / (mag + 1e-12) < 0.05)).astype(jnp.float32))
    acc_r = jnp.mean(((err < 0.10) | (err / (mag + 1e-12) < 0.10)).astype(jnp.float32))
    return loss, {"epe": jnp.mean(err), "acc3d_strict": acc_s, "acc3d_relax": acc_r}


def segmentation(model, batch, key):
    """Per-point NLL."""
    points, labels = batch
    logits = model(points)  # (B, N, C)
    logp = jax.nn.log_softmax(logits, -1)
    picked = jnp.take_along_axis(logp, labels[..., None], axis=-1)[..., 0]
    loss = -jnp.mean(picked)
    acc = jnp.mean((jnp.argmax(logits, -1) == labels).astype(jnp.float32))
    return loss, {"accuracy": acc}


TASKS = {
    "classification": classification,
    "pointnetlk": pointnetlk,
    "rpmnet": rpmnet,
    "ipcrnet": ipcrnet,
    "dcp": dcp,
    "prnet": prnet,
    "deepgmr": deepgmr,
    "pcn": pcn,
    "masknet": masknet,
    "flow": flownet,
    "segmentation": segmentation,
}
