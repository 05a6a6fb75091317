"""Loss functions. Reductions match the reference implementations exactly
(see each docstring); all are pure functions of arrays -> scalar."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from learning3d_tpu.kernels.chamfer import chamfer_distance
from learning3d_tpu.kernels.emd import emd_loss


def chamfer_distance_loss(template, source):
    """(mean sqrt d1 + mean sqrt d2) / 2 — reference
    losses/chamfer_distance.py:36-46 (both the CUDA and fallback paths
    reduce this way)."""
    d1, d2 = chamfer_distance(template, source)
    c1 = jnp.mean(jnp.sqrt(jnp.maximum(d1, 1e-12)))
    c2 = jnp.mean(jnp.sqrt(jnp.maximum(d2, 1e-12)))
    return 0.5 * (c1 + c2)


def emd_loss_mean(template, source):
    """mean(emd cost) / num_points — reference losses/emd.py:5-10 (that file
    has a broken self-reference upstream; this is the intended math)."""
    return jnp.mean(emd_loss(template, source)) / template.shape[1]


def frobenius_norm_loss(predicted, igt):
    """mean_B ||predicted @ igt - I||_F^2 — the reference's
    mse(pred @ igt, I) * 16 (losses/frobenius_norm.py:5-14)."""
    err = predicted @ igt
    eye = jnp.eye(4, dtype=err.dtype)
    return jnp.mean(jnp.sum((err - eye) ** 2, axis=(-2, -1)))


def rmse_features_loss(feature_difference):
    """Sum (not mean) of squared residuals — reference
    losses/rmse_features.py:5-8 uses size_average=False."""
    return jnp.sum(feature_difference**2)


def classification_loss(log_probs, labels):
    """NLL over log-probabilities (reference losses/classification.py:5-6:
    F.nll_loss on log_softmax outputs)."""
    B = log_probs.shape[0]
    picked = jnp.take_along_axis(log_probs, labels[:, None], axis=-1)[:, 0]
    return -jnp.mean(picked)


def correspondence_loss(corr_mat_pred, corr_mat_gt):
    """Cross-entropy between predicted correspondence logits (B, Ns, Nt)
    and argmax of the ground-truth correspondence (B, Nt, Ns)
    (reference losses/correspondence_loss.py:3-9)."""
    B, Ns, Nt = corr_mat_pred.shape
    logits = corr_mat_pred.reshape(B * Ns, Nt)
    target = jnp.argmax(jnp.swapaxes(corr_mat_gt, -1, -2).reshape(B * Ns, Nt), axis=-1)
    logp = jax.nn.log_softmax(logits, axis=-1)
    return -jnp.mean(jnp.take_along_axis(logp, target[:, None], axis=-1))
