"""Sinkhorn normalization + (weighted) Kabsch rigid solvers.

Capability parity with RPMNet's helpers (reference models/rpmnet.py:157-254)
as standalone functional ops: fixed-trip-count log-domain Sinkhorn (a
lax.scan — the reference's eps early-exit is only used by handcrafted RPM
and defaults off) and batched weighted Kabsch with reflection resolution.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

_EPS = 1e-5


def _sinkhorn_slack_xla(log_alpha, n_iters):
    padded = jnp.pad(log_alpha, ((0, 0), (0, 1), (0, 1)))

    def step(la, _):
        # Row normalization over all K+1 columns, slack row untouched.
        rows = la[:, :-1, :] - jax.scipy.special.logsumexp(la[:, :-1, :], axis=2, keepdims=True)
        la = jnp.concatenate([rows, la[:, -1:, :]], axis=1)
        cols = la[:, :, :-1] - jax.scipy.special.logsumexp(la[:, :, :-1], axis=1, keepdims=True)
        la = jnp.concatenate([cols, la[:, :, -1:]], axis=2)
        return la, None

    padded, _ = jax.lax.scan(step, padded, None, length=n_iters)
    return padded[:, :-1, :-1]


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def _sinkhorn_slack_fast(log_alpha, n_iters):
    """Pallas forward (matrix resident in VMEM across all iterations),
    XLA-recompute backward — the flash-attention-style remat pattern, so
    training pays the old forward cost once in the backward while eval
    gets the full kernel speedup."""
    from learning3d_tpu.kernels.sinkhorn import sinkhorn_log_pallas

    return sinkhorn_log_pallas(log_alpha, n_iters=n_iters)


def _sinkhorn_fast_fwd(log_alpha, n_iters):
    return _sinkhorn_slack_fast(log_alpha, n_iters), log_alpha


def _sinkhorn_fast_bwd(n_iters, log_alpha, g):
    _, vjp = jax.vjp(lambda a: _sinkhorn_slack_xla(a, n_iters), log_alpha)
    return vjp(g)


_sinkhorn_slack_fast.defvjp(_sinkhorn_fast_fwd, _sinkhorn_fast_bwd)


def sinkhorn_log(log_alpha, n_iters: int = 5, slack: bool = True):
    """Log-domain Sinkhorn -> log of a near-doubly-stochastic matrix.

    With ``slack`` a zero-initialized extra row/column absorbs unmatched
    mass and is excluded from its own normalization (RPMNet semantics,
    rpmnet.py:175-203).
    """
    if not slack:
        def step(la, _):
            la = la - jax.scipy.special.logsumexp(la, axis=2, keepdims=True)
            la = la - jax.scipy.special.logsumexp(la, axis=1, keepdims=True)
            return la, None

        out, _ = jax.lax.scan(step, log_alpha, None, length=n_iters)
        return out

    B, J, K = log_alpha.shape
    if (
        jax.default_backend() == "tpu"
        and (J + 1) * (K + 1) * 4 <= 5 * 2**20  # one item's matrix in VMEM
    ):
        return _sinkhorn_slack_fast(log_alpha, n_iters)
    return _sinkhorn_slack_xla(log_alpha, n_iters)


def weighted_kabsch(a, b, weights):
    """Rigid transform (B, 3, 4) mapping a -> b with per-row weights.

    a (B, M, 3), b (B, M, 3) row-paired, weights (B, M) >= 0
    (reference compute_rigid_transform, rpmnet.py:221-254). The reference's
    ``assert det > 0`` is guaranteed by construction here (both candidate
    signs are computed and the proper one selected).
    """
    from learning3d_tpu.utils.svd3 import kabsch_rotation_3x3

    w = weights[..., None] / (jnp.sum(weights[..., None], axis=1, keepdims=True) + _EPS)
    centroid_a = jnp.sum(a * w, axis=1)
    centroid_b = jnp.sum(b * w, axis=1)
    a_c = a - centroid_a[:, None, :]
    b_c = b - centroid_b[:, None, :]
    cov = jnp.einsum("bmc,bmd->bcd", a_c, b_c * w).astype(jnp.float32)
    rot = kabsch_rotation_3x3(cov)  # proper rotation, reflections resolved
    t = centroid_b - jnp.einsum("bij,bj->bi", rot, centroid_a)
    return jnp.concatenate([rot, t[..., None]], axis=-1)


def kabsch(a, b):
    """Unweighted rigid a -> b (row-paired)."""
    w = jnp.ones(a.shape[:2], dtype=a.dtype)
    return weighted_kabsch(a, b, w)


def se3_transform_34(T, points):
    """Apply a (B, 3, 4) transform to (B, N, 3) points."""
    return jnp.einsum("bij,bnj->bni", T[:, :, :3], points) + T[:, None, :, 3]


def concat_se3_34(T_new, T_old):
    """Compose (B, 3, 4) transforms: result = T_new ∘ T_old."""
    R = T_new[:, :, :3] @ T_old[:, :, :3]
    t = jnp.einsum("bij,bj->bi", T_new[:, :, :3], T_old[:, :, 3]) + T_new[:, :, 3]
    return jnp.concatenate([R, t[..., None]], axis=-1)
