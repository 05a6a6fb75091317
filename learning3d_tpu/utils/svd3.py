"""Fast batched 3x3 special-orthogonal Procrustes (Kabsch) solver.

``jnp.linalg.svd`` on TPU lowers to the general QDWH algorithm — a large,
slow-to-compile HLO program that dominates registration-head latency. For
the 3x3 covariances every registration model produces, this module solves
the constrained Procrustes problem directly:

1. eigendecompose A = H^T H with a fixed-sweep cyclic Jacobi (12 Givens
   rotations, branch-free, vmappable);
2. build proper right/left singular bases with cross-product third
   columns (V and U both det +1 by construction);
3. R = V U^T is then exactly the V diag(1,1,det) U^T Kabsch optimum —
   reflections handled without any sign branch.

All steps are plain jnp on (B, 3, 3) stacks: everything fuses, nothing
falls back to QDWH, gradients flow (smooth a.e.).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_JACOBI_SWEEPS = 6


def _jacobi_rotation(A, V, p, q):
    """One (p, q) Givens rotation annihilating A[p, q], batched (..., 3, 3)."""
    apq = A[..., p, q]
    app = A[..., p, p]
    aqq = A[..., q, q]
    # rotation angle: theta = 0.5 * atan2(2 apq, aqq - app) zeroes A[p,q].
    # Gradient guard: d(atan2)(y, x) ~ 1/(x^2 + y^2) is NaN at (0, 0), and
    # a degenerate pair (equal diagonal, zero off-diagonal — e.g. the ~0
    # covariance of a collapsed soft-correspondence) sits exactly there.
    # There the rotation is an arbitrary no-op, so pin (y, x) to (0, 1):
    # same theta (0), finite (zero) gradient. This froze RPMNet training
    # (NaN grads -> every step skipped) before the guard.
    y = 2.0 * apq
    x = aqq - app
    degen = (y * y + x * x) < 1e-18
    y = jnp.where(degen, jnp.zeros_like(y), y)
    x = jnp.where(degen, jnp.ones_like(x), x)
    theta = 0.5 * jnp.arctan2(y, x)
    c = jnp.cos(theta)
    s = jnp.sin(theta)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=A.dtype), A.shape)
    G = eye
    G = G.at[..., p, p].set(c)
    G = G.at[..., q, q].set(c)
    G = G.at[..., p, q].set(s)
    G = G.at[..., q, p].set(-s)
    # full-f32 3x3 products: TPU's default bf16 matmul rounding costs ~1e-3
    # orthonormality error per sweep, which is visible in det(R)
    hi = jax.lax.Precision.HIGHEST
    A = jnp.matmul(jnp.matmul(jnp.swapaxes(G, -1, -2), A, precision=hi), G, precision=hi)
    V = jnp.matmul(V, G, precision=hi)
    return A, V


def eigh3x3(A, sweeps=_JACOBI_SWEEPS):
    """Symmetric (..., 3, 3) -> (eigenvalues descending (..., 3),
    eigenvectors as columns (..., 3, 3)), fixed-trip Jacobi."""
    V = jnp.broadcast_to(jnp.eye(3, dtype=A.dtype), A.shape)
    for _ in range(sweeps):
        for p, q in ((0, 1), (0, 2), (1, 2)):
            A, V = _jacobi_rotation(A, V, p, q)
    lam = jnp.stack([A[..., 0, 0], A[..., 1, 1], A[..., 2, 2]], axis=-1)
    order = jnp.argsort(-lam, axis=-1)
    lam = jnp.take_along_axis(lam, order, axis=-1)
    V = jnp.take_along_axis(V, order[..., None, :], axis=-1)
    return lam, V


def _normalize(v, eps=1e-12):
    # rsqrt(|v|^2 + eps^2) instead of 1/max(|v|, eps): identical for
    # |v| >> eps, but the norm's backward (v/|v|) is NaN at v = 0 while
    # this form's gradient is finite (zero) there.
    n2 = jnp.sum(v * v, axis=-1, keepdims=True)
    return v * jax.lax.rsqrt(n2 + eps * eps)


def kabsch_rotation_3x3(H):
    """The proper rotation R maximizing tr(R H) for (..., 3, 3) H — i.e.
    the Kabsch solution R = V diag(1,1,det(VU^T)) U^T for H = U S V^T,
    computed without a general SVD.

    Matches the convention of utils.svd.procrustes_from_correspondence:
    given H = sum_n src_c[n] (corr_c[n])^T (a (3, 3) cross-covariance with
    the *source* index on rows), returns the rotation mapping src -> corr.
    """
    hi = jax.lax.Precision.HIGHEST
    H = H.astype(jnp.float32)
    A = jnp.matmul(jnp.swapaxes(H, -1, -2), H, precision=hi)  # H^T H, PSD
    lam, V = eigh3x3(A)
    v1, v2 = V[..., :, 0], V[..., :, 1]
    v3 = jnp.cross(v1, v2)  # proper right basis
    U0 = jnp.einsum("...ij,...j->...i", H, v1, precision=hi)
    u1 = _normalize(U0)
    U1 = jnp.einsum("...ij,...j->...i", H, v2, precision=hi)
    u2 = _normalize(U1 - jnp.sum(u1 * U1, -1, keepdims=True) * u1)
    # Degenerate guard: if sigma_1 ~ 0 (H ~ 0) the frame is arbitrary but
    # still orthonormal thanks to the fallback below.
    bad1 = jnp.linalg.norm(U0, axis=-1, keepdims=True) < 1e-9
    u1 = jnp.where(bad1, jnp.array([1.0, 0.0, 0.0], H.dtype), u1)
    bad2 = jnp.linalg.norm(U1 - jnp.sum(u1 * U1, -1, keepdims=True) * u1, axis=-1, keepdims=True) < 1e-9
    alt = _normalize(jnp.cross(u1, jnp.array([0.0, 1.0, 0.0], H.dtype) + 0 * u1) + 1e-6)
    u2 = jnp.where(bad2, alt, u2)
    u3 = jnp.cross(u1, u2)  # proper left basis
    Vp = jnp.stack([v1, v2, v3], axis=-1)
    Up = jnp.stack([u1, u2, u3], axis=-1)
    # R = V' U'^T: with both bases proper this equals the det-corrected
    # Kabsch rotation (reflection absorbed by the forced third columns).
    return jnp.matmul(Vp, jnp.swapaxes(Up, -1, -2), precision=jax.lax.Precision.HIGHEST)
