"""Batched matrix inverse / pseudo-inverse.

The reference implements these with per-item python loops and a
hand-written analytic backward (ops/invmat.py:6-110) because torch's
autograd-through-inverse was a concern there. On TPU/XLA,
``jnp.linalg.inv``/``pinv`` are natively batched and differentiable, so
these are thin wrappers kept for API parity.
"""

from __future__ import annotations

import jax.numpy as jnp


def batch_inverse(x):
    """(..., N, N) -> (..., N, N), batched, differentiable."""
    return jnp.linalg.inv(x)


def batch_pinv(x, rcond=1e-6):
    """Moore-Penrose pseudo-inverse, batched, differentiable."""
    return jnp.linalg.pinv(x, rtol=rcond)


def pinv_via_normal_eqs(J, eps=0.0):
    """(J^T J)^{-1} J^T for (..., M, K) with M >= K — the exact construction
    PointNetLK uses (reference pointnetlk.py:138-156). ``eps`` adds Tikhonov
    damping to guard singular Jacobians (replacing the reference's
    try/except RuntimeError fallback to identity)."""
    JtJ = jnp.einsum("...mk,...ml->...kl", J, J)
    if eps:
        JtJ = JtJ + eps * jnp.eye(JtJ.shape[-1], dtype=J.dtype)
    return jnp.linalg.solve(JtJ, jnp.swapaxes(J, -1, -2))
