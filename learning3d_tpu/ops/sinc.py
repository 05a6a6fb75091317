"""Taylor-stabilized sinc family used by the SO(3)/SE(3) exponential maps.

Capability parity with the reference's ``ops/sinc.py`` (sinc1..sinc4 with
|t|<eps Taylor branches and custom backward): here each function is written
with the double-``where`` trick so plain JAX autodiff is exact and NaN-free
at t=0 — no custom VJPs needed, and everything fuses into the surrounding
XLA program.

    sinc1(t) = sin(t) / t
    sinc2(t) = (1 - cos(t)) / t^2
    sinc3(t) = (t - sin(t)) / t^3
    sinc4(t) = (t^2/2 + cos(t) - 1) / t^4
"""

from __future__ import annotations

import jax.numpy as jnp

# Below this |t| the Taylor polynomial is more accurate than the analytic
# form in float32 (cancellation in 1-cos(t) etc.).
_SMALL = 0.1


def _safe(t):
    """Replace near-zero entries so the analytic branch never divides by 0.

    Combined with jnp.where over the result this keeps both the primal and
    every autodiff order finite (the standard double-where trick).
    """
    return jnp.where(jnp.abs(t) < _SMALL, jnp.ones_like(t), t)


def sinc1(t):
    """sin(t)/t, exact and differentiable at t=0."""
    s = _safe(t)
    t2 = t * t
    taylor = 1.0 - t2 / 6.0 * (1.0 - t2 / 20.0 * (1.0 - t2 / 42.0))
    return jnp.where(jnp.abs(t) < _SMALL, taylor, jnp.sin(s) / s)


def sinc2(t):
    """(1-cos(t))/t^2, exact and differentiable at t=0 (value 1/2)."""
    s = _safe(t)
    t2 = t * t
    taylor = 0.5 * (1.0 - t2 / 12.0 * (1.0 - t2 / 30.0 * (1.0 - t2 / 56.0)))
    return jnp.where(jnp.abs(t) < _SMALL, taylor, (1.0 - jnp.cos(s)) / (s * s))


def sinc3(t):
    """(t-sin(t))/t^3, exact and differentiable at t=0 (value 1/6)."""
    s = _safe(t)
    t2 = t * t
    taylor = (1.0 / 6.0) * (1.0 - t2 / 20.0 * (1.0 - t2 / 42.0 * (1.0 - t2 / 72.0)))
    return jnp.where(jnp.abs(t) < _SMALL, taylor, (s - jnp.sin(s)) / (s * s * s))


def sinc4(t):
    """(t^2/2 + cos(t) - 1)/t^4, exact and differentiable at t=0 (value 1/24)."""
    s = _safe(t)
    t2 = t * t
    taylor = (1.0 / 24.0) * (1.0 - t2 / 30.0 * (1.0 - t2 / 56.0 * (1.0 - t2 / 90.0)))
    s2 = s * s
    return jnp.where(
        jnp.abs(t) < _SMALL, taylor, (0.5 * s2 + jnp.cos(s) - 1.0) / (s2 * s2)
    )
