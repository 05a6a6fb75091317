"""Taylor-stabilized sinc family used by the SO(3)/SE(3) exponential maps.

Capability parity with the reference's ``ops/sinc.py`` (sinc1..sinc4 with
|t|<eps Taylor branches and custom backward): here each function uses the
double-``where`` trick so plain JAX autodiff is exact and NaN-free at t=0,
and the ``*_sq`` variants take s = t^2 so gradients are finite at w = 0
when fed sum(w*w) (||w||'s gradient is NaN at the origin).

    sinc1(t) = sin(t) / t
    sinc2(t) = (1 - cos(t)) / t^2
    sinc3(t) = (t - sin(t)) / t^3
    sinc4(t) = (t^2/2 + cos(t) - 1) / t^4

Branch thresholds grow with the cancellation order of the analytic form
(sinc4's numerator is O(t^4), catastrophic in float32 until |t| ~ 1); the
nested 4-term Taylor polynomials are accurate to < 1e-7 relative at each
switch point.
"""

from __future__ import annotations

import jax.numpy as jnp

# Squared switch points per function (s = t^2).
_S1, _S2, _S3, _S4 = 0.09, 0.25, 0.64, 1.0


def _safe(s, lim):
    return jnp.where(s < lim, jnp.ones_like(s), s)


def _taylor1(s):
    return 1.0 - s / 6.0 * (1.0 - s / 20.0 * (1.0 - s / 42.0 * (1.0 - s / 72.0)))


def _taylor2(s):
    return 0.5 * (1.0 - s / 12.0 * (1.0 - s / 30.0 * (1.0 - s / 56.0 * (1.0 - s / 90.0))))


def _taylor3(s):
    return (1.0 / 6.0) * (
        1.0 - s / 20.0 * (1.0 - s / 42.0 * (1.0 - s / 72.0 * (1.0 - s / 110.0)))
    )


def _taylor4(s):
    return (1.0 / 24.0) * (
        1.0 - s / 30.0 * (1.0 - s / 56.0 * (1.0 - s / 90.0 * (1.0 - s / 132.0)))
    )


def sinc1_sq(s):
    """sinc1(sqrt(s)) as a smooth function of s = t^2."""
    r = jnp.sqrt(_safe(s, _S1))
    return jnp.where(s < _S1, _taylor1(s), jnp.sin(r) / r)


def sinc2_sq(s):
    """sinc2(sqrt(s)) as a smooth function of s = t^2."""
    r = jnp.sqrt(_safe(s, _S2))
    return jnp.where(s < _S2, _taylor2(s), (1.0 - jnp.cos(r)) / _safe(s, _S2))


def sinc3_sq(s):
    """sinc3(sqrt(s)) as a smooth function of s = t^2."""
    r = jnp.sqrt(_safe(s, _S3))
    return jnp.where(s < _S3, _taylor3(s), (r - jnp.sin(r)) / (_safe(s, _S3) * r))


def sinc4_sq(s):
    """sinc4(sqrt(s)) as a smooth function of s = t^2."""
    r = jnp.sqrt(_safe(s, _S4))
    ss = _safe(s, _S4)
    return jnp.where(s < _S4, _taylor4(s), (0.5 * ss + jnp.cos(r) - 1.0) / (ss * ss))


def sinc1(t):
    """sin(t)/t, exact and differentiable at t=0."""
    return sinc1_sq(t * t)


def sinc2(t):
    """(1-cos(t))/t^2, exact and differentiable at t=0 (value 1/2)."""
    return sinc2_sq(t * t)


def sinc3(t):
    """(t-sin(t))/t^3, exact and differentiable at t=0 (value 1/6)."""
    return sinc3_sq(t * t)


def sinc4(t):
    """(t^2/2+cos(t)-1)/t^4, exact and differentiable at t=0 (value 1/24)."""
    return sinc4_sq(t * t)
