"""Approximate Earth Mover's Distance — TPU-native approxmatch.

TPU reformulation of the reference's CUDA auction kernel
(losses/cuda/emd_torch/pkg/include/cuda/emd.cuh:7-200): the per-level
inner loops are exactly matrix-vector products against the kernel matrix
K = exp(level * D^2), so the whole algorithm becomes a 10-step lax.scan of
MXU contractions — no irregular control flow, no match-matrix in HBM for
the loss path.

Per annealing level (level = -4^j for j = 7..-1, then 0):
    ratioL  = remainL / (K @ remainR + 1e-9)
    sumr    = remainR * (K^T @ ratioL)
    ratioR  = min(remainR / (sumr + 1e-9), 1) * remainR
    remainR = max(0, remainR - sumr)
    W       = K * ratioL[:, None] * ratioR[None, :]   (level's match increment)
    remainL = max(0, remainL - W @ 1)

cost = sum(match * |x - y|) (L2, not squared); gradients hold the match
fixed (the reference's matchcostgrad semantics, emd.cuh:259-346) and reduce
to row/col sums of match / distance — again pure matvecs.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS = 1e-9
_LEVELS = tuple([-float(4**j) for j in range(7, -3, -1)][:-1] + [0.0])
# j = 7..-2 with 4^-2 handled: reference uses level = -4^j for j=7..-1 and 0 for j=-2.


def _levels():
    lv = [-float(4.0**j) for j in range(7, -2, -1)]  # j = 7..-1
    lv.append(0.0)  # j = -2 -> level 0
    return jnp.asarray(lv, dtype=jnp.float32)


def _multipliers(n, m):
    if n >= m:
        return 1.0, float(n // m)
    return float(m // n), 1.0


def _sqdist(x, y):
    d = jnp.sum(x * x, -1)[..., :, None] + jnp.sum(y * y, -1)[..., None, :]
    return jnp.maximum(
        d - 2.0 * jnp.einsum("bnc,bmc->bnm", x, y, precision=jax.lax.Precision.HIGHEST),
        0.0,
    )


def approx_match(x, y):
    """Full match matrix (B, N, M) (x-rows, y-cols) — parity/debug path.

    match rows approximately sum to multiL, columns to multiR, like the
    CUDA kernel's output (transposed layout there).
    """
    x = x.astype(jnp.float32)
    y = y.astype(jnp.float32)
    B, N, _ = x.shape
    M = y.shape[1]
    multiL, multiR = _multipliers(N, M)
    D2 = _sqdist(x, y)

    def step(carry, level):
        remainL, remainR, match = carry
        K = jnp.exp(level * D2)
        ratioL = remainL / (jnp.einsum("bnm,bm->bn", K, remainR) + _EPS)
        sumr = remainR * jnp.einsum("bnm,bn->bm", K, ratioL)
        ratioR = jnp.minimum(remainR / (sumr + _EPS), 1.0) * remainR
        remainR = jnp.maximum(remainR - sumr, 0.0)
        W = K * ratioL[..., :, None] * ratioR[..., None, :]
        remainL = jnp.maximum(remainL - jnp.sum(W, axis=-1), 0.0)
        return (remainL, remainR, match + W), None

    init = (
        jnp.full((B, N), multiL, jnp.float32),
        jnp.full((B, M), multiR, jnp.float32),
        jnp.zeros((B, N, M), jnp.float32),
    )
    (_, _, match), _ = jax.lax.scan(step, init, _levels())
    return match


def match_cost(match, x, y):
    """sum(match * |x - y|) per batch item (reference matchcost)."""
    C = jnp.sqrt(jnp.maximum(_sqdist(x, y), 1e-20))
    return jnp.sum(match * C, axis=(-2, -1))


def _emd_fwd_impl(x, y):
    """Fused cost + fixed-match gradients without materializing match.

    g1 = sum_m (W/C)[n, m] (x_n - y_m) = x * rowsum(W/C) - (W/C) @ y
    accumulated per level — everything is a matvec against K-derived
    matrices that XLA fuses tile-wise.
    """
    B, N, _ = x.shape
    M = y.shape[1]
    multiL, multiR = _multipliers(N, M)
    D2 = _sqdist(x, y)
    C = jnp.sqrt(jnp.maximum(D2, 1e-20))

    def step(carry, level):
        remainL, remainR, cost, g1, g2 = carry
        K = jnp.exp(level * D2)
        ratioL = remainL / (jnp.einsum("bnm,bm->bn", K, remainR) + _EPS)
        sumr = remainR * jnp.einsum("bnm,bn->bm", K, ratioL)
        ratioR = jnp.minimum(remainR / (sumr + _EPS), 1.0) * remainR
        remainR = jnp.maximum(remainR - sumr, 0.0)
        W = K * ratioL[..., :, None] * ratioR[..., None, :]
        remainL = jnp.maximum(remainL - jnp.sum(W, axis=-1), 0.0)
        cost = cost + jnp.sum(W * C, axis=(-2, -1))
        WC = W / jnp.maximum(C, 1e-10)
        row = jnp.sum(WC, axis=-1)  # (B, N)
        col = jnp.sum(WC, axis=-2)  # (B, M)
        g1 = g1 + x * row[..., None] - jnp.einsum("bnm,bmc->bnc", WC, y)
        g2 = g2 + y * col[..., None] - jnp.einsum("bnm,bnc->bmc", WC, x)
        return (remainL, remainR, cost, g1, g2), None

    init = (
        jnp.full((B, N), multiL, jnp.float32),
        jnp.full((B, M), multiR, jnp.float32),
        jnp.zeros((B,), jnp.float32),
        jnp.zeros_like(x),
        jnp.zeros_like(y),
    )
    (_, _, cost, g1, g2), _ = jax.lax.scan(step, init, _levels())
    return cost, g1, g2


@jax.custom_vjp
def emd_loss(x, y):
    """Approximate EMD cost per batch item, (B,).

    x (B, N, 3), y (B, M, 3) float32. Backward treats the computed match
    as constant, like the reference extension.
    """
    cost, _, _ = _emd_fwd_impl(x.astype(jnp.float32), y.astype(jnp.float32))
    return cost


def _emd_fwd(x, y):
    cost, g1, g2 = _emd_fwd_impl(x.astype(jnp.float32), y.astype(jnp.float32))
    return cost, (g1, g2)


def _emd_bwd(res, g):
    g1, g2 = res
    return g[..., None, None] * g1, g[..., None, None] * g2


emd_loss.defvjp(_emd_fwd, _emd_bwd)
