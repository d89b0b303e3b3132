"""No-arbitrage diagnostics on evaluated surface grids.

North-star requirement (BASELINE.md): "static (butterfly) + calendar
no-arbitrage preserved on the evaluated grid". No reference analogue —
the reference's only data validators were OHLC-integrity checks
(src/candle_reconstruction/core.py:108-144); these are their vol-surface
counterparts.

  * Butterfly (static): Gatheral's g-function on a total-variance slice
    w(k):  g(k) = (1 - k w'/(2w))^2 - (w'^2/4)(1/w + 1/4) + w''/2 >= 0.
    Works for any smile parameterisation given (w, w', w'').
  * Calendar: total variance non-decreasing in maturity at fixed
    log-moneyness: w(k, T2) >= w(k, T1) for T2 > T1.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


@jax.jit
def butterfly_g(k: jax.Array, w: jax.Array, w1: jax.Array,
                w2: jax.Array) -> jax.Array:
    """g(k) for a total-variance slice given values and derivatives.

    All inputs broadcastable ``(..., m)`` arrays over a dense k-grid.
    g >= 0 everywhere <=> no butterfly arbitrage (risk-neutral density
    non-negative).
    """
    w_safe = jnp.maximum(w, 1e-12)
    t1 = (1.0 - k * w1 / (2.0 * w_safe)) ** 2
    t2 = (w1 * w1 / 4.0) * (1.0 / w_safe + 0.25)
    return t1 - t2 + w2 / 2.0


@jax.jit
def butterfly_g_fd(k: jax.Array, w: jax.Array) -> jax.Array:
    """g(k) with finite-difference derivatives for parameterisations
    without closed-form w', w'' (uniform interior grid assumed; endpoints
    copy their neighbours)."""
    dk = k[..., 1:] - k[..., :-1]
    w1_mid = (w[..., 1:] - w[..., :-1]) / dk
    w1 = jnp.concatenate([
        w1_mid[..., :1],
        (w1_mid[..., 1:] + w1_mid[..., :-1]) / 2.0,
        w1_mid[..., -1:],
    ], axis=-1)
    w2_int = (w1_mid[..., 1:] - w1_mid[..., :-1]) \
        / ((dk[..., 1:] + dk[..., :-1]) / 2.0)
    w2 = jnp.concatenate([
        w2_int[..., :1], w2_int, w2_int[..., -1:],
    ], axis=-1)
    return butterfly_g(k, w, w1, w2)


@jax.jit
def calendar_violations(w_grid: jax.Array, tol: float = 0.0) -> jax.Array:
    """Count calendar-arbitrage violations on a ``(..., E, m)`` grid of
    total variance (expiries ascending along axis -2)."""
    dec = w_grid[..., 1:, :] < (w_grid[..., :-1, :] - tol)
    return jnp.sum(dec, axis=(-2, -1))


@jax.jit
def check_surface_arbitrage(k_grid: jax.Array, w_grid: jax.Array):
    """Full-surface diagnostic on an evaluated ``(..., E, m)`` grid.

    Returns dict of per-surface scalars: butterfly violation count, worst
    (most negative) g value, calendar violation count, worst calendar gap.
    """
    g = butterfly_g_fd(k_grid, w_grid)
    butterfly_count = jnp.sum(g < 0, axis=(-2, -1))
    worst_g = jnp.min(g, axis=(-2, -1))
    cal_count = calendar_violations(w_grid)
    cal_gap = jnp.min(
        (w_grid[..., 1:, :] - w_grid[..., :-1, :]), axis=(-2, -1)
    )
    return {
        "butterfly_violations": butterfly_count,
        "worst_g": worst_g,
        "calendar_violations": cal_count,
        "worst_calendar_gap": cal_gap,
    }
