"""Dupire local volatility and Breeden-Litzenberger risk-neutral density
from a fitted total-variance surface.

Both are byproducts of the arbitrage machinery the surface path already
computes: with w(k, T) total variance and Gatheral's butterfly function

    g(k) = (1 - k w'/(2w))^2 - (w'^2/4)(1/w + 1/4) + w''/2

(``surface.arbitrage.butterfly_g``, primes = d/dk), the Dupire local
VARIANCE in total-variance form is

    sigma_loc^2(k, T) = (dw/dT) / g(k)

and the risk-neutral density of log-moneyness is

    p(k) = g(k) / sqrt(2 pi w) * exp(-d_-^2 / 2),
    d_-(k) = -k / sqrt(w) - sqrt(w) / 2 .

So butterfly-freeness (g >= 0) and calendar-freeness (dw/dT >= 0) are
exactly the conditions for a real local vol and a non-negative density —
the diagnostics and the pricing objects are the same computation.

No reference analogue (the reference has no surface model at all); this
extends the north-star surface capability (BASELINE.json config #2) with
the standard downstream pricing objects. Everything is elementwise on
the evaluated grid — XLA fuses it into the fit+eval program.

The maturity derivative uses the same convention as ``eval_surface``:
linear in total variance between calibrated slices, so dw/dT is the
forward difference of adjacent slices (piecewise constant in T). Grids
come from ``fit_eval_surface`` outputs (``k_grid``/``w_grid``/``g``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _backward_dwdT(w_grid: jax.Array, expiries: jax.Array,
                   eps: float) -> jax.Array:
    """THE maturity-derivative convention, in one place: slice i carries
    the BACKWARD-in-T derivative on (T_{i-1}, T_i] (where eval_surface's
    piecewise-linear w has that constant derivative), slice 0 uses
    (0, T_0] with w(k, 0) = 0. This convention flipped once already
    (commit 4ed68ae); keeping the validity mask and the local-variance
    values on one implementation prevents them drifting apart."""
    T = expiries[..., None]                              # (..., E, 1)
    dT = T[..., 1:, :] - T[..., :-1, :]                  # (..., E-1, 1)
    dw = w_grid[..., 1:, :] - w_grid[..., :-1, :]
    fwd = dw / jnp.maximum(dT, eps)                      # (..., E-1, m)
    # first slice: (w_1 - 0) / (T_1 - 0)
    first = w_grid[..., :1, :] / jnp.maximum(T[..., :1, :], eps)
    return jnp.concatenate([first, fwd], axis=-2)        # (..., E, m)


@jax.jit
def local_variance_grid(w_grid: jax.Array, g: jax.Array,
                        expiries: jax.Array,
                        eps: float = 1e-10) -> jax.Array:
    """Dupire local variance on an evaluated ``(..., E, m)`` grid.

    Args:
      w_grid: (..., E, m) total variance (expiries ascending along -2).
      g: (..., E, m) butterfly function on the same grid
        (``fit_eval_surface``'s ``g`` output).
      expiries: (..., E) maturities in years.
      eps: floor for g and dT (negative g — butterfly arbitrage — has no
        real local vol; values there are clamped, use the ``g`` output
        to mask them).

    Returns:
      (..., E, m) local variance, with the maturity derivative of
      :func:`_backward_dwdT` (backward difference; slice 0 from T=0).
    """
    return _backward_dwdT(w_grid, expiries, eps) / jnp.maximum(g, eps)


@jax.jit
def risk_neutral_density(k_grid: jax.Array, w_grid: jax.Array,
                         g: jax.Array) -> jax.Array:
    """Breeden-Litzenberger density of log-moneyness per slice.

    p(k) = g(k) / sqrt(2 pi w) * exp(-d_-^2 / 2) with
    d_- = -k/sqrt(w) - sqrt(w)/2. Non-negative iff g >= 0 (butterfly-
    free); integrates to ~1 over a wide enough k range.
    """
    w = jnp.maximum(w_grid, 1e-12)
    sqrt_w = jnp.sqrt(w)
    d_minus = -k_grid / sqrt_w - sqrt_w / 2.0
    return g / jnp.sqrt(2.0 * jnp.pi * w) * jnp.exp(-0.5 * d_minus ** 2)


@jax.jit
def variance_swap_strike(k_grid: jax.Array, w_grid: jax.Array,
                         g: jax.Array, expiries: jax.Array) -> jax.Array:
    """Model-free variance-swap fair strike per expiry (annualised).

    Log-contract replication: K_var * T = -2 E[log(S_T/F_T)] =
    -2 * integral k p(k) dk with p the Breeden-Litzenberger density on
    the evaluated grid; the integral is trapezoidal and normalised by
    the captured mass (first-order correction for wing truncation —
    widen the eval grid when the smile is steep). Flat surface sanity:
    E[k] = -w/2 -> K_var = w/T = sigma^2.

    Returns (..., E) annualised variance strikes.
    """
    p = risk_neutral_density(k_grid, w_grid, g)
    dk = k_grid[..., 1:] - k_grid[..., :-1]
    mid = lambda a: 0.5 * (a[..., 1:] + a[..., :-1])
    mass = jnp.sum(mid(p) * dk, axis=-1)
    mean_k = jnp.sum(mid(p * k_grid) * dk, axis=-1) \
        / jnp.maximum(mass, 1e-12)
    return -2.0 * mean_k / jnp.maximum(expiries, 1e-12)


@jax.jit
def local_vol_surface(out: dict, eps: float = 1e-10) -> dict:
    """Local vol + density from a ``fit_eval_surface`` output dict.

    Returns dict with:
      * ``local_var`` / ``local_vol`` (..., E, m) — Dupire local
        variance/vol; cells failing ``local_vol_valid`` hold
        eps-clamped garbage (~1/eps scale) and MUST be masked;
      * ``local_vol_valid`` (..., E, m) — the per-cell safety mask:
        g > eps AND backward dw/dT >= 0 (surface_task NaNs invalid
        cells before persisting; direct API consumers must do the
        same);
      * ``local_vol_ok`` (...,) — all(local_vol_valid) per surface,
        i.e. every grid cell admits a real local vol. This is the
        SAME tolerance as the mask — it was previously derived from
        butterfly_ok & calendar_ok, whose looser -1e-10/-1e-12 bounds
        let a surface with g = 0 at one cell read as fully OK while
        that cell held clamped garbage;
      * ``density`` (..., E, m) — Breeden-Litzenberger density;
      * ``var_swap`` (..., E) — model-free variance-swap strikes.
    """
    w_grid, g, k_grid = out["w_grid"], out["g"], out["k_grid"]
    expiries = out["fit"].expiries
    dwdT = _backward_dwdT(w_grid, expiries, eps)
    lv = dwdT / jnp.maximum(g, eps)
    valid = (g > eps) & (dwdT >= 0.0)
    return {
        "local_var": lv,
        "local_vol": jnp.sqrt(jnp.maximum(lv, 0.0)),
        "density": risk_neutral_density(k_grid, w_grid, g),
        "var_swap": variance_swap_strike(k_grid, w_grid, g, expiries),
        "local_vol_ok": jnp.all(valid, axis=(-2, -1)),
        "local_vol_valid": valid,
    }
