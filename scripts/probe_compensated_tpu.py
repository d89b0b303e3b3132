"""On-chip probe: df64 EFT validity + compensated-path parity/throughput.

Run on the real TPU (no JAX_PLATFORMS override). Not a test — a
measurement script for docs/PERF.md numbers.
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

print("devices:", jax.devices())

from iv_interpolation_tpu.ops import df64 as df
from iv_interpolation_tpu.ops.spline_compensated import (
    fit_eval_surface_compensated, queries_df)

# --- EFT validity on this backend ---
rng = np.random.default_rng(7)
a = jnp.asarray((rng.uniform(-1, 1, 8192) * np.exp2(
    rng.integers(-6, 6, 8192))).astype(np.float32))
b = jnp.asarray((rng.uniform(-1, 1, 8192) * np.exp2(
    rng.integers(-6, 6, 8192))).astype(np.float32))
s, e = jax.jit(df.two_sum)(a, b)
exact = (np.asarray(s, np.float64) + np.asarray(e, np.float64)
         == np.asarray(a, np.float64) + np.asarray(b, np.float64))
print("two_sum exact frac:", exact.mean())
p, pe = jax.jit(df.two_prod)(a, b)
exactp = (np.asarray(p, np.float64) + np.asarray(pe, np.float64)
          == np.asarray(a, np.float64) * np.asarray(b, np.float64))
print("two_prod exact frac:", exactp.mean())

# --- parity on the bench config ---
E, N_K, N_GRID = 30, 50, 50
k_row = np.linspace(-1.0, 1.0, N_K, dtype=np.float32)
k = jnp.asarray(np.broadcast_to(k_row, (E, N_K)).copy())
T = np.linspace(0.05, 2.0, E, dtype=np.float32)
q = queries_df(-1.0, 1.0, N_GRID)

Bs = 64
prng = np.random.default_rng(12345)
atm = prng.uniform(0.15, 0.6, (Bs, 1, 1))
curv = prng.uniform(0.05, 0.3, (Bs, 1, 1))
iv = np.broadcast_to(atm + curv * k_row ** 2, (Bs, E, N_K)).astype(
    np.float32)

out = fit_eval_surface_compensated(k, jnp.asarray(iv), jnp.asarray(T),
                                   queries=q)
jax.block_until_ready(out)
w64 = (np.asarray(out["w_grid"], np.float64)
       + np.asarray(out["w_grid_lo"], np.float64))
from scipy.interpolate import CubicSpline
q64 = np.linspace(-1.0, 1.0, N_GRID)
worst = 0.0
for bb in range(0, Bs, 4):
    for ee in range(0, E, 3):
        ref = CubicSpline(k_row.astype(np.float64),
                          np.asarray(iv[bb, ee], np.float64) ** 2
                          * np.float64(T[ee]), bc_type="not-a-knot")(q64)
        worst = max(worst, np.abs(w64[bb, ee] - ref).max())
print("on-chip compensated parity_max_err:", worst)
print("butterfly_clean_frac:", float(np.asarray(out["butterfly_ok"]).mean()))

# --- throughput at large batches ---
step = jax.jit(lambda ivb: fit_eval_surface_compensated(
    k, ivb, jnp.asarray(T), queries=q))
for B in (8192, 32768, 65536):
    ivb = jnp.asarray(prng.uniform(0.15, 0.9, (B, E, N_K)).astype(np.float32))
    o = step(ivb); jax.block_until_ready(o)  # compile
    times = []
    for i in range(5):
        ivb = jnp.asarray(
            prng.uniform(0.15, 0.9, (B, E, N_K)).astype(np.float32))
        jax.block_until_ready(ivb)
        t0 = time.perf_counter()
        o = step(ivb)
        jax.block_until_ready(o)
        times.append(time.perf_counter() - t0)
    dt = float(np.median(times))
    print(f"B={B}: {dt*1e3:.1f} ms -> {B/dt:,.0f} surfaces/s")
