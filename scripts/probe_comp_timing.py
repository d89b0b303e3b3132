"""Timing probe: compensated vs matrix fast path, interleaved medians."""
import time

import jax
import jax.numpy as jnp
import numpy as np

from iv_interpolation_tpu.ops.spline_compensated import (
    fit_eval_surface_compensated, queries_df)
from iv_interpolation_tpu.ops.spline_matrix import (build_surface_operators,
                                                    fit_eval_surface_grid)

E, N_K, N_GRID = 30, 50, 50
k_row = np.linspace(-1.0, 1.0, N_K, dtype=np.float32)
k = jnp.asarray(np.broadcast_to(k_row, (E, N_K)).copy())
T = jnp.asarray(np.linspace(0.05, 2.0, E, dtype=np.float32))
q = queries_df(-1.0, 1.0, N_GRID)
q32 = jnp.asarray(np.linspace(-1.0, 1.0, N_GRID, dtype=np.float32))
ops = build_surface_operators(k, q32, bc_type="not-a-knot")
jax.block_until_ready(ops)

comp = jax.jit(lambda ivb: fit_eval_surface_compensated(k, ivb, T, queries=q))
fast = jax.jit(lambda ivb: fit_eval_surface_grid(ops, ivb, T))

prng = np.random.default_rng(int(time.time()))


def bench(fn, B, reps=7):
    ivb = jnp.asarray(prng.uniform(0.15, 0.9, (B, E, N_K)).astype(np.float32))
    jax.block_until_ready(fn(ivb))  # compile
    ts = []
    for _ in range(reps):
        ivb = jnp.asarray(
            prng.uniform(0.15, 0.9, (B, E, N_K)).astype(np.float32))
        jax.block_until_ready(ivb)
        t0 = time.perf_counter()
        jax.block_until_ready(fn(ivb))
        ts.append(time.perf_counter() - t0)
    return sorted(ts)


for B in (32768, 131072):
    tf = bench(fast, B)
    tc = bench(comp, B)
    print(f"B={B}: fast median {np.median(tf)*1e3:.1f} ms "
          f"({B/np.median(tf):,.0f}/s)  all={[f'{t*1e3:.0f}' for t in tf]}",
          flush=True)
    print(f"B={B}: comp median {np.median(tc)*1e3:.1f} ms "
          f"({B/np.median(tc):,.0f}/s)  all={[f'{t*1e3:.0f}' for t in tc]}",
          flush=True)
