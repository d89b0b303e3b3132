"""Headline benchmark: vol-surface fit+eval throughput on one TPU chip.

Metric (BASELINE.json): surfaces/sec, fit + evaluate on a 30x50
strike-maturity grid, cubic-spline smiles + total-variance maturity
construction + butterfly/calendar diagnostics — all on-device.
North-star target: 10,000 surfaces/sec on one v5e chip
(``vs_baseline`` = measured / 10,000).

Prints ONE JSON line.
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

TARGET = 10_000.0  # surfaces/sec north star (BASELINE.md)
E, N_K, N_GRID = 30, 50, 50


def _chains(B, rng):
    """Synthetic option chains: (B, E, n) strikes/IVs + (B, E) expiries."""
    k = np.broadcast_to(np.linspace(-1.0, 1.0, N_K, dtype=np.float32),
                        (B, E, N_K)).copy()
    T = np.broadcast_to(np.linspace(0.05, 2.0, E, dtype=np.float32), (B, E))
    atm = rng.uniform(0.15, 0.6, (B, 1, 1)).astype(np.float32)
    curv = rng.uniform(0.05, 0.3, (B, 1, 1)).astype(np.float32)
    iv = atm + curv * k * k
    return jnp.asarray(k), jnp.asarray(iv), jnp.asarray(T)


def main():
    from iv_interpolation_tpu.surface.surface import fit_eval_surface

    rng = np.random.default_rng(0)

    def step(k, iv, T):
        out = fit_eval_surface(k, iv, T, method="cubic_spline", n_grid=N_GRID)
        return out["w_grid"], out["butterfly_ok"], out["calendar_ok"]

    step_jit = jax.jit(step)

    best = 0.0
    best_B = 0
    for B in (2048, 8192):
        # Timing rules learned the hard way on this runtime:
        #  * every timed call gets FRESH input buffers — repeat dispatches
        #    with identical buffers can be served from a cache (measured
        #    459M surf/s fake vs ~30M real);
        #  * per-call block_until_ready;
        #  * median over calls — occasional multi-hundred-ms stalls from
        #    the remote-compile relay would poison a mean.
        inputs = [_chains(B, rng) for _ in range(7)]
        out = step_jit(*inputs[-1])
        jax.block_until_ready(out)          # compile + warmup
        times = []
        for args in inputs[:-1]:
            t0 = time.perf_counter()
            out = step_jit(*args)
            jax.block_until_ready(out)
            times.append(time.perf_counter() - t0)
        dt = sorted(times)[len(times) // 2]
        sps = B / dt
        if sps > best:
            best, best_B = sps, B
    value = round(best, 1)
    print(json.dumps({
        "metric": "surfaces_per_sec_fit_eval_30x50",
        "value": value,
        "unit": "surfaces/s",
        "vs_baseline": round(value / TARGET, 3),
        "batch": best_B,
        "device": str(jax.devices()[0]),
    }))


if __name__ == "__main__":
    main()
