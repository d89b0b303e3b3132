"""Readiness validation and processing estimates.

Mirrors the reference's gates (production_main.py:63-163: RAM >= 16GB,
>= 4 cores, table existence, row census, time estimate; main.py:46-163:
per-task table validation) recast for a TPU host: device presence and HBM
replace the Postgres settings probe, and the throughput model is measured
from a calibration microbatch instead of the reference's assumed
1000 rows/s/worker (config_production.py:206-252).
"""

from __future__ import annotations

import time

import jax

from iv_interpolation_tpu.pipeline import storage as st

_TASK_INPUTS = {
    "interpolation": [st.TICKERS],
    "bridge": [st.INTERPOLATED],
    "candles": [st.MINUTE_CANDLES],
    "both": [st.TICKERS],
    "pipeline": [st.TICKERS],
    "all": [st.TICKERS],
    "surface": [st.INTERPOLATED],
}


def validate_readiness(config, store, task: str = "all") -> dict:
    """Environment + data readiness. Returns dict with ``ready`` bool and
    per-check details; mirrors validate_production_readiness
    (production_main.py:63-163)."""
    checks = {}

    # a backend outage must report not-ready, not crash the readiness
    # check with a traceback (relay outages exceeding 30 min are a
    # documented environment fact — bench.py's whole harness exists for
    # them; round-4 review)
    try:
        devices = jax.devices()
    except Exception as e:  # noqa: BLE001 — init failure IS the finding
        checks["device"] = {"ok": False, "platform": None, "count": 0,
                            "error": f"{type(e).__name__}: {e}"}
        devices = []
    else:
        checks["device"] = {
            "ok": len(devices) > 0,
            "platform": devices[0].platform if devices else None,
            "count": len(devices),
        }
    try:
        stats = devices[0].memory_stats() or {}
        hbm_gb = stats.get("bytes_limit", 0) / 2**30
        checks["device_memory"] = {"ok": True, "hbm_gb": round(hbm_gb, 1)}
    except Exception:
        checks["device_memory"] = {"ok": True, "hbm_gb": None}

    # host-resource gates are advisory (the device does the work here,
    # unlike the reference's 16GB/4-core hard gates, production_main.py:88-97)
    try:
        import psutil
        ram_gb = psutil.virtual_memory().total / 2**30
        cores = psutil.cpu_count()
        checks["host_ram"] = {"ok": True, "warn": ram_gb < 4,
                              "ram_gb": round(ram_gb, 1)}
        checks["host_cores"] = {"ok": True, "warn": cores < 2,
                                "cores": cores}
    except ImportError:
        checks["host_ram"] = {"ok": True, "ram_gb": None}
        checks["host_cores"] = {"ok": True, "cores": None}

    for table in _TASK_INPUTS.get(task, [st.TICKERS]):
        rows = store.count(table)
        n_sym = len(store.list_symbols(table)) if rows else 0
        checks[f"table_{table}"] = {
            "ok": rows > 0,
            "rows": rows,
            "symbols": n_sym,
        }

    ready = all(c["ok"] for c in checks.values())
    return {"ready": ready, "task": task, "checks": checks}


def estimate_processing(config, store,
                        calibrate_rows: int = 2000) -> dict:
    """Estimate wall time for a full Task-1 run by timing a calibration
    microbatch on the attached device (replaces the reference's analytic
    1000 rows/s/worker model, config_production.py:206-252)."""
    import jax.numpy as jnp
    import numpy as np

    from iv_interpolation_tpu.pipeline import tasks

    n_rows = store.count(st.TICKERS)
    n_sym = len(store.list_symbols(st.TICKERS)) if n_rows else 0

    # calibration: one small interpolate_batch, timed after warmup.
    # The timed call gets FRESH input content and the timing bracket
    # ends with a host readback — this runtime memoises executions on
    # (executable, input content) across processes and
    # block_until_ready can return before remote work completes, so
    # timing a repeat call on identical buffers measured a cache hit
    # (the exact bug class bench.py documents and fixed; round-4
    # review).
    B, C, L = 8, 8, 256

    def make_args(seed):
        r = np.random.default_rng(seed)
        vals = r.normal(size=(B, C, L)).astype(np.float32)
        vals[:, :, 1::3] = np.nan
        return (jnp.asarray(vals), jnp.asarray(np.ones((B, L), bool)),
                jnp.asarray(np.ones((B, L), bool)),
                jnp.ones((B,), jnp.float32), jnp.zeros((B,), bool))

    out = tasks.interpolate_batch(*make_args(0))
    float(out["filled"][0, 0, 0])  # honest warmup barrier: on the TPU
    #   relay block_until_ready can return before compile+execute
    #   finish, which would push the whole compile into the timed call
    args = make_args(1)          # fresh content, same shapes (cached jit)
    t0 = time.perf_counter()
    out = tasks.interpolate_batch(*args)
    float(out["filled"][0, 0, 0])  # one-element readback: honest finish
    dt = time.perf_counter() - t0
    grid_points_per_s = (B * L) / max(dt, 1e-9)

    expansion = 60  # hourly -> 1-min (progress.py:203-207)
    est_output_rows = n_rows * expansion
    est_device_s = est_output_rows / max(grid_points_per_s, 1.0)
    # host pack/unpack dominates in practice; apply the reference's 1.5x
    # overhead factor (config_production.py:219-220) to the measured rate
    est_total_s = est_device_s * 1.5

    return {
        "input_rows": n_rows,
        "symbols": n_sym,
        "estimated_output_rows": est_output_rows,
        "measured_grid_points_per_s": round(grid_points_per_s),
        "estimated_seconds": round(est_total_s, 2),
        "estimated_minutes": round(est_total_s / 60, 2),
    }
