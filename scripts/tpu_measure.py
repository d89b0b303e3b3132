"""Staged TPU re-measurement for round-4 [TPU pending] PERF.md rows.

Runs on the real chip (axon relay) and prints one JSON line per
measurement so a relay drop mid-run keeps what finished. Stages:

  rbf_ab     — arbfree RBF A/B: Cholesky+Schur KKT (current) vs the
               round-3 LU bordered solve (reconstructed inline below,
               same math) at the bench shape 8 x 2048 x 24 iters.
  ah         — Andreasen-Huge looped-LM compile + surf/s at B=512 (and
               B=1024 if the compile budget holds).
  depth2     — headline spline stream with depth-2 dispatch pipelining
               vs serial per-call readback, B=131072.

Usage:  python scripts/tpu_measure.py [stage ...]   (default: all)
"""

from __future__ import annotations

import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/ivtpu_xla"))

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def emit(stage: str, payload: dict) -> None:
    print(json.dumps({"stage": stage, **payload}), flush=True)


def _fresh_seed() -> int:
    return int(time.time_ns() % (2**31))


# ---------------------------------------------------------------- rbf A/B
def _bench_rbf_module(rbf_mod, B=8, N=2048, n_iters=24) -> dict:
    """bench.bench_rbf's exact shape/seeding, parameterised on the rbf
    module so the round-3 LU build (self-contained file, extracted from
    git ea745df^) and the current Cholesky+Schur build run identically."""
    import bench

    @jax.jit
    def gen(seed):
        ks = jax.random.split(jax.random.PRNGKey(seed), 3)
        kq = jax.random.uniform(ks[0], (B, N), jnp.float32, -1.0, 1.0)
        Tq = jax.random.uniform(ks[1], (B, N), jnp.float32, 0.05, 2.0)
        w = (0.04 + 0.3 * kq * kq) * Tq + 0.01 * jnp.sin(8.0 * kq) * Tq
        pts = jnp.stack([kq, Tq], axis=-1)
        return pts, w

    def step(pts, w):
        return rbf_mod.fit_eval_rbf_arbfree_batched(
            pts, w, pts[:, :64], smoothing=1e-8, n_iters=n_iters)

    step_jit = jax.jit(step)
    seed0 = _fresh_seed()
    inputs = [gen(seed0 + i) for i in range(4)]
    for args in inputs:
        jax.block_until_ready(args)
    t0 = time.time()
    dt = bench._median_time(step_jit, inputs)
    _, bok, cok = step_jit(*inputs[0])
    frac = float((np.asarray(bok) & np.asarray(cok)).mean())
    return {"surf_s": round(B / dt, 2), "arbfree_frac": frac,
            "median_s": round(dt, 2), "wall_s": round(time.time() - t0, 1)}


def stage_rbf_ab() -> None:
    import importlib.util
    import subprocess

    from iv_interpolation_tpu.ops import rbf as rbf_now

    emit("rbf_ab", {"variant": "cholesky_schur",
                    **_bench_rbf_module(rbf_now)})

    src = subprocess.run(
        ["git", "show", "ea745df^:iv_interpolation_tpu/ops/rbf.py"],
        capture_output=True, text=True,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    ).stdout
    path = "/tmp/rbf_r3_lu.py"
    with open(path, "w") as f:
        f.write(src)
    spec = importlib.util.spec_from_file_location("rbf_r3_lu", path)
    rbf_r3 = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(rbf_r3)
    emit("rbf_ab", {"variant": "lu_r3", **_bench_rbf_module(rbf_r3)})


def stage_ah() -> None:
    from bench import bench_ah

    for B in (512, 1024):
        rng = np.random.default_rng(_fresh_seed())
        t0 = time.time()
        try:
            surf_s, frac, rmse = bench_ah(rng, B=B)
        except Exception as e:  # noqa: BLE001 — record and continue
            emit("ah", {"B": B, "error": repr(e)[:200],
                        "wall_s": round(time.time() - t0, 1)})
            continue
        emit("ah", {"B": B, "surf_s": round(surf_s, 1),
                    "arbfree_frac": frac, "price_rmse": rmse,
                    "wall_s": round(time.time() - t0, 1)})


def stage_depth2() -> None:
    """Depth-2 dispatch pipelining on the headline spline stream.

    Serial timing does: dispatch -> block on 1-element readback -> next
    (bench._force semantics). Depth-2 keeps one batch in flight:
    dispatch i+1 before reading back i, hiding the ~35 ms relay
    round-trip behind device compute. Same operators/shapes as
    bench.bench_spline (30x50 fit+eval, B=131072).
    """
    import bench
    from iv_interpolation_tpu.ops.spline_matrix import (
        build_surface_operators, fit_eval_surface_grid)

    B = 131072
    k_row = np.linspace(-1.0, 1.0, bench.N_K, dtype=np.float32)
    knots = jnp.asarray(np.broadcast_to(k_row, (bench.E, bench.N_K)).copy())
    queries = jnp.asarray(
        np.linspace(-1.0, 1.0, bench.N_GRID, dtype=np.float32))
    T = jnp.asarray(np.linspace(0.05, 2.0, bench.E, dtype=np.float32))
    ops = build_surface_operators(knots, queries, bc_type="not-a-knot")
    jax.block_until_ready(ops)

    def step(iv):
        out = fit_eval_surface_grid(ops, iv, T)
        return out["w_grid"], out["butterfly_ok"], out["calendar_ok"]

    step_jit = jax.jit(step)
    gen = bench._iv_gen(B, k_row)
    seed0 = _fresh_seed()
    inputs = [gen(seed0 + i) for i in range(10)]
    for x in inputs:
        jax.block_until_ready(x)
    bench._force(step_jit(inputs[0]))  # warm: compile + one run

    n = len(inputs) - 2
    t0 = time.perf_counter()
    for x in inputs[2:]:
        bench._force(step_jit(x))
    serial_s = (time.perf_counter() - t0) / n

    t0 = time.perf_counter()
    pending = None
    for x in inputs[2:]:
        out = step_jit(x)
        if pending is not None:
            bench._force(pending)
        pending = out
    bench._force(pending)
    depth2_s = (time.perf_counter() - t0) / n

    emit("depth2", {
        "B": B,
        "serial_ms": round(serial_s * 1e3, 1),
        "depth2_ms": round(depth2_s * 1e3, 1),
        "speedup": round(serial_s / depth2_s, 3),
        "serial_surf_s": round(B / serial_s),
        "depth2_surf_s": round(B / depth2_s),
    })


STAGES = {"rbf_ab": stage_rbf_ab, "ah": stage_ah, "depth2": stage_depth2}


def main() -> None:
    names = sys.argv[1:] or list(STAGES)
    emit("init", {"devices": [str(d) for d in jax.devices()]})
    for name in names:
        t0 = time.time()
        try:
            STAGES[name]()
        except Exception as e:  # noqa: BLE001 — stage isolation
            emit(name, {"error": repr(e)[:300],
                        "wall_s": round(time.time() - t0, 1)})


if __name__ == "__main__":
    main()
