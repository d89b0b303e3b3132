"""Headline benchmark: vol-surface fit+eval throughput on one TPU chip.

Metric (BASELINE.json): surfaces/sec, fit + evaluate on a 30x50
strike-maturity grid — cubic-spline smiles in total variance, dense-grid
eval, butterfly/calendar diagnostics, all on-device. North-star target:
10,000 surfaces/sec on one v5e chip (``vs_baseline`` = measured / 10,000).

Uses the matrix-form spline path (``ops.spline_matrix``): on a fixed
strike grid the whole fit+eval is three MXU contractions. Operator
construction is one-off setup amortised over the stream and excluded
from the timed region (it is itself jitted and takes ~n^3 once).

Timing rules, learned the hard way on this runtime:
  * every timed call gets FRESH input buffers — the runtime memoises
    executions on (executable, input content) ACROSS processes;
    rng(0)-seeded inputs returned cached results and absurd numbers
    (459M surf/s fake vs real compute). The headline inputs are
    generated ON DEVICE from fresh time-derived seeds: host->device
    copies measured as low as ~4 MB/s on the degraded relay
    (2026-08-16), so staging six 196 MB host buffers cost minutes and
    bounded the measurable batch size;
  * per-call one-element readback (block_until_ready alone can return
    before remote execution completes on this runtime);
  * median over calls.

The relay adds a ~35-40 ms round-trip floor per dispatch (measured on a
trivial (8,128) elementwise program), so throughput is floor-dominated
at small batches; the headline batch is sized so real device work
amortises the floor (B=131072 fits HBM alongside six resident inputs;
B=262144 OOMs).

Resilience (round-4, after BENCH_r03 recorded rc=1 during a relay
outage that outlasted the old 900 s wait): the process forks into a
PARENT harness and a CHILD worker. The parent never imports jax; it
waits for the backend with subprocess probes for up to
``IVTPU_BENCH_WAIT_S`` seconds (default 7200 — the bench runs once per
round; a missing artifact costs more than any wait), then runs the
stages in a fresh child process. The child persists each completed
stage to a state file, so a crash or relay drop mid-run never loses
the stages already measured; the parent relaunches a fresh child (a
wedged in-process PJRT plugin cannot recover) until all stages are done
or the budget runs out, then prints exactly ONE JSON line assembled
from whatever completed. SIGTERM/SIGINT also flush that line, so even
a driver-kill leaves the headline on stdout if it was measured.

Env knobs: IVTPU_BENCH_WAIT_S (total budget, s), IVTPU_BENCH_ATTEMPT_S
(per-child timeout, s), IVTPU_BENCH_SMOKE=1 (tiny shapes — harness
self-test on CPU), IVTPU_BENCH_STATE (state-file path override).
"""

import json
import os
import signal
import sys
import time

import numpy as np

TARGET = 10_000.0  # surfaces/sec north star (BASELINE.md)
E, N_K, N_GRID = 30, 50, 50
SMOKE = os.environ.get("IVTPU_BENCH_SMOKE", "") == "1"
_CACHE_DIR = os.path.expanduser("~/.cache/ivtpu_xla")

if os.environ.get("IVTPU_BENCH_ROLE") == "child" or __name__ != "__main__":
    # jax is imported only in the child worker (and for library users of
    # the bench_* functions, e.g. scripts/warmup.py); the parent harness
    # must stay importable and responsive with the relay down.
    import jax
    import jax.numpy as jnp

    try:  # persistent compile cache: reruns skip the 1-2 min first-compiles
        jax.config.update("jax_compilation_cache_dir", _CACHE_DIR)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    except Exception:
        pass


def _wait_for_backend(budget_s: float | None = None, poll_s: float = 30.0):
    """Block until the TPU backend initialises, up to ``budget_s``.

    The axon relay goes transiently unavailable ("UNAVAILABLE: TPU
    backend setup/compile error") for stretches measured from minutes to
    >30 min (2026-08-17), and a driver-run bench that starts inside such
    a window would record a spurious failure — BENCH_r03 did exactly
    that when the outage outlasted the old 900 s default. Budget now
    defaults from ``IVTPU_BENCH_WAIT_S`` (7200 s). Probe in a SUBPROCESS
    — in-process init failures can leave the plugin wedged — and only
    touch jax here once a probe succeeds. Falls through after the budget
    so the real error surfaces."""
    import subprocess
    if budget_s is None:
        budget_s = float(os.environ.get("IVTPU_BENCH_WAIT_S", "7200"))
    # CPU-forced sessions (the test suite) must not probe the TPU: a
    # subprocess re-runs sitecustomize, which re-forces the axon platform
    # regardless of the inherited JAX_PLATFORMS=cpu — with the relay down
    # that turned a CPU test into a 15-min hang
    if "cpu" in os.environ.get("JAX_PLATFORMS", ""):
        return
    if "jax" in sys.modules:
        try:
            import jax as _jax
            if "cpu" in str(_jax.config.jax_platforms or ""):
                return
        except AttributeError:
            pass
    deadline = time.time() + budget_s
    probe = "import jax; jax.devices()"
    while True:
        try:
            r = subprocess.run([sys.executable, "-c", probe],
                               capture_output=True, timeout=150)
            if r.returncode == 0:
                return
        except subprocess.TimeoutExpired:
            pass
        if time.time() >= deadline:
            return  # let the real init error surface downstream
        print(f"# TPU backend unavailable; retrying for "
              f"{deadline - time.time():.0f}s more",
              file=sys.stderr, flush=True)
        time.sleep(poll_s)


def _probe_backend_once() -> bool:
    """One subprocess probe: is the backend reachable right now?"""
    import subprocess
    if "cpu" in os.environ.get("JAX_PLATFORMS", ""):
        return True
    try:
        r = subprocess.run(
            [sys.executable, "-c", "import jax; jax.devices()"],
            capture_output=True, timeout=150)
        return r.returncode == 0
    except Exception:
        return False


def _iv_gen(B, k_row):
    """Jitted on-device batch generator: seed -> (B, E, N_K) smiles.
    Fresh seeds per call keep the runtime's content-memoisation honest
    while avoiding the host->device staging cost (see module docstring)."""
    kk = jnp.asarray(k_row)[None, None, :]

    @jax.jit
    def gen(seed):
        k1, k2, k3 = jax.random.split(jax.random.PRNGKey(seed), 3)
        atm = jax.random.uniform(k1, (B, 1, 1), jnp.float32, 0.15, 0.6)
        curv = jax.random.uniform(k2, (B, 1, 1), jnp.float32, 0.05, 0.3)
        noise = 1e-4 * jax.random.normal(k3, (B, E, N_K), jnp.float32)
        return atm + curv * kk * kk + noise

    return gen


def _force(out):
    """Fetch one element of the first output leaf. block_until_ready can
    return before remote execution completes on this runtime (observed
    2026-08-16: sub-ms 'completions' of multi-second programs unless a
    value is fetched) — an actual d2h of a scalar is the only barrier
    that is honest under both regimes."""
    leaf = jax.tree.leaves(out)[0]
    return float(leaf.ravel()[0])


def _median_time(fn, inputs):
    """Median wall time of fn over fresh inputs (last one warms up)."""
    _force(fn(*inputs[-1]))
    times = []
    for args in inputs[:-1]:
        t0 = time.perf_counter()
        _force(fn(*args))
        times.append(time.perf_counter() - t0)
    return sorted(times)[len(times) // 2]


def bench_spline(rng, batch_sizes=(32768, 131072)):
    from iv_interpolation_tpu.ops.spline_matrix import (
        build_surface_operators, fit_eval_surface_grid)

    k_row = np.linspace(-1.0, 1.0, N_K, dtype=np.float32)
    knots = jnp.asarray(np.broadcast_to(k_row, (E, N_K)).copy())
    queries = jnp.asarray(np.linspace(-1.0, 1.0, N_GRID, dtype=np.float32))
    T = jnp.asarray(np.linspace(0.05, 2.0, E, dtype=np.float32))

    # not-a-knot: same operator shapes/FLOPs as natural, but no spurious
    # edge butterfly flags on smooth smiles (tests/test_spline_matrix.py)
    ops = build_surface_operators(knots, queries,
                                  bc_type="not-a-knot")  # setup, amortised
    jax.block_until_ready(ops)

    def step(iv):
        out = fit_eval_surface_grid(ops, iv, T)
        return out["w_grid"], out["butterfly_ok"], out["calendar_ok"]

    step_jit = jax.jit(step)

    best, best_B = 0.0, 0
    for B in batch_sizes:
        gen = _iv_gen(B, k_row)
        seed0 = int(rng.integers(0, 2**31 - 16))
        inputs = [(gen(seed0 + i),) for i in range(6)]
        for (x,) in inputs:
            jax.block_until_ready(x)
        dt = _median_time(step_jit, inputs)
        del inputs  # free ~4.7 GB of resident batches before the next size
        sps = B / dt
        if sps > best:
            best, best_B = sps, B
    return best, best_B, _spline_accuracy(step_jit, k_row, np.asarray(T))


def _spline_accuracy(step_jit, k_row, T_host):
    """Accuracy telemetry for the headline path (round-2 verdict: a
    silent TPU numeric regression — e.g. the MXU bf16 default-precision
    defect, docs/PERF.md — would leave surfaces/s green while every
    value and flag goes wrong; BENCH_r*.json must catch that class).

    Returns dict with:
      * ``parity_max_err``: max |w_grid - SciPy x64 oracle| over a
        64-surface sub-batch (not-a-knot CubicSpline on w = iv^2 T);
      * ``butterfly_clean_frac``: fraction of noiseless convex smiles
        flagged butterfly-free (should be 1.0 — this is exactly the
        check that failed before the HIGHEST-precision fix);
      * ``butterfly_adversarial_frac``: fraction of deliberately
        arbitrage-laden (high-frequency wiggle) surfaces flagged clean
        (should be ~0.0 — catches flags stuck at True).
    """
    Bs = 64
    rng = np.random.default_rng(12345)  # fixed: parity needs no fresh seeds
    atm = rng.uniform(0.15, 0.6, (Bs, 1, 1))
    curv = rng.uniform(0.05, 0.3, (Bs, 1, 1))
    kk = k_row[None, None, :]
    iv_clean = np.broadcast_to(atm + curv * kk * kk,
                               (Bs, E, N_K)).astype(np.float32)
    w_dev, bfly_clean, _ = step_jit(jnp.asarray(iv_clean))
    w_dev = np.asarray(w_dev)

    parity = 0.0
    try:
        from scipy.interpolate import CubicSpline
        q = np.linspace(-1.0, 1.0, N_GRID)
        for b in range(0, Bs, 8):            # sample 8 surfaces of 64
            for e in range(0, E, 6):
                w_knots = (iv_clean[b, e].astype(np.float64) ** 2
                           * float(T_host[e]))
                ref = CubicSpline(k_row.astype(np.float64), w_knots,
                                  bc_type="not-a-knot")(q)
                parity = max(parity, float(
                    np.abs(w_dev[b, e] - ref).max()))
    except ImportError:                       # pragma: no cover
        parity = None                          # JSON null, not NaN

    # adversarial: wiggles at the grid scale carry butterfly arbitrage
    iv_bad = (iv_clean + 0.08 * np.sin(20 * kk)).astype(np.float32)
    _, bfly_bad, _ = step_jit(jnp.asarray(iv_bad))
    return {
        "parity_max_err": parity,
        "butterfly_clean_frac": float(np.asarray(bfly_clean).mean()),
        "butterfly_adversarial_frac": float(np.asarray(bfly_bad).mean()),
    }


def bench_parity(rng, B=32768):
    """Compensated (double-f32) spline fit+eval — the CLI ``--parity``
    mode (ops/spline_compensated.py, config ``surface.compensated``).

    The fast f32 path bottoms out at ulp/2 ~ 6e-8 near w ~ 1.6, which
    can never meet BASELINE.md's <=1e-8 oracle target; the df64 pair
    ``f64(w_grid) + f64(w_grid_lo)`` reproduces the SciPy x64 oracle to
    ~1e-9 (tests/test_spline_compensated.py). This stage measures BOTH
    the deliverable-path parity on the chip and its throughput, so the
    cost of parity mode is quoted next to the headline fast path.

    Returns (surfaces/s, max |hi+lo - oracle| over a 64-surface clean
    sub-batch, oracle evaluated at the df64 query positions q_hi+q_lo).
    """
    from iv_interpolation_tpu.ops.spline_compensated import (
        fit_eval_surface_compensated, queries_df)

    k_row = np.linspace(-1.0, 1.0, N_K, dtype=np.float32)
    k = jnp.asarray(np.broadcast_to(k_row, (E, N_K)).copy())
    T = jnp.asarray(np.linspace(0.05, 2.0, E, dtype=np.float32))
    q = queries_df(-1.0, 1.0, N_GRID)

    def step(iv):
        out = fit_eval_surface_compensated(k, iv, T, queries=q)
        return (out["w_grid"], out["w_grid_lo"],
                out["butterfly_ok"], out["calendar_ok"])

    step_jit = jax.jit(step)
    gen = _iv_gen(B, k_row)
    seed0 = int(rng.integers(0, 2**31 - 16))
    inputs = [(gen(seed0 + i),) for i in range(6)]
    for (x,) in inputs:
        jax.block_until_ready(x)
    dt = _median_time(step_jit, inputs)
    del inputs
    sps = B / dt

    # oracle parity on the same clean-smile population as the fast path
    Bs = 64
    prng = np.random.default_rng(12345)
    atm = prng.uniform(0.15, 0.6, (Bs, 1, 1))
    curv = prng.uniform(0.05, 0.3, (Bs, 1, 1))
    kk = k_row[None, None, :]
    iv_clean = np.broadcast_to(atm + curv * kk * kk,
                               (Bs, E, N_K)).astype(np.float32)
    w_hi, w_lo, _, _ = step_jit(jnp.asarray(iv_clean))
    w64 = np.asarray(w_hi, np.float64) + np.asarray(w_lo, np.float64)
    q64 = (np.asarray(q[0], np.float64) + np.asarray(q[1], np.float64))
    T_host = np.linspace(0.05, 2.0, E, dtype=np.float32)

    parity = 0.0
    try:
        from scipy.interpolate import CubicSpline
        for b in range(0, Bs, 4):
            for e in range(E):
                w_knots = (iv_clean[b, e].astype(np.float64) ** 2
                           * float(T_host[e]))
                ref = CubicSpline(k_row.astype(np.float64), w_knots,
                                  bc_type="not-a-knot")(q64)
                parity = max(parity, float(np.abs(w64[b, e] - ref).max()))
    except ImportError:                       # pragma: no cover
        parity = None
    return sps, parity


def bench_rbf(rng, B=8, N=2048, n_iters=24, n_centers=None):
    # 24 iters: 16 repaired only ~75-100% of the arbitrage-laden batch
    # (seed-dependent); 24 is the measured knee where arbfree_frac is
    # 1.0 across seeds at ~7 surf/s (16: ~10/s, 32: ~5/s)
    """Arbitrage-penalized RBF at the north-star scale (BASELINE config
    #4: ~2k scattered quotes with no-arbitrage penalty smoothing) — B
    surfaces fitted as one vmapped damped-GN solve, flags reported from
    the penalty grid. Returns (surfaces_per_sec, arbfree_frac)."""
    from iv_interpolation_tpu.ops.rbf import fit_eval_rbf_arbfree_batched

    @jax.jit
    def gen(seed):
        ks = jax.random.split(jax.random.PRNGKey(seed), 3)
        kq = jax.random.uniform(ks[0], (B, N), jnp.float32, -1.0, 1.0)
        Tq = jax.random.uniform(ks[1], (B, N), jnp.float32, 0.05, 2.0)
        w = (0.04 + 0.3 * kq * kq) * Tq \
            + 0.01 * jnp.sin(8.0 * kq) * Tq       # arbitrage-laden quotes
        pts = jnp.stack([kq, Tq], axis=-1)
        return pts, w

    def step(pts, w):
        return fit_eval_rbf_arbfree_batched(
            pts, w, pts[:, :64], smoothing=1e-8, n_iters=n_iters,
            n_centers=n_centers)

    step_jit = jax.jit(step)
    seed0 = int(rng.integers(0, 2**31 - 16))
    inputs = [gen(seed0 + i) for i in range(4)]
    for args in inputs:
        jax.block_until_ready(args)
    dt = _median_time(step_jit, inputs)
    _, bok, cok = step_jit(*inputs[0])
    frac = float((np.asarray(bok) & np.asarray(cok)).mean())
    return B / dt, frac


def bench_svi(rng, B=1024, n_iters=32, unroll=True):
    """SVI calibration at the production shape — B surfaces x 30 slices
    (BASELINE config #3 "30 slices x thousands of surfaces") with the
    quasi-explicit init and unrolled LM (a looped LM is latency-bound at
    ~1 ms/iteration on this runtime). B=1024 is the largest batch the
    remote compile helper accepts for the unrolled program; larger
    surface sets tile over it. Returns (slices_per_sec, mean_rmse)."""
    from iv_interpolation_tpu.ops.svi import (fit_svi_batched,
                                              svi_total_variance)

    n = N_K
    k_row = np.linspace(-1.2, 1.2, n, dtype=np.float32)
    k_dev = jnp.asarray(np.broadcast_to(k_row, (B, E, n)).copy())

    @jax.jit
    def gen_w(seed):
        keys = jax.random.split(jax.random.PRNGKey(seed), 6)
        U = lambda key, lo, hi: jax.random.uniform(
            key, (B, E, 1), jnp.float32, lo, hi)
        a, b = U(keys[0], 0.01, 0.08), U(keys[1], 0.05, 0.3)
        rho, m = U(keys[2], -0.6, 0.6), U(keys[3], -0.2, 0.2)
        sig = U(keys[4], 0.1, 0.5)
        kk = jnp.asarray(k_row)[None, None, :]
        w = a + b * (rho * (kk - m) + jnp.sqrt((kk - m) ** 2 + sig ** 2))
        return w + 1e-4 * jax.random.normal(keys[5], (B, E, n), jnp.float32)

    seed0 = int(rng.integers(0, 2**31 - 16))

    def make_inputs(i):
        return k_dev, gen_w(seed0 + i)

    fit = jax.jit(lambda k, w: fit_svi_batched(
        k, w, max_iters=n_iters, init="quasi", unroll=unroll))
    inputs = [make_inputs(i) for i in range(4)]
    for args in inputs:
        jax.block_until_ready(args)
    dt = _median_time(fit, inputs)
    res = fit(*inputs[0])
    k, w = inputs[0]
    pred = svi_total_variance(res.params, k)
    rmse = float(jnp.sqrt(jnp.mean((pred - w) ** 2)))
    return B * E / dt, rmse


def bench_essvi(rng, B=1024, n_iters=32):
    """eSSVI global surface calibration at the production shape — one
    joint 3E-parameter LM per surface (theta increasing + butterfly-free
    slices by construction, ops/essvi.py). Uses the block-tridiagonal
    slice-space solver (solver='block' default): O(E) closed-form 3x3
    solves replace the dense P=90 Cholesky that dominated the dense
    path's step — measured 874 -> 5,125 surfaces/s at this shape with
    identical rmse. Returns (surfaces_per_sec, mean_rmse)."""
    from iv_interpolation_tpu.ops.essvi import essvi_w, fit_essvi_batched

    n = N_K
    k_row = np.linspace(-1.2, 1.2, n, dtype=np.float32)
    k_dev = jnp.asarray(np.broadcast_to(k_row, (B, E, n)).copy())

    @jax.jit
    def gen_w(seed):
        keys = jax.random.split(jax.random.PRNGKey(seed), 5)
        th0 = jax.random.uniform(keys[0], (B, E), jnp.float32, 0.005, 0.03)
        theta = jnp.cumsum(th0, axis=-1)
        rho = jax.random.uniform(keys[1], (B, 1), jnp.float32, -0.6, 0.6)
        rho = jnp.broadcast_to(rho, (B, E))
        frac = jnp.broadcast_to(
            jax.random.uniform(keys[2], (B, 1), jnp.float32, 0.2, 0.7),
            (B, E))
        from iv_interpolation_tpu.ops.essvi import psi_butterfly_cap
        params = jnp.stack(
            [theta, rho, psi_butterfly_cap(theta, rho) * frac], axis=-1)
        w = essvi_w(params, k_dev)
        return w + 1e-4 * jax.random.normal(keys[3], (B, E, n), jnp.float32)

    seed0 = int(rng.integers(0, 2**31 - 16))
    fit = jax.jit(lambda k, w: fit_essvi_batched(k, w, max_iters=n_iters))
    inputs = [(k_dev, gen_w(seed0 + i)) for i in range(4)]
    for args in inputs:
        jax.block_until_ready(args)
    dt = _median_time(fit, inputs)
    res = fit(*inputs[0])
    rmse = float(jnp.sqrt(jnp.mean(
        (essvi_w(res.params, k_dev) - inputs[0][1]) ** 2)))
    return B / dt, rmse


def bench_streaming(rng, B=1024, L_ticks=4096, n_minutes=512):
    """Streaming chain (ticks -> 1-min -> 5-min -> surface refit) per
    underlying — BASELINE config #5's 1k-underlying streaming batch."""
    from iv_interpolation_tpu.pipeline.streaming import streaming_step

    E_s, n_s, m = 4, 12, 50
    k = jnp.broadcast_to(jnp.linspace(-0.8, 0.8, n_s), (B, E_s, n_s))
    T = jnp.broadcast_to(jnp.linspace(0.1, 1.0, E_s), (B, E_s))
    iv = 0.5 + 0.05 * k * k
    # fixed session grids -> precomputed spline operators (one-off setup
    # amortised over the stream, like a StreamingSession)
    from iv_interpolation_tpu.ops.spline_matrix import (
        build_surface_operators_batched)
    from iv_interpolation_tpu.surface.surface import common_support_grid
    ops = build_surface_operators_batched(
        k, common_support_grid(k, m), bc_type="not-a-knot")
    jax.block_until_ready(ops)

    @jax.jit
    def make_inputs(seed):
        k1, k2, k3 = jax.random.split(jax.random.PRNGKey(seed), 3)
        minute = jnp.sort(jax.random.randint(
            k1, (B, L_ticks), 0, n_minutes, jnp.int32), axis=-1)
        price = 100 + jnp.cumsum(
            0.01 * jax.random.normal(k2, (B, L_ticks), jnp.float32),
            axis=-1)
        size = jax.random.uniform(k3, (B, L_ticks), jnp.float32, 0, 5)
        valid = jnp.ones((B, L_ticks), bool)
        return minute, price, size, valid

    step = jax.jit(lambda mi, p, s, v: streaming_step(
        mi, p, s, v, k, iv, T, n_minutes=n_minutes, n_grid=m,
        spline_ops=ops))
    seed0 = int(rng.integers(0, 2**31 - 16))
    inputs = [make_inputs(seed0 + i) for i in range(4)]
    for args in inputs:
        jax.block_until_ready(args)
    dt = _median_time(step, inputs)
    return B / dt


def bench_ah(rng, B=512, n_iters=16, n_grid=257):
    """Andreasen-Huge one-step surfaces (method 'ah'): per-slice LM over
    implicit Dupire steps, arbitrage-free by construction
    (ops/andreasen_huge.py). Arbitrage-LADEN quotes (ATM spike) prove
    the structural guarantee every bench run. B=512 is the production
    batch the round-3 verdict asked for — viable now that the looped
    (lm_unroll=False default) LM removed the unrolled program's
    85-213 s/shape compile wall. Returns
    (surfaces_per_sec, arbfree_frac, price_rmse)."""
    from iv_interpolation_tpu.ops.andreasen_huge import fit_eval_ah_surface

    E_a, m = 8, 16
    k = jnp.asarray(np.broadcast_to(
        np.linspace(-0.6, 0.6, m, dtype=np.float32), (B, E_a, m)).copy())
    T = jnp.asarray(np.broadcast_to(
        np.linspace(0.08, 1.5, E_a, dtype=np.float32), (B, E_a)).copy())

    @jax.jit
    def gen_iv(seed):
        keys = jax.random.split(jax.random.PRNGKey(seed), 2)
        lvl = jax.random.uniform(keys[0], (B, 1, 1), jnp.float32,
                                 0.18, 0.30)
        iv = lvl + 0.1 * k * k + 0.02 * jnp.sqrt(T)[..., None]
        spike = jnp.zeros((m,), jnp.float32).at[m // 2].set(0.4)
        return iv * (1.0 + spike)          # butterfly-violating quotes

    fit = jax.jit(lambda iv: fit_eval_ah_surface(
        k, iv, T, n_grid=n_grid, n_iters=n_iters))
    seed0 = int(rng.integers(0, 2**31 - 16))
    inputs = [(gen_iv(seed0 + i),) for i in range(4)]
    for args in inputs:
        jax.block_until_ready(args)
    dt = _median_time(fit, inputs)
    out = fit(*inputs[0])
    frac = float((np.asarray(out["butterfly_ok"])
                  & np.asarray(out["calendar_ok"])).mean())
    rmse = float(np.asarray(out["fit_rmse"]).max())
    return B / dt, frac, rmse


# ---------------------------------------------------------------------------
# Stage registry: each stage runs independently in the child and persists
# its result dict to the state file the moment it completes, so a crash
# or relay drop mid-run never loses measured stages.

def _stage_spline(rng):
    sizes = (512,) if SMOKE else (32768, 131072)
    best, best_B, acc = bench_spline(rng, batch_sizes=sizes)
    return {"value": round(best, 1), "batch": best_B,
            "device": str(jax.devices()[0]), **acc}


def _stage_svi(rng):
    sps, rmse = (bench_svi(rng, B=16, n_iters=4) if SMOKE
                 else bench_svi(rng))
    return {"value": round(sps, 1), "rmse": round(rmse, 6)}


def _stage_essvi(rng):
    sps, rmse = (bench_essvi(rng, B=16, n_iters=4) if SMOKE
                 else bench_essvi(rng))
    return {"value": round(sps, 1), "rmse": round(rmse, 6)}


def _stage_parity(rng):
    sps, err = (bench_parity(rng, B=512) if SMOKE
                else bench_parity(rng))
    return {"value": round(sps, 1),
            "max_err_vs_x64_oracle": (
                None if err is None else float(f"{err:.3g}"))}


def _stage_streaming(rng):
    ups = (bench_streaming(rng, B=8, L_ticks=256, n_minutes=64) if SMOKE
           else bench_streaming(rng))
    return {"value": round(ups, 1)}


def _stage_rbf(rng):
    sps, frac = (bench_rbf(rng, B=2, N=128, n_iters=2) if SMOKE
                 else bench_rbf(rng))
    return {"value": round(sps, 2), "arbfree_frac": frac}


def _stage_rbf_reduced(rng):
    """Least-squares reduced basis (n_centers=512 over 2048 quotes,
    ops/rbf.py): same hinge repair, (c+p)^3 KKT factorizations — 4.4x
    the exact path at B=8, 7x at B=64 (TPU 2026-08-18); the exact
    every-site-a-center stage above stays the config-#4 headline."""
    if SMOKE:
        sps, frac = bench_rbf(rng, B=2, N=128, n_iters=2, n_centers=32)
        return {"value": round(sps, 2), "arbfree_frac": frac}
    sps, frac = bench_rbf(rng, B=64, n_centers=512)
    return {"value": round(sps, 2), "arbfree_frac": frac}


def _stage_ah(rng):
    sps, frac, rmse = (bench_ah(rng, B=2, n_iters=2, n_grid=65) if SMOKE
                       else bench_ah(rng))
    return {"value": round(sps, 1), "arbfree_frac": frac,
            "price_rmse": float(f"{rmse:.3g}")}


STAGES = (
    ("spline", _stage_spline),
    ("parity", _stage_parity),
    ("svi", _stage_svi),
    ("essvi", _stage_essvi),
    ("streaming", _stage_streaming),
    ("rbf", _stage_rbf),
    ("rbf_reduced", _stage_rbf_reduced),
    ("ah", _stage_ah),
)

_EXTRA_NAMES = {
    "parity": "parity_df64_surfaces_per_sec_fit_eval_30x50",
    "svi": "svi_lm_slices_per_sec_1024x30_quasi32",
    "essvi": "essvi_surfaces_per_sec_1024x30x50_iters32",
    "streaming": "streaming_refit_underlyings_per_sec_1024",
    "rbf": "rbf_arbfree_surfaces_per_sec_8x2048_iters24",
    "rbf_reduced": "rbf_arbfree_reduced_c512_surfaces_per_sec_64x2048_iters24",
    "ah": "ah_surfaces_per_sec_512x8x16_grid257_iters16",
}
_EXTRA_UNITS = {"parity": "surfaces/s",
                "svi": "slices/s", "essvi": "surfaces/s",
                "streaming": "underlyings/s", "rbf": "surfaces/s",
                "rbf_reduced": "surfaces/s", "ah": "surfaces/s"}


def _state_read(path):
    try:
        with open(path) as f:
            return json.load(f)
    except (OSError, ValueError):
        return {"stages": {}}


def _state_write(path, state):
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(state, f)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, path)


def _assemble(state):
    """Build the single output JSON object from completed stages."""
    stages = state.get("stages", {})
    sp = stages.get("spline")
    if sp is None:
        return None
    out = {
        "metric": "surfaces_per_sec_fit_eval_30x50",
        "value": sp["value"],
        "unit": "surfaces/s",
        "vs_baseline": round(sp["value"] / TARGET, 3),
        "batch": sp["batch"],
        "device": sp.get("device", "unknown"),
        # accuracy telemetry: throughput alone would stay green through
        # a silent numeric regression (the bf16-MXU class of bug) —
        # these fields pin values AND flags every bench run
        # headline parity is the DELIVERABLE parity path (CLI --parity,
        # compensated df64 — the <=1e-8 north star); the fast f32
        # path's own envelope stays visible as parity_fast_f32_max_err
        "parity_max_err_vs_x64_oracle": (
            stages["parity"].get("max_err_vs_x64_oracle")
            if "parity" in stages
            else (None if sp.get("parity_max_err") is None
                  else float(f"{sp['parity_max_err']:.3g}"))),
        "parity_fast_f32_max_err": (
            None if sp.get("parity_max_err") is None
            else float(f"{sp['parity_max_err']:.3g}")),
        "butterfly_clean_frac": sp.get("butterfly_clean_frac"),
        "butterfly_adversarial_frac": sp.get("butterfly_adversarial_frac"),
    }
    extras, missing = [], []
    for name, _fn in STAGES[1:]:
        res = stages.get(name)
        if res is None:
            missing.append(_EXTRA_NAMES[name])
            continue
        extra = {"metric": _EXTRA_NAMES[name], "value": res["value"],
                 "unit": _EXTRA_UNITS[name]}
        for key in ("rmse", "arbfree_frac", "price_rmse",
                    "max_err_vs_x64_oracle"):
            if key in res:
                extra[key] = res[key]
        extras.append(extra)
    out["extra_metrics"] = extras
    if missing:
        out["incomplete_metrics"] = missing
    return out


def child_main():
    """Run remaining stages, persisting each result as it completes.

    Stage failures are ISOLATED (round-4 review): one deterministically
    failing stage must not forfeit the later stages' metrics — record
    the traceback to stderr, move on, and exit nonzero at the end so
    the parent knows the run is incomplete. During an outage every
    stage fails fast the same way, which records no progress and lets
    the parent's probe/strike logic classify it correctly."""
    state_path = os.environ["IVTPU_BENCH_STATE"]
    state = _state_read(state_path)
    rng = np.random.default_rng(time.time_ns() % 2**31)
    failed = []
    for name, fn in STAGES:
        if name in state["stages"]:
            print(f"# stage {name}: cached from earlier attempt",
                  file=sys.stderr, flush=True)
            continue
        t0 = time.time()
        try:
            res = fn(rng)
        except Exception:  # noqa: BLE001 — stage isolation
            import traceback
            print(f"# stage {name}: FAILED after {time.time() - t0:.0f}s",
                  file=sys.stderr, flush=True)
            traceback.print_exc()
            failed.append(name)
            continue
        state["stages"][name] = res
        _state_write(state_path, state)
        print(f"# stage {name}: done in {time.time() - t0:.0f}s -> {res}",
              file=sys.stderr, flush=True)
    return 1 if failed else 0


def parent_main():
    """Harness: wait out outages, run child attempts, emit ONE JSON line.

    Exactly one line ever reaches stdout (the assembled metrics object);
    all progress/diagnostics go to stderr. SIGTERM/SIGINT flush the
    line early so a driver-kill still records the headline."""
    import re
    import shutil
    import subprocess
    import tempfile

    state_path = os.environ.get("IVTPU_BENCH_STATE")
    if not state_path:
        fd, state_path = tempfile.mkstemp(prefix="ivtpu_bench_",
                                          suffix=".json")
        os.close(fd)
        os.unlink(state_path)  # child creates it on first stage
    # the path must be operator-visible: a partial run's completed
    # stages live here, and a follow-up IVTPU_BENCH_STATE=<path> run
    # finishes only the missing ones (round-4 review)
    print(f"# bench state file: {state_path}", file=sys.stderr, flush=True)
    budget = float(os.environ.get("IVTPU_BENCH_WAIT_S", "7200"))
    attempt_s = float(os.environ.get("IVTPU_BENCH_ATTEMPT_S", "2700"))
    deadline = time.time() + budget
    emitted = False

    def emit_and_exit(signum=None, frame=None):
        nonlocal emitted
        if emitted:
            os._exit(0 if signum is None else 1)
        emitted = True
        state = _state_read(state_path)
        out = _assemble(state)
        if out is not None:
            print(json.dumps(out), flush=True)
            if len(state.get("stages", {})) == len(STAGES) \
                    and not os.environ.get("IVTPU_BENCH_STATE"):
                # complete run: the auto-created state file has served
                # its purpose (partial-run state is KEPT for manual
                # IVTPU_BENCH_STATE= resumption)
                try:
                    os.unlink(state_path)
                except OSError:
                    pass
            os._exit(0)
        print("# bench: no headline measured before exit",
              file=sys.stderr, flush=True)
        os._exit(1)

    signal.signal(signal.SIGTERM, emit_and_exit)
    signal.signal(signal.SIGINT, emit_and_exit)

    env = dict(os.environ, IVTPU_BENCH_ROLE="child",
               IVTPU_BENCH_STATE=state_path)
    strikes = 0
    cache_wiped = False
    cache_suspect = False  # saw a kill or a cache-read error signature
    while True:
        _wait_for_backend(max(60.0, deadline - time.time()))
        n_before = len(_state_read(state_path).get("stages", {}))
        try:
            # child stdout -> our stderr: stdout carries ONLY the final
            # JSON line, whatever stray prints the child's imports make;
            # stderr is captured too so cache-corruption signatures can
            # gate the wipe below
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__)], env=env,
                stdout=subprocess.PIPE, stderr=subprocess.PIPE,
                timeout=attempt_s)
            rc, child_out = proc.returncode, proc.stdout
            child_err = proc.stderr or b""
        except subprocess.TimeoutExpired as e:
            rc, child_out = -1, e.stdout or b""
            child_err = e.stderr or b""
            cache_suspect = True  # killed mid-run: may truncate an entry
            print(f"# bench child timed out after {attempt_s:.0f}s; "
                  f"killed", file=sys.stderr, flush=True)
        for buf in (child_out, child_err):
            if buf:
                sys.stderr.buffer.write(buf)
                sys.stderr.flush()
        if rc < 0:
            cache_suspect = True  # died on a signal
        if re.search(rb"compilation[ _-]cache|zlib|truncat", child_err,
                     re.IGNORECASE):
            cache_suspect = True
        state = _state_read(state_path)
        n_after = len(state.get("stages", {}))
        if rc == 0 and n_after == len(STAGES):
            break
        if time.time() >= deadline:
            print("# bench: budget exhausted; emitting partial metrics",
                  file=sys.stderr, flush=True)
            break
        if n_after > n_before:
            strikes = 0      # progress was made: outage/crash, not a bug
            continue
        if not _probe_backend_once():
            # relay is down: wait (inside _wait_for_backend next loop),
            # no strike — this is exactly the BENCH_r03 failure mode
            continue
        strikes += 1
        if strikes == 2 and not cache_wiped and cache_suspect \
                and os.path.isdir(_CACHE_DIR):
            # a child killed mid-compile can leave a truncated persistent-
            # cache entry that aborts every later read (observed once,
            # round 3) — wipe our cache dir once before giving up. Gated
            # on an actual kill/corruption signature: this directory is
            # shared with cli.py and __graft_entry__, and a deterministic
            # stage bug (clean rc=1) must not destroy their warm compiles
            # (round-4 review).
            print("# bench: wiping compile cache after repeated "
                  "no-progress failures", file=sys.stderr, flush=True)
            shutil.rmtree(_CACHE_DIR, ignore_errors=True)
            cache_wiped = True
            continue
        if strikes >= 3:
            print("# bench: 3 no-progress failures with backend up — "
                  "real defect, not an outage; emitting what completed",
                  file=sys.stderr, flush=True)
            break
        time.sleep(10)
    emit_and_exit()


def main():
    if os.environ.get("IVTPU_BENCH_ROLE") == "child":
        sys.exit(child_main())
    parent_main()


if __name__ == "__main__":
    main()
