"""Multi-chip dry run: the full pipeline step jitted over an n-device mesh.

This is the driver-checked proof that the multi-chip sharding compiles and
executes (SURVEY.md §5.8). The sharding layout mirrors the reference's unit
of parallelism — independent symbols fanned over pool workers
(src/interpolation/batch_processor.py:234-239) — realised as SPMD data
parallelism: the surface/symbol batch dim shards over the ``data`` axis and
the expiry dim over ``slice``; global diagnostics reduce with ``psum`` over
both axes.

``run(n)`` assumes the calling process already has >= n devices (the test
suite provisions 8 virtual CPU devices in conftest). ``__graft_entry__.
dryrun_multichip`` spawns this module in a subprocess with
``JAX_PLATFORMS=cpu`` + ``--xla_force_host_platform_device_count`` so the
dry run never depends on ambient device enumeration (the round-1 failure
mode: inheriting a mis-matched-libtpu TPU platform).

Beyond compiling and executing, ``run`` asserts numerical parity of the
sharded step against the identical math run unsharded on one device.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def _example_batch(B=256, E=30, n=50, dtype=jnp.float32):
    k = jnp.broadcast_to(jnp.linspace(-1.0, 1.0, n, dtype=dtype), (B, E, n))
    T = jnp.broadcast_to(jnp.linspace(0.05, 2.0, E, dtype=dtype), (B, E))
    iv = 0.2 + 0.1 * k * k + 0.02 * jnp.sin(
        jnp.arange(B, dtype=dtype)[:, None, None]
    )
    return k, iv, T


def _step_local(k, iv, T, gappy, keys, *, L, n_grid):
    """One full pipeline step (interpolate -> bridge -> candles ->
    surface fit/eval), shard-local math with *local* reductions. The
    sharded wrapper psums the reductions; the single-device oracle sums
    them directly."""
    from iv_interpolation_tpu.ops.bridge import synthesize_ohlcv
    from iv_interpolation_tpu.ops.interp import masked_interp
    from iv_interpolation_tpu.ops.segment_ohlcv import aggregate_ohlcv
    from iv_interpolation_tpu.surface.surface import fit_eval_surface

    # Task 1: masked interpolation of the gappy series
    filled = masked_interp(gappy, jnp.ones_like(gappy, bool))
    # Bridge: synthetic candles per symbol (counter-based PRNG keys)
    cnd = jax.vmap(
        lambda p, key: synthesize_ohlcv(
            p, jnp.full(p.shape, jnp.nan, p.dtype),
            jnp.isfinite(p), key)
    )(filled, keys)
    # Task 2: 5-minute aggregation per symbol
    agg = jax.vmap(
        lambda o, h, l, c, v, ok: aggregate_ohlcv(
            jnp.arange(L), o, h, l, c, v, ok,
            jnp.int32(5), jnp.int32(0),
            num_segments=L // 5 + 1, min_count=5, assume_sorted=True)
    )(cnd["open"], cnd["high"], cnd["low"], cnd["close"],
      cnd["volume"], cnd["valid"])
    # Surface engine: fit + eval + arbitrage diagnostics
    out = fit_eval_surface(k, iv, T, method="cubic_spline", n_grid=n_grid)
    n_bad_local = jnp.sum(~out["butterfly_ok"])
    vol_local = jnp.sum(jnp.where(agg.valid, agg.volume, 0.0))
    return out["w_grid"], n_bad_local, vol_local


def run(n_devices: int) -> None:
    """Build an n-device mesh, jit the full sharded pipeline step, run one
    step on tiny shapes, and assert parity vs the unsharded step."""
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    from iv_interpolation_tpu.parallel.mesh import make_mesh

    devices = jax.devices()
    if len(devices) < n_devices:
        raise RuntimeError(
            f"need {n_devices} devices, have {len(devices)} "
            f"(platform={devices[0].platform}); run via "
            f"__graft_entry__.dryrun_multichip which provisions a virtual "
            f"CPU mesh")

    # factor n_devices into (data, slice), using only the first n devices
    d_slice = 2 if n_devices % 2 == 0 else 1
    d_data = n_devices // d_slice
    mesh = make_mesh((d_data, d_slice), ("data", "slice"),
                     devices=devices[:n_devices])

    # tiny but real shapes: per-shard B and E stay >= 1
    B = 4 * d_data
    E = 6 * d_slice
    n_k = 16
    L = 64            # minutes of market data per symbol
    n_sym = B

    k, iv, T = _example_batch(B=B, E=E, n=n_k)

    # market-data leg inputs: (n_sym, L) gappy IV/price series
    rng = np.random.default_rng(0)
    prices = jnp.asarray(
        20000 + np.cumsum(rng.normal(size=(n_sym, L)), axis=-1), jnp.float32
    )
    gaps = jnp.asarray(rng.uniform(size=(n_sym, L)) < 0.5)
    gappy = jnp.where(gaps, prices, jnp.nan)
    keys = jax.vmap(jax.random.fold_in, (None, 0))(
        jax.random.key(0), jnp.arange(n_sym)
    )

    data_spec = P("data")
    surf_spec = P("data", "slice", None)
    exp_spec = P("data", "slice")

    def step(k, iv, T, gappy, keys):
        w_grid, n_bad, vol = _step_local(k, iv, T, gappy, keys,
                                         L=L, n_grid=n_k)
        # global reductions ride the mesh: the surface diagnostic varies
        # over both axes (psum both); the candle leg's inputs shard only
        # over 'data' (replicated across 'slice'), so vol psums over
        # 'data' alone — summing over 'slice' too would double-count
        n_bad = jax.lax.psum(jax.lax.psum(n_bad, "data"), "slice")
        vol = jax.lax.psum(vol, "data")
        return w_grid, n_bad, vol

    sharded_step = shard_map(
        step, mesh=mesh,
        in_specs=(surf_spec, surf_spec, exp_spec, data_spec, data_spec),
        out_specs=(surf_spec, P(), P()),
    )
    jitted = jax.jit(sharded_step)
    w_grid, n_bad, vol = jitted(k, iv, T, gappy, keys)
    jax.block_until_ready((w_grid, n_bad, vol))
    assert w_grid.shape == (B, E, n_k), w_grid.shape
    assert jnp.isfinite(vol), "volume reduction produced non-finite value"

    # numerical parity: same math, one device, no mesh
    ref_w, ref_bad, ref_vol = jax.jit(
        lambda *a: _step_local(*a, L=L, n_grid=n_k))(k, iv, T, gappy, keys)
    np.testing.assert_allclose(np.asarray(w_grid), np.asarray(ref_w),
                               rtol=1e-5, atol=1e-6)
    assert int(n_bad) == int(ref_bad), (int(n_bad), int(ref_bad))
    np.testing.assert_allclose(float(vol), float(ref_vol), rtol=1e-5)

    print(f"dryrun_multichip ok: mesh=({d_data}x{d_slice}) "
          f"platform={devices[0].platform} w_grid={w_grid.shape} "
          f"bad_surfaces={int(n_bad)} total_volume={float(vol):.1f} "
          f"parity_vs_single_device=PASS")


def main(argv=None) -> None:
    import sys

    args = argv if argv is not None else sys.argv[1:]
    run(int(args[0]) if args else 8)


if __name__ == "__main__":
    main()
