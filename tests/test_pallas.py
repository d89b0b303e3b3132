"""Pallas kernel tests (interpreter mode on the CPU suite; the same
kernels compile natively on TPU — exercised by bench/verify drives)."""

import jax.numpy as jnp
import numpy as np
import pytest
from scipy.linalg import solve_banded

from iv_interpolation_tpu.ops.pallas.tridiag_pallas import tridiag_solve_pallas
from iv_interpolation_tpu.ops.tridiag import tridiag_solve


def _scipy_solve(dl, d, du, b):
    n = len(d)
    ab = np.zeros((3, n))
    ab[0, 1:] = du[:-1]
    ab[1, :] = d
    ab[2, :-1] = dl[1:]
    return solve_banded((1, 1), ab, b)


@pytest.mark.parametrize("n,batch", [(50, 64), (7, 3), (50, 1024)])
def test_matches_scipy_and_scan(rng, n, batch):
    d = rng.uniform(4.0, 6.0, (n, batch)).astype(np.float32)
    dl = rng.uniform(-1.0, 1.0, (n, batch)).astype(np.float32)
    du = rng.uniform(-1.0, 1.0, (n, batch)).astype(np.float32)
    b = rng.normal(size=(n, batch)).astype(np.float32)
    x = np.asarray(tridiag_solve_pallas(
        *map(jnp.asarray, (dl, d, du, b)), interpret=True))
    x_scan = np.asarray(tridiag_solve(*map(jnp.asarray, (dl, d, du, b))))
    np.testing.assert_allclose(x, x_scan, atol=1e-5)
    for j in range(0, batch, max(1, batch // 7)):
        ref = _scipy_solve(dl[:, j].astype(np.float64),
                           d[:, j].astype(np.float64),
                           du[:, j].astype(np.float64),
                           b[:, j].astype(np.float64))
        np.testing.assert_allclose(x[:, j], ref, atol=1e-4)


def test_multidim_batch(rng):
    n, b1, b2 = 20, 6, 9
    d = rng.uniform(4.0, 6.0, (n, b1, b2))
    dl = rng.uniform(-1.0, 1.0, (n, b1, b2))
    du = rng.uniform(-1.0, 1.0, (n, b1, b2))
    b = rng.normal(size=(n, b1, b2))
    x = np.asarray(tridiag_solve_pallas(
        *map(jnp.asarray, (dl, d, du, b)), interpret=True))
    x_scan = np.asarray(tridiag_solve(*map(jnp.asarray, (dl, d, du, b))))
    np.testing.assert_allclose(x, x_scan, atol=1e-10)


def test_stream_agg_pallas_matches_xla(rng):
    """Fused Pallas bucket-aggregation kernel (interpret mode on CPU) ==
    the XLA segment-reduction path on every Candles field. Volume is a
    direct f32 masked sum in the kernel but a cumsum DIFFERENCE in the
    XLA sorted fallback (abs err ~ eps * window total — see
    test_volume_accuracy_vs_f64_oracle), so it is compared at f32
    tolerance; everything else must be exact (open/close/high/low are
    selections, count is integer)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from iv_interpolation_tpu.ops.pallas.stream_agg_pallas import (
        aggregate_ohlcv_pallas)
    from iv_interpolation_tpu.ops.segment_ohlcv import aggregate_ohlcv

    B, L, ns = 4, 512, 100
    minute = np.sort(rng.integers(0, ns * 5, (B, L)).astype(np.int32),
                     axis=-1)
    o = rng.normal(100, 1, (B, L)).astype(np.float32)
    h = o + rng.uniform(0, 1, (B, L)).astype(np.float32)
    l = o - rng.uniform(0, 1, (B, L)).astype(np.float32)
    c = o + rng.normal(0, 0.5, (B, L)).astype(np.float32)
    v = rng.uniform(0, 5, (B, L)).astype(np.float32)
    valid = rng.random((B, L)) > 0.1

    ref = jax.vmap(lambda m, oo, hh, ll, cc, vv, ok: aggregate_ohlcv(
        m, oo, hh, ll, cc, vv, ok, jnp.int32(5), jnp.int32(0),
        num_segments=ns, min_count=3))(
        jnp.asarray(minute), jnp.asarray(o), jnp.asarray(h),
        jnp.asarray(l), jnp.asarray(c), jnp.asarray(v),
        jnp.asarray(valid))
    got = aggregate_ohlcv_pallas(
        jnp.asarray(minute), jnp.asarray(o), jnp.asarray(h),
        jnp.asarray(l), jnp.asarray(c), jnp.asarray(v),
        jnp.asarray(valid), bucket_minutes=5, num_segments=ns,
        min_count=3, interpret=True)
    for f in ("open", "high", "low", "close", "count", "valid"):
        np.testing.assert_array_equal(
            np.asarray(getattr(ref, f)), np.asarray(getattr(got, f)),
            err_msg=f)
    np.testing.assert_allclose(np.asarray(got.volume),
                               np.asarray(ref.volume), rtol=1e-5,
                               atol=1e-4)


def test_stream_agg_pallas_unsorted_minmax(rng):
    """The equality-mask kernel needs NO sort for high/low/volume/count
    (unlike the XLA sorted path): shuffled rows give identical
    reductions; open/close follow the row-position rule by contract."""
    import jax.numpy as jnp
    import numpy as np
    from iv_interpolation_tpu.ops.pallas.stream_agg_pallas import (
        aggregate_ohlcv_pallas)

    B, L, ns = 2, 256, 64
    minute = rng.integers(0, ns, (B, L)).astype(np.int32)  # unsorted
    p = rng.normal(100, 1, (B, L)).astype(np.float32)
    v = rng.uniform(0, 5, (B, L)).astype(np.float32)
    valid = np.ones((B, L), bool)
    got = aggregate_ohlcv_pallas(
        jnp.asarray(minute), jnp.asarray(p), jnp.asarray(p),
        jnp.asarray(p), jnp.asarray(p), jnp.asarray(v),
        jnp.asarray(valid), bucket_minutes=1, num_segments=ns,
        min_count=1, interpret=True)
    # oracle per bucket with numpy
    for b in range(B):
        for j in (0, ns // 2, ns - 1):
            rows = np.flatnonzero(minute[b] == j)
            if len(rows) == 0:
                assert not bool(got.valid[b, j])
                continue
            assert np.isclose(float(got.high[b, j]), p[b, rows].max())
            assert np.isclose(float(got.low[b, j]), p[b, rows].min())
            assert np.isclose(float(got.volume[b, j]), v[b, rows].sum(),
                              rtol=1e-5)
            assert int(got.count[b, j]) == len(rows)
            assert np.isclose(float(got.open[b, j]), p[b, rows[0]])
            assert np.isclose(float(got.close[b, j]), p[b, rows[-1]])


def test_stream_agg_pallas_nan_in_invalid_rows(rng):
    """Invalid rows may carry anything — including NaN/Inf sizes and
    prices (the aggregate_ohlcv contract). The kernel must zero invalid
    rows' values before the volume dot: NaN * 0 = NaN would otherwise
    poison every bucket in the tile (regression: round-3 review)."""
    import jax.numpy as jnp
    import numpy as np
    from iv_interpolation_tpu.ops.pallas.stream_agg_pallas import (
        aggregate_ohlcv_pallas)

    B, L, ns = 2, 128, 32
    minute = rng.integers(0, ns, (B, L)).astype(np.int32)
    p = rng.normal(100, 1, (B, L)).astype(np.float32)
    v = rng.uniform(0, 5, (B, L)).astype(np.float32)
    valid = rng.random((B, L)) > 0.3
    p_bad, v_bad = p.copy(), v.copy()
    p_bad[~valid] = np.nan
    v_bad[~valid] = np.nan
    v_bad[0, np.flatnonzero(~valid[0])[:1]] = np.inf

    got = aggregate_ohlcv_pallas(
        jnp.asarray(minute), jnp.asarray(p_bad), jnp.asarray(p_bad),
        jnp.asarray(p_bad), jnp.asarray(p_bad), jnp.asarray(v_bad),
        jnp.asarray(valid), bucket_minutes=1, num_segments=ns,
        min_count=1, interpret=True)
    clean = aggregate_ohlcv_pallas(
        jnp.asarray(minute), jnp.asarray(p), jnp.asarray(p),
        jnp.asarray(p), jnp.asarray(p), jnp.asarray(v),
        jnp.asarray(valid), bucket_minutes=1, num_segments=ns,
        min_count=1, interpret=True)
    nonempty = np.asarray(clean.count) > 0
    for f in ("open", "high", "low", "close", "volume"):
        a, b = np.asarray(getattr(got, f)), np.asarray(getattr(clean, f))
        np.testing.assert_allclose(a[nonempty], b[nonempty], rtol=1e-6,
                                   err_msg=f)
        assert np.isfinite(a[nonempty]).all(), f


def test_volume_accuracy_vs_f64_oracle(rng):
    """Bucket-volume accuracy ordering, pinned against the f64 oracle.

    The XLA sorted fallback computes volume as a difference of two f32
    window-prefix values, so its ABSOLUTE error scales with the window
    running total (~eps * sum|v|) — a large RELATIVE error on near-empty
    buckets late in a long window (measured 0.14 rel at L=4096 on TPU,
    verify drive 2026-08-17). The Pallas kernel sums each bucket
    directly and must stay at f32 eps of the oracle; the fallback must
    stay within its documented eps * total bound."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from iv_interpolation_tpu.ops.pallas.stream_agg_pallas import (
        aggregate_ohlcv_pallas)
    from iv_interpolation_tpu.ops.segment_ohlcv import aggregate_ohlcv

    B, L, ns = 2, 4096, 512
    minute = np.sort(rng.integers(0, ns * 5, (B, L)).astype(np.int32), -1)
    p = rng.normal(100, 1, (B, L)).astype(np.float32)
    v = rng.uniform(0, 5, (B, L)).astype(np.float32)
    # make some LATE buckets tiny: zero out most sizes in the last fifth
    tail = slice(int(0.8 * L), None)
    v[:, tail] *= (rng.random((B, L - int(0.8 * L))) > 0.95) * 1e-3
    valid = rng.random((B, L)) > 0.1
    args = tuple(jnp.asarray(a) for a in
                 (minute, p, p, p, p, v, valid))

    pal = aggregate_ohlcv_pallas(*args, bucket_minutes=5,
                                 num_segments=ns, min_count=1,
                                 interpret=True)
    ref = jax.vmap(lambda m, oo, hh, ll, cc, vv, ok: aggregate_ohlcv(
        m, oo, hh, ll, cc, vv, ok, jnp.int32(5), jnp.int32(0),
        num_segments=ns, min_count=1, assume_sorted=True))(*args)

    # f64 oracle
    seg = minute // 5
    oracle = np.zeros((B, ns))
    for b in range(B):
        for s in range(ns):
            rows = (seg[b] == s) & valid[b]
            oracle[b, s] = v[b][rows].astype(np.float64).sum()
    nonempty = np.asarray(pal.count) > 0
    err_pal = np.abs(np.asarray(pal.volume) - oracle)[nonempty]
    err_ref = np.abs(np.asarray(ref.volume) - oracle)[nonempty]
    total = np.abs(v[valid]).sum() / B   # per-row window running total
    assert err_pal.max() < 1e-4, err_pal.max()           # direct f32 sum
    assert err_ref.max() < 4e-7 * total + 1e-5, err_ref.max()  # cumsum bound
    assert err_pal.max() <= err_ref.max() + 1e-6          # ordering


def test_stream_agg_pallas_chunked_tick_axis(rng):
    """The tick axis is chunked at ``l_tile`` rows per grid step so VMEM
    stays bounded for long windows (L=8192 blew the 100 MB scoped limit
    unchunked — found by examples/quickstart.py). Forcing several small
    chunks that straddle bucket boundaries must reproduce the unchunked
    kernel exactly, including the cross-chunk open (first chunk that saw
    the bucket wins) and close (last chunk wins) hand-off and buckets
    whose rows are split across 3+ chunks."""
    import jax.numpy as jnp
    import numpy as np
    from iv_interpolation_tpu.ops.pallas.stream_agg_pallas import (
        aggregate_ohlcv_pallas)

    B, L, ns = 4, 1000, 40  # L deliberately not a multiple of l_tile
    # sorted minutes: every bucket's rows straddle the 128-row chunk
    # boundary somewhere in the batch
    minute = np.sort(rng.integers(0, ns * 5, (B, L)).astype(np.int32),
                     axis=-1)
    o = rng.normal(100, 1, (B, L)).astype(np.float32)
    h = o + rng.uniform(0, 1, (B, L)).astype(np.float32)
    l = o - rng.uniform(0, 1, (B, L)).astype(np.float32)
    c = o + rng.normal(0, 0.5, (B, L)).astype(np.float32)
    v = rng.uniform(0, 5, (B, L)).astype(np.float32)
    valid = rng.random((B, L)) > 0.2

    args = (jnp.asarray(minute), jnp.asarray(o), jnp.asarray(h),
            jnp.asarray(l), jnp.asarray(c), jnp.asarray(v),
            jnp.asarray(valid))
    kw = dict(bucket_minutes=5, num_segments=ns, min_count=3,
              interpret=True)
    one = aggregate_ohlcv_pallas(*args, **kw)            # single chunk
    many = aggregate_ohlcv_pallas(*args, l_tile=128, **kw)  # 8 chunks
    for f in ("open", "high", "low", "close", "count", "valid"):
        np.testing.assert_array_equal(
            np.asarray(getattr(one, f)), np.asarray(getattr(many, f)),
            err_msg=f)
    np.testing.assert_allclose(np.asarray(many.volume),
                               np.asarray(one.volume), rtol=1e-6)
    with pytest.raises(ValueError):
        aggregate_ohlcv_pallas(*args, l_tile=0, **kw)


@pytest.mark.slow
def test_stream_agg_pallas_balanced_default_chunks(rng):
    """A window just over _L_TILE splits into BALANCED chunks (4224 ->
    2x2176) instead of 4096 + a 128-row tail padded to 4096 (~94%
    wasted passes — round-3 review finding). Checked by parity against
    an explicit single-chunk run at the same shapes."""
    import jax.numpy as jnp
    import numpy as np
    from iv_interpolation_tpu.ops.pallas.stream_agg_pallas import (
        aggregate_ohlcv_pallas)

    B, L, ns = 2, 4224, 64
    minute = np.sort(rng.integers(0, ns * 5, (B, L)).astype(np.int32), -1)
    p = rng.normal(100, 1, (B, L)).astype(np.float32)
    v = rng.uniform(0, 5, (B, L)).astype(np.float32)
    valid = rng.random((B, L)) > 0.1
    args = tuple(jnp.asarray(a) for a in (minute, p, p, p, p, v, valid))
    kw = dict(bucket_minutes=5, num_segments=ns, min_count=1,
              interpret=True)
    auto = aggregate_ohlcv_pallas(*args, **kw)             # 2x2176
    ref = aggregate_ohlcv_pallas(*args, l_tile=4224, **kw)  # one chunk
    # explicit l_tile is rounded up to the 128-lane multiple Mosaic
    # needs (200 -> 256) and must agree as well
    odd = aggregate_ohlcv_pallas(*args, l_tile=200, **kw)
    for f in ("open", "high", "low", "close", "count", "valid"):
        np.testing.assert_array_equal(
            np.asarray(getattr(auto, f)), np.asarray(getattr(ref, f)),
            err_msg=f)
        np.testing.assert_array_equal(
            np.asarray(getattr(auto, f)), np.asarray(getattr(odd, f)),
            err_msg=f"{f} (l_tile=200)")
    np.testing.assert_allclose(np.asarray(auto.volume),
                               np.asarray(ref.volume), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(odd.volume),
                               np.asarray(ref.volume), rtol=1e-6)


_MOSAIC_DRIVE = r'''
"""Mosaic-compiled (interpret=False) Pallas kernels on the real chip,
vs pure-numpy f64 oracles. Spawned by test_mosaic_compiled_on_tpu."""
import time

import numpy as np
import jax
import jax.numpy as jnp

assert jax.default_backend() == "tpu", jax.default_backend()
print("device:", jax.devices()[0], flush=True)
rng = np.random.default_rng(time.time_ns() % 2**31)

# -- tridiag: Thomas in f64 as oracle ---------------------------------
from iv_interpolation_tpu.ops.pallas.tridiag_pallas import (
    tridiag_solve_pallas)

n, batch = 50, 1024
d = rng.uniform(4.0, 6.0, (n, batch)).astype(np.float32)
dl = rng.uniform(-1.0, 1.0, (n, batch)).astype(np.float32)
du = rng.uniform(-1.0, 1.0, (n, batch)).astype(np.float32)
b = rng.normal(size=(n, batch)).astype(np.float32)
x = np.asarray(tridiag_solve_pallas(
    *map(jnp.asarray, (dl, d, du, b)), interpret=False))

d64, dl64, du64, b64 = (a.astype(np.float64) for a in (d, dl, du, b))
cp = np.zeros_like(d64)
dp = np.zeros_like(d64)
cp[0] = du64[0] / d64[0]
dp[0] = b64[0] / d64[0]
for i in range(1, n):
    m = d64[i] - dl64[i] * cp[i - 1]
    cp[i] = du64[i] / m
    dp[i] = (b64[i] - dl64[i] * dp[i - 1]) / m
ref = np.zeros_like(d64)
ref[-1] = dp[-1]
for i in range(n - 2, -1, -1):
    ref[i] = dp[i] - cp[i] * ref[i + 1]
np.testing.assert_allclose(x, ref, atol=1e-4)
print("tridiag mosaic vs f64 Thomas: PASS", flush=True)

# -- stream agg: direct masked f64 reductions as oracle ---------------
from iv_interpolation_tpu.ops.pallas.stream_agg_pallas import (
    aggregate_ohlcv_pallas)

B, L, ns, bm, mc = 8, 4096, 512, 5, 3
minute = np.sort(rng.integers(0, ns * bm, (B, L)).astype(np.int32), -1)
o = rng.normal(100, 1, (B, L)).astype(np.float32)
h = o + rng.uniform(0, 1, (B, L)).astype(np.float32)
l = o - rng.uniform(0, 1, (B, L)).astype(np.float32)
c = o + rng.normal(0, 0.5, (B, L)).astype(np.float32)
v = rng.uniform(0, 5, (B, L)).astype(np.float32)
valid = rng.random((B, L)) > 0.1

got = aggregate_ohlcv_pallas(
    *map(jnp.asarray, (minute, o, h, l, c, v, valid)),
    bucket_minutes=bm, num_segments=ns, min_count=mc, interpret=False)
got = jax.tree.map(np.asarray, got)

seg = minute // bm
for bi in range(B):
    for s in range(0, ns, 7):          # sample segments
        rows = np.flatnonzero((seg[bi] == s) & valid[bi])
        cnt = len(rows)
        assert got.count[bi, s] == cnt, (bi, s, got.count[bi, s], cnt)
        assert got.valid[bi, s] == (cnt >= mc)
        if cnt == 0:
            continue
        assert got.open[bi, s] == o[bi, rows[0]]
        assert got.close[bi, s] == c[bi, rows[-1]]
        assert got.high[bi, s] == h[bi, rows].max()
        assert got.low[bi, s] == l[bi, rows].min()
        vol64 = v[bi, rows].astype(np.float64).sum()
        np.testing.assert_allclose(got.volume[bi, s], vol64,
                                   rtol=1e-5, atol=1e-4)
print("stream agg mosaic vs f64 reductions: PASS", flush=True)
print("MOSAIC_PASS", flush=True)
'''


@pytest.mark.tpu
@pytest.mark.slow
def test_mosaic_compiled_on_tpu(tmp_path):
    """Compiled (interpret=False) Mosaic runs of BOTH Pallas kernels on
    the real chip against pure-numpy f64 oracles — the interpret-mode
    suite cannot see Mosaic-only regressions (VMEM limits, tile shapes;
    round-3 verdict item 8). Explicitly gated: run with
    `IVTPU_RUN_TPU_TESTS=1 pytest -m tpu -o addopts=""` (the verify
    flow's real-chip lane). Spawns a subprocess so the suite's forced
    CPU platform and x64 mode don't leak into the Mosaic compile."""
    import os
    import subprocess
    import sys
    if os.environ.get("IVTPU_RUN_TPU_TESTS") != "1":
        pytest.skip("real-chip lane: set IVTPU_RUN_TPU_TESTS=1")
    script = tmp_path / "mosaic_drive.py"
    script.write_text(_MOSAIC_DRIVE)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)        # let the axon plugin win
    env.pop("XLA_FLAGS", None)            # no virtual-CPU device count
    env["PYTHONPATH"] = os.pathsep.join(
        p for p in (repo, "/root/.axon_site",
                    env.get("PYTHONPATH", "")) if p)
    r = subprocess.run([sys.executable, "-u", str(script)], env=env,
                       capture_output=True, text=True, timeout=560)
    assert r.returncode == 0 and "MOSAIC_PASS" in r.stdout, (
        f"rc={r.returncode}\nstdout:\n{r.stdout[-2000:]}\n"
        f"stderr:\n{r.stderr[-2000:]}")
