"""Pallas fused bucket-aggregation kernel for the streaming stage-1 path.

Motivation (docs/PERF.md, round-2): the XLA sorted-path aggregation
(``ops.segment_ohlcv._aggregate_sorted``) spends ~150 ms of the
streaming step across four sparse-table range-reduction passes plus
boundary compare-reduces and gathers — each materialising grid-sized
intermediates in HBM with fused-op overhead near the relay's dispatch
floor. This kernel collapses the whole per-underlying reduction into ONE
``pallas_call``: every (underlying, bucket-tile) program holds the tick
row in VMEM and produces all seven per-bucket outputs with no HBM
intermediates at all.

Design (per program = one underlying x one 128-bucket output tile):
  * bucket membership is an EQUALITY mask ``seg[:, None] == ids[None, :]``
    on a (L, 128) VMEM tile — no scatter, no sort requirement for
    max/min/sum (the row-position first/last rule matches
    ``aggregate_ohlcv``'s semantics, which already require valid rows
    time-sorted for open/close to mean anything);
  * high/low/volume = masked max/min/sum reductions over the tick axis
    (VPU — exact f32; an MXU mask-matmul for volume loses ~1e-3 to
    default bf16 operand rounding, see docs/PERF.md);
  * count = mask-matmul contraction (MXU, exact for 0/1 operands);
  * open/close = one extra masked reduction against the per-bucket
    first/last row offset (argmin/argmax by row position).

Cost: ~8 passes over a (L_TILE, 128) tile per program — all
VMEM-resident. The tick axis is CHUNKED at ``_L_TILE`` rows per grid
step (innermost grid dim, output tile stays resident and accumulates),
so VMEM use is bounded regardless of how long the tick window grows:
an unchunked kernel scales its live tiles with L and at L=8192 the
8-row unrolled body blew the 100 MB scoped-vmem limit (103.29M, found
by the quickstart; v5e VMEM is 128 MB total, so no limit bump can make
an L-proportional footprint safe).

Incomplete-bucket masking and NaN fill stay outside the kernel (cheap
elementwise jnp, reference core.py:85-89 semantics preserved by the
caller ``aggregate_ohlcv_pallas``).

Reference analogue: pandas groupby first/max/min/last/sum
(src/candle_reconstruction/core.py:73-80) — here as a TPU kernel.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from iv_interpolation_tpu.ops.segment_ohlcv import Candles

_MAX_TILE = 512  # output buckets per program: wider tiles amortise
                 # per-program overhead (measured 91 -> 50 ms for the
                 # 1024x4096->512 stage going 128 -> 512 lanes)
_ROWS = 8        # underlyings per program (Mosaic sublane minimum, f32)
_L_TILE = 4096   # tick rows per grid step: bounds live VMEM tiles at
                 # (4096, 512) f32 regardless of the window length L
                 # (the bench shape runs in one chunk, so the measured
                 # 19.8k und/s path is unchanged)


def _agg_kernel(minute_ref, o_ref, h_ref, l_ref, c_ref, v_ref, ok_ref,
                open_ref, high_ref, low_ref, close_ref, vol_ref, cnt_ref,
                *, bucket_minutes: int, base_bucket: int,
                tile: int, n_chunks: int):
    # NOTE: the kernel needs no num_segments range check — out-of-range
    # bucket ids only land in the padded ns_pad tail, which the wrapper
    # slices off.
    j = pl.program_id(1)
    L = minute_ref.shape[1]
    ids = j * tile + jax.lax.broadcasted_iota(jnp.int32, (1, tile), 1)
    offs = jax.lax.broadcasted_iota(jnp.int32, (L, 1), 0)
    big = jnp.float32(3.4e38)
    bigi = jnp.int32(2**30)
    ones = jnp.ones((1, L), jnp.float32)

    # the tick axis is the INNERMOST grid dim: the output tile (b, j)
    # stays VMEM-resident across its chunks and accumulates. n_chunks
    # is static, so the single-chunk case (the 1024x4096->512 bench
    # shape) compiles to the exact pre-chunking straight-line body —
    # no init pass, no accumulator reads.
    if n_chunks > 1:
        @pl.when(pl.program_id(2) == 0)
        def _init():
            for r in range(_ROWS):
                open_ref[r, :] = jnp.zeros((tile,), jnp.float32)
                close_ref[r, :] = jnp.zeros((tile,), jnp.float32)
                high_ref[r, :] = jnp.full((tile,), -big, jnp.float32)
                low_ref[r, :] = jnp.full((tile,), big, jnp.float32)
                vol_ref[r, :] = jnp.zeros((tile,), jnp.float32)
                cnt_ref[r, :] = jnp.zeros((tile,), jnp.int32)

    # Mosaic requires >=8 sublanes per block, so each program reduces 8
    # underlyings; the row loop is static and unrolls into straight-line
    # vector code over (L_TILE, TILE) tiles
    for r in range(_ROWS):
        # reshape only 32-bit vectors (Mosaic cannot reshape i1 masks);
        # out-of-range seg values can only match ids in the padded
        # output tail, which the caller slices off, so the equality
        # against in-tile ids doubles as the range check
        seg = (minute_ref[r, :] // bucket_minutes
               - base_bucket).reshape(L, 1)                     # (L, 1)
        okc = ok_ref[r, :].reshape(L, 1)
        mask = (seg == ids) & (okc != 0)                        # (L, TILE)
        maskf = mask.astype(jnp.float32)

        h = h_ref[r, :].reshape(L, 1)
        l = l_ref[r, :].reshape(L, 1)
        chunk_high = jnp.max(jnp.where(mask, h, -big), axis=0)
        chunk_low = jnp.min(jnp.where(mask, l, big), axis=0)
        if n_chunks > 1:
            chunk_high = jnp.maximum(high_ref[r, :], chunk_high)
            chunk_low = jnp.minimum(low_ref[r, :], chunk_low)
        high_ref[r, :] = chunk_high
        low_ref[r, :] = chunk_low

        # volume: exact-f32 VPU masked sum, NOT an MXU dot — the MXU's
        # default bf16 operand rounding costs ~1e-3 relative error on
        # summed tick sizes (measured on chip vs the XLA segment-sum
        # path), and masking via where() also keeps NaN/Inf payloads in
        # invalid rows (allowed by the aggregate_ohlcv contract) out of
        # the sum, where a maskf multiply would poison it (NaN*0=NaN)
        v = v_ref[r, :].reshape(L, 1)
        chunk_vol = jnp.sum(jnp.where(mask, v, 0.0), axis=0)
        if n_chunks > 1:
            chunk_vol = vol_ref[r, :] + chunk_vol
        vol_ref[r, :] = chunk_vol
        # count stays an MXU contraction: 0/1 products are exact in
        # bf16 and accumulate in f32
        cnt = jnp.dot(ones, maskf,
                      preferred_element_type=jnp.float32)[0]
        chunk_cnt = cnt.astype(jnp.int32)
        cnt_prev = (cnt_ref[r, :] if n_chunks > 1
                    else jnp.zeros((tile,), jnp.int32))
        cnt_ref[r, :] = cnt_prev + chunk_cnt

        # first/last valid row per bucket by ROW POSITION (within this
        # chunk), then one more masked reduction selects that row's
        # open/close; across chunks, open keeps the FIRST chunk that saw
        # the bucket (cnt_prev == 0) and close the LAST (any valid row)
        first = jnp.min(jnp.where(mask, offs, bigi), axis=0)    # (tile,)
        last = jnp.max(jnp.where(mask, offs, -1), axis=0)
        sel_first = mask & (offs == first.reshape(1, tile))
        sel_last = mask & (offs == last.reshape(1, tile))
        o = o_ref[r, :].reshape(L, 1)
        c = c_ref[r, :].reshape(L, 1)
        chunk_open = jnp.sum(jnp.where(sel_first, o, 0.0), axis=0)
        chunk_close = jnp.sum(jnp.where(sel_last, c, 0.0), axis=0)
        if n_chunks > 1:
            seen = chunk_cnt > 0
            chunk_open = jnp.where(seen & (cnt_prev == 0), chunk_open,
                                   open_ref[r, :])
            chunk_close = jnp.where(seen, chunk_close, close_ref[r, :])
        open_ref[r, :] = chunk_open
        close_ref[r, :] = chunk_close


@functools.partial(jax.jit, static_argnames=(
    "num_segments", "min_count", "bucket_minutes", "base_bucket",
    "interpret", "l_tile"))
def aggregate_ohlcv_pallas(minutes: jax.Array, o: jax.Array, h: jax.Array,
                           l: jax.Array, c: jax.Array, v: jax.Array,
                           valid: jax.Array, *, bucket_minutes: int,
                           base_bucket: int = 0, num_segments: int,
                           min_count: int,
                           interpret: bool | None = None,
                           l_tile: int | None = None) -> Candles:
    """Batched OHLCV bucket aggregation as one Pallas kernel.

    Same contract as ``ops.segment_ohlcv.aggregate_ohlcv`` but batched
    over a leading underlying axis and with static ``bucket_minutes`` /
    ``base_bucket`` (the streaming pipeline's configuration — sessions
    fix both): all arrays ``(B, L)``, outputs ``(B, num_segments)``.
    ``interpret=True`` runs the kernel in the Pallas interpreter
    (default: auto — interpreter everywhere except a real TPU backend,
    so the CPU test suite exercises the same code path).

    ``l_tile`` (rows per tick-axis grid step) bounds live VMEM tiles at
    (l_tile, 512) f32 regardless of the window length. Default: windows
    split into the fewest chunks of <= _L_TILE rows, then BALANCED so a
    window of 4224 rows runs as 2x2176 instead of 4096+padding (~94%
    wasted passes on the tail chunk otherwise). An explicit value is
    rounded up to the 128-lane multiple Mosaic requires and is a
    jit-static recompile trigger — it exists for tests and for tuning
    the VMEM/overhead trade on other chip generations.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    B, L = minutes.shape
    if L < 1:
        raise ValueError(f"empty tick window: L={L}")
    ceil128 = lambda v: (v + 127) // 128 * 128
    B_pad = (B + _ROWS - 1) // _ROWS * _ROWS
    if l_tile is not None:
        if l_tile < 1:
            raise ValueError(f"l_tile must be positive, got {l_tile}")
        l_tile = min(ceil128(l_tile), ceil128(L))
    else:
        n_chunks = -(-L // _L_TILE)
        l_tile = ceil128(-(-L // n_chunks))
    L_pad = (L + l_tile - 1) // l_tile * l_tile
    ns128 = ceil128(num_segments)
    tile = min(_MAX_TILE, ns128)
    ns_pad = (num_segments + tile - 1) // tile * tile
    f32 = jnp.float32
    kernel = functools.partial(
        _agg_kernel, bucket_minutes=bucket_minutes,
        base_bucket=base_bucket, tile=tile,
        n_chunks=L_pad // l_tile)

    def pad2(a, fill):
        if B_pad == B and L_pad == L:
            return a
        return jnp.pad(a, ((0, B_pad - B), (0, L_pad - L)),
                       constant_values=fill)

    row = pl.BlockSpec((_ROWS, l_tile), lambda b, j, k: (b, k),
                       memory_space=pltpu.VMEM)
    out_tile = pl.BlockSpec((_ROWS, tile), lambda b, j, k: (b, j),
                            memory_space=pltpu.VMEM)
    out_shape = [jax.ShapeDtypeStruct((B_pad, ns_pad), f32)
                 for _ in range(5)]
    out_shape.append(jax.ShapeDtypeStruct((B_pad, ns_pad), jnp.int32))
    outs = pl.pallas_call(
        kernel,
        grid=(B_pad // _ROWS, ns_pad // tile, L_pad // l_tile),
        in_specs=[row] * 7,
        out_specs=[out_tile] * 6,
        out_shape=out_shape,
        # the unrolled 8-row body keeps several (l_tile, TILE) tiles
        # live (~42 MB at 4096x512); the 16 MB default scoped-vmem
        # limit is conservative on v5e, and l_tile chunking bounds the
        # footprint below this limit for ANY window length L
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(pad2(minutes.astype(jnp.int32), 0),
      pad2(o.astype(f32), 0.0), pad2(h.astype(f32), 0.0),
      pad2(l.astype(f32), 0.0), pad2(c.astype(f32), 0.0),
      pad2(v.astype(f32), 0.0),
      pad2(valid.astype(jnp.int32), 0))
    open_, high, low, close, volume, count = (
        a[:B, :num_segments] for a in outs)

    nonempty = count > 0
    valid_out = nonempty & (count >= min_count)
    nan = jnp.asarray(jnp.nan, f32)
    fix = lambda a: jnp.where(nonempty, a, nan)
    return Candles(
        open=fix(open_), high=fix(high), low=fix(low), close=fix(close),
        volume=jnp.where(nonempty, volume, 0.0),
        count=count,
        valid=valid_out,
    )
