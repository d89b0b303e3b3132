"""Pallas batched tridiagonal solver (Thomas algorithm, VMEM-resident).

The pure-JAX scan solver (``ops.tridiag``) materialises the forward-sweep
coefficients ``c'``/``r'`` as (n, batch) HBM arrays between the two scans.
This kernel keeps the whole sweep in VMEM scratch: each grid program owns
a ``(n, 8, 128)`` brick of systems (batch laid out as full VPU registers:
8 sublanes x 128 lanes), runs the forward elimination and back
substitution row-by-row on-chip, and writes only ``x`` back to HBM.

Layout: systems dimension n is the leading (sequential) axis; the batch
is padded to a multiple of 1024 (= 8*128) and reshaped to (n, B/128, 128)
so every row access touches full (8, 128) tiles.

Falls back to interpret mode off-TPU (tests run it on CPU for parity with
the scan solver and SciPy).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_SUB, _LANE = 8, 128
_BRICK = _SUB * _LANE  # systems per grid program


def _thomas_kernel(dl_ref, d_ref, du_ref, b_ref, x_ref, c_ref, r_ref):
    n = d_ref.shape[0]

    c_ref[0] = du_ref[0] / d_ref[0]
    r_ref[0] = b_ref[0] / d_ref[0]

    def fwd(i, _):
        denom = d_ref[i] - dl_ref[i] * c_ref[i - 1]
        inv = 1.0 / denom
        c_ref[i] = du_ref[i] * inv
        r_ref[i] = (b_ref[i] - dl_ref[i] * r_ref[i - 1]) * inv
        return 0

    jax.lax.fori_loop(1, n, fwd, 0)

    x_ref[n - 1] = r_ref[n - 1]

    def bwd(j, _):
        i = n - 2 - j
        x_ref[i] = r_ref[i] - c_ref[i] * x_ref[i + 1]
        return 0

    jax.lax.fori_loop(0, n - 1, bwd, 0)


@partial(jax.jit, static_argnames=("interpret",))
def tridiag_solve_pallas(dl: jax.Array, d: jax.Array, du: jax.Array,
                         b: jax.Array, interpret: bool = False) -> jax.Array:
    """Solve batched tridiagonal systems; system dim = axis 0.

    Args:
      dl, d, du, b: (n, batch...) arrays (same convention as
        :func:`iv_interpolation_tpu.ops.tridiag.tridiag_solve`).
      interpret: run in Pallas interpreter mode (for CPU tests).

    Returns x, same shape as b.
    """
    n = d.shape[0]
    batch_shape = d.shape[1:]
    flat = 1
    for s in batch_shape:
        flat *= s
    dtype = d.dtype

    reshape = lambda a: a.reshape(n, flat)
    dl2, d2, du2, b2 = map(reshape, (dl, d, du, b))
    pad = (-flat) % _BRICK
    if pad:
        # padded systems solve identity*x = 0 — harmless
        zpad = lambda a, fill: jnp.pad(a, ((0, 0), (0, pad)),
                                       constant_values=fill)
        dl2, du2, b2 = zpad(dl2, 0), zpad(du2, 0), zpad(b2, 0)
        d2 = zpad(d2, 1)
    total = flat + pad
    shape3 = (n, total // _LANE, _LANE)
    dl3, d3, du3, b3 = (a.reshape(shape3) for a in (dl2, d2, du2, b2))

    grid = (total // _BRICK,)
    spec = pl.BlockSpec((n, _SUB, _LANE), lambda j: (0, j, 0),
                        memory_space=pltpu.VMEM)
    x3 = pl.pallas_call(
        _thomas_kernel,
        out_shape=jax.ShapeDtypeStruct(shape3, dtype),
        grid=grid,
        in_specs=[spec] * 4,
        out_specs=spec,
        scratch_shapes=[
            pltpu.VMEM((n, _SUB, _LANE), dtype),
            pltpu.VMEM((n, _SUB, _LANE), dtype),
        ],
        interpret=interpret,
    )(dl3, d3, du3, b3)
    x = x3.reshape(n, total)[:, :flat]
    return x.reshape((n,) + batch_shape)
