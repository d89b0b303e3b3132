"""Matrix-form spline parity: identical to SciPy CubicSpline (natural)
and to the scan-based path, at <=1e-8 in f64."""

import jax.numpy as jnp
import numpy as np
from scipy.interpolate import CubicSpline

from iv_interpolation_tpu.ops.spline_matrix import (
    apply_spline_operator,
    build_spline_operator,
    build_surface_operators,
    fit_eval_surface_grid,
)
from iv_interpolation_tpu.surface.surface import fit_eval_surface


def test_matches_scipy(rng):
    n, m = 50, 80
    x = np.sort(rng.uniform(-1, 1, n))
    t = np.linspace(x[0], x[-1], m)
    op = build_spline_operator(jnp.array(x), jnp.array(t))
    B = 16
    ys = rng.normal(size=(B, n))
    S, S1, S2 = apply_spline_operator(op, jnp.array(ys))
    for i in range(B):
        cs = CubicSpline(x, ys[i], bc_type="natural")
        np.testing.assert_allclose(np.asarray(S)[i], cs(t), atol=1e-8)
        np.testing.assert_allclose(np.asarray(S1)[i], cs(t, 1), atol=1e-8)
        np.testing.assert_allclose(np.asarray(S2)[i], cs(t, 2), atol=1e-8)


def test_surface_grid_matches_general_path(rng):
    B, E, n, m = 8, 10, 20, 25
    k = np.broadcast_to(np.linspace(-1.0, 1.0, n), (B, E, n)).copy()
    T = np.linspace(0.1, 2.0, E)
    iv = 0.2 + 0.08 * k**2 + 0.01 * rng.normal(size=(B, 1, 1))

    # general (scan) path evaluates on its own common grid; replicate it
    general = fit_eval_surface(jnp.array(k), jnp.array(iv),
                               jnp.array(np.broadcast_to(T, (B, E))),
                               n_grid=m)
    queries = np.asarray(general["k_grid"])[0, 0]
    ops = build_surface_operators(jnp.array(k[0]), jnp.array(queries))
    fast = fit_eval_surface_grid(ops, jnp.array(iv), jnp.array(T))

    np.testing.assert_allclose(np.asarray(fast["w_grid"]),
                               np.asarray(general["w_grid"]), atol=1e-10)
    np.testing.assert_allclose(np.asarray(fast["g"]),
                               np.asarray(general["g"]), atol=1e-9)
    np.testing.assert_array_equal(np.asarray(fast["butterfly_ok"]),
                                  np.asarray(general["butterfly_ok"]))
    np.testing.assert_array_equal(np.asarray(fast["calendar_ok"]),
                                  np.asarray(general["calendar_ok"]))


def test_extrapolation_matches_scipy(rng):
    n = 20
    x = np.sort(rng.uniform(-1, 1, n))
    t = np.array([x[0] - 0.2, x[-1] + 0.2])
    op = build_spline_operator(jnp.array(x), jnp.array(t))
    y = rng.normal(size=n)
    S, _, _ = apply_spline_operator(op, jnp.array(y))
    cs = CubicSpline(x, y, bc_type="natural")
    np.testing.assert_allclose(np.asarray(S), cs(t), atol=1e-8)
