"""RBF surface fitting parity vs scipy.interpolate.RBFInterpolator."""

import jax.numpy as jnp
import numpy as np
import pytest
from scipy.interpolate import RBFInterpolator

from iv_interpolation_tpu.ops.rbf import eval_rbf, fit_eval_rbf_batched, fit_rbf


def _scattered_quotes(rng, n):
    """Scattered (log-moneyness, maturity) quotes with a smooth vol surface."""
    k = rng.uniform(-1.0, 1.0, n)
    T = rng.uniform(0.05, 2.0, n)
    w = (0.04 + 0.3 * k**2) * T  # smile * maturity -> total variance
    w += 1e-4 * rng.normal(size=n)
    return np.stack([k, T], axis=1), w


@pytest.mark.parametrize("smoothing", [0.0, 1e-6, 1e-3])
def test_thin_plate_matches_scipy(rng, smoothing):
    pts, w = _scattered_quotes(rng, 200)
    q, _ = _scattered_quotes(rng, 50)
    fit = fit_rbf(jnp.array(pts), jnp.array(w), smoothing=smoothing)
    got = eval_rbf(fit, jnp.array(q))
    ref = RBFInterpolator(pts, w, kernel="thin_plate_spline",
                          smoothing=smoothing)(q)
    np.testing.assert_allclose(np.asarray(got), ref, atol=1e-8)


def test_gaussian_matches_scipy(rng):
    pts, w = _scattered_quotes(rng, 150)
    q, _ = _scattered_quotes(rng, 40)
    fit = fit_rbf(jnp.array(pts), jnp.array(w), smoothing=1e-10,
                  kernel="gaussian", epsilon=2.0)
    got = eval_rbf(fit, jnp.array(q), kernel="gaussian", epsilon=2.0)
    ref = RBFInterpolator(pts, w, kernel="gaussian", epsilon=2.0,
                          smoothing=1e-10)(q)
    np.testing.assert_allclose(np.asarray(got), ref, atol=1e-7)


def test_multiquadric_matches_scipy(rng):
    pts, w = _scattered_quotes(rng, 150)
    q, _ = _scattered_quotes(rng, 40)
    fit = fit_rbf(jnp.array(pts), jnp.array(w), kernel="multiquadric",
                  epsilon=1.5)
    got = eval_rbf(fit, jnp.array(q), kernel="multiquadric", epsilon=1.5)
    ref = RBFInterpolator(pts, w, kernel="multiquadric", epsilon=1.5)(q)
    # multiquadric Gram systems are ill-conditioned (~1e9); LU pivoting
    # differences between LAPACK and XLA show up at ~2e-8 on extrapolated
    # queries, so the bound here is looser than the 1e-8 used elsewhere.
    np.testing.assert_allclose(np.asarray(got), ref, atol=5e-8)


def test_interpolates_exactly_at_sites(rng):
    pts, w = _scattered_quotes(rng, 100)
    fit = fit_rbf(jnp.array(pts), jnp.array(w), smoothing=0.0)
    got = eval_rbf(fit, jnp.array(pts))
    np.testing.assert_allclose(np.asarray(got), w, atol=1e-8)


def test_batched(rng):
    B, n, m = 4, 120, 30
    pts = np.stack([_scattered_quotes(rng, n)[0] for _ in range(B)])
    ws = np.stack([0.04 + 0.3 * p[:, 0] ** 2 * p[:, 1] for p in pts])
    qs = pts[:, :m, :]
    got = np.asarray(fit_eval_rbf_batched(jnp.array(pts), jnp.array(ws),
                                          jnp.array(qs)))
    for i in range(B):
        ref = RBFInterpolator(pts[i], ws[i], kernel="thin_plate_spline")(qs[i])
        np.testing.assert_allclose(got[i], ref, atol=1e-8)
