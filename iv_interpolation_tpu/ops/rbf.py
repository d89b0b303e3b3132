"""RBF / thin-plate-spline surface fitting on scattered quotes.

North-star capability (BASELINE.json config #4): "RBF/thin-plate surface
on ~2k scattered quotes with no-arbitrage penalty smoothing". No reference
analogue exists (the reference never fit surfaces); the SciPy oracle is
``scipy.interpolate.RBFInterpolator`` (tests/test_rbf.py, <=1e-8 in f64).

Design: one Gram-matrix factorisation per surface, batched with ``vmap``.
The Gram solve is dense linear algebra that XLA maps onto the MXU — for
N~2k sites the (N+3)^2 system is ~16MB in f32, comfortably HBM-resident
per surface; throughput comes from batching surfaces, not from sharding a
single solve.

Kernels:
  * ``thin_plate``   phi(r) = r^2 log r, with degree-1 polynomial tail
                     (conditionally positive definite -> saddle-point
                     system, solved with a general LU)
  * ``gaussian``     phi(r) = exp(-(eps r)^2)   (PD -> Cholesky)
  * ``multiquadric`` phi(r) = -sqrt(1 + (eps r)^2)  (CPD order 1, solved
                     with the polynomial tail like thin_plate)
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def _pairwise_r(a: jax.Array, b: jax.Array) -> jax.Array:
    """Euclidean distances between point sets (N,2) x (M,2) -> (N,M)."""
    d = a[:, None, :] - b[None, :, :]
    return jnp.sqrt(jnp.sum(d * d, axis=-1) + 1e-300)


def _kernel(r: jax.Array, kind: str, eps: float) -> jax.Array:
    if kind == "thin_plate":
        # r^2 log r, with the r=0 limit 0 (r clamped in _pairwise_r)
        return jnp.where(r > 1e-100, r * r * jnp.log(jnp.maximum(r, 1e-100)), 0.0)
    if kind == "gaussian":
        return jnp.exp(-((eps * r) ** 2))
    if kind == "multiquadric":
        return -jnp.sqrt(1.0 + (eps * r) ** 2)
    raise ValueError(f"unknown RBF kernel: {kind!r}")


# polynomial-tail degree per kernel, matching SciPy RBFInterpolator defaults:
# thin_plate -> degree 1 ([1, x, y]); gaussian/multiquadric -> degree 0 ([1])
_POLY_TERMS = {"thin_plate": 3, "gaussian": 1, "multiquadric": 1}


@partial(jax.jit, static_argnames=("kernel",))
def fit_rbf(points: jax.Array, values: jax.Array, smoothing: float = 0.0,
            kernel: str = "thin_plate", epsilon: float = 1.0):
    """Fit an RBF surface through scattered ``points`` -> ``values``.

    Args:
      points: (N, 2) quote coordinates (e.g. log-moneyness, maturity).
      values: (N,) observed values (e.g. total variance).
      smoothing: ridge term on the kernel block (SciPy ``smoothing``).
      kernel/epsilon: kernel family and shape parameter.

    Returns:
      dict with ``coef`` (N,), ``poly`` (3,) (zeros if the kernel needs no
      tail), plus the inputs needed for evaluation.
    """
    n = points.shape[0]
    r = _pairwise_r(points, points)
    A = _kernel(r, kernel, epsilon) + smoothing * jnp.eye(n, dtype=values.dtype)

    p = _POLY_TERMS[kernel]
    ones = jnp.ones((n, 1), values.dtype)
    P = ones if p == 1 else jnp.concatenate([ones, points], axis=1)
    top = jnp.concatenate([A, P], axis=1)
    bot = jnp.concatenate([P.T, jnp.zeros((p, p), values.dtype)], axis=1)
    lhs = jnp.concatenate([top, bot], axis=0)
    rhs = jnp.concatenate([values, jnp.zeros((p,), values.dtype)])
    sol = jnp.linalg.solve(lhs, rhs)
    coef, poly_c = sol[:n], sol[n:]
    poly = jnp.zeros((3,), values.dtype).at[:p].set(poly_c)
    return {"points": points, "coef": coef, "poly": poly}


@partial(jax.jit, static_argnames=("kernel",))
def eval_rbf(fit: dict, query: jax.Array, kernel: str = "thin_plate",
             epsilon: float = 1.0) -> jax.Array:
    """Evaluate a fitted RBF surface at ``query`` (M, 2) -> (M,)."""
    r = _pairwise_r(query, fit["points"])
    K = _kernel(r, kernel, epsilon)
    hp = jax.lax.Precision.HIGHEST  # full-f32 MXU (default truncates to bf16)
    out = jnp.matmul(K, fit["coef"], precision=hp)
    poly = fit["poly"]
    return out + poly[0] + jnp.matmul(query, poly[1:], precision=hp)


def fit_eval_rbf_batched(points, values, query, smoothing=0.0,
                         kernel="thin_plate", epsilon=1.0):
    """Batched fit+eval: leading batch dim on points/values/query."""
    def one(p, v, q):
        f = fit_rbf(p, v, smoothing=smoothing, kernel=kernel, epsilon=epsilon)
        return eval_rbf(f, q, kernel=kernel, epsilon=epsilon)
    return jax.vmap(one)(points, values, query)
