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
