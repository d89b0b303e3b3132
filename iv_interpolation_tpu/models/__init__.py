"""Model families — the smile/surface parameterisations.

Namespace over the kernels in ``ops``/``surface``: each family offers a
fit (calibration) and an evaluation path, all batched and jit-compiled.

  * cubic spline smiles   -> :mod:`iv_interpolation_tpu.models.spline`
  * SVI slices            -> :mod:`iv_interpolation_tpu.models.svi`
  * eSSVI surfaces        -> :mod:`iv_interpolation_tpu.models.essvi`
  * SABR (Hagan)          -> :mod:`iv_interpolation_tpu.models.sabr`
  * RBF/thin-plate        -> :mod:`iv_interpolation_tpu.models.rbf`
  * Andreasen-Huge        -> :mod:`iv_interpolation_tpu.models.andreasen_huge`
  * Black-Scholes         -> :mod:`iv_interpolation_tpu.models.black_scholes`
  * full surfaces         -> :mod:`iv_interpolation_tpu.surface`
"""

from iv_interpolation_tpu.models import (  # noqa: F401
    andreasen_huge,
    black_scholes,
    essvi,
    rbf,
    sabr,
    spline,
    svi,
)
