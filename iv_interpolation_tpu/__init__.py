"""iv_interpolation_tpu — TPU-native implied-volatility surface & market-data engine.

A brand-new JAX/XLA/Pallas framework with the capabilities of the
liu-wei2021/IV_INTERPOLATION reference pipeline (hourly IV -> 1-min
interpolation -> synthetic OHLCV bridge -> 5-min candle reconstruction,
with batch orchestration, checkpoint/resume and monitoring), re-designed
TPU-first:

  * the interpolation engine is a batched, masked, jit/vmap-compiled
    resampler over fixed-shape padded grids (``ops.interp``);
  * the general surface engine fits cubic-spline smiles (Pallas/scan
    tridiagonal solves), SVI slices (batched Levenberg-Marquardt) and
    RBF surfaces (batched Cholesky) — ``ops`` + ``surface``;
  * candle aggregation is a segment-reduction kernel over device-resident
    buffers (``ops.segment_ohlcv``);
  * the synthetic-OHLCV bridge uses counter-based ``jax.random`` keys for
    reproducibility (``ops.bridge``);
  * scaling is data-parallel sharding of the surface batch over a
    ``jax.sharding.Mesh`` (``parallel``), not process pools.

See SURVEY.md for the reference layer map this framework mirrors.
"""

__version__ = "0.1.0"

from iv_interpolation_tpu.config import (  # noqa: F401
    Config,
    get_config,
)

__all__ = [
    "Config", "get_config", "__version__",
]


def __getattr__(name):
    """Lazy top-level API: keep ``import iv_interpolation_tpu`` light
    (no jax/pandas import cost) while exposing the main entry points."""
    lazy = {
        "fit_surface": ("iv_interpolation_tpu.surface", "fit_surface"),
        "eval_surface": ("iv_interpolation_tpu.surface", "eval_surface"),
        "fit_eval_surface": ("iv_interpolation_tpu.surface",
                             "fit_eval_surface"),
        "PipelineRunner": ("iv_interpolation_tpu.pipeline",
                           "PipelineRunner"),
        "RunManifest": ("iv_interpolation_tpu.pipeline", "RunManifest"),
        "get_store": ("iv_interpolation_tpu.pipeline", "get_store"),
    }
    if name in lazy:
        import importlib
        module, attr = lazy[name]
        return getattr(importlib.import_module(module), attr)
    raise AttributeError(f"module 'iv_interpolation_tpu' has no attribute {name!r}")
