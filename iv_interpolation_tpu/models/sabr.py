"""Model-family alias for :mod:`iv_interpolation_tpu.ops.sabr`."""
from iv_interpolation_tpu.ops.sabr import *  # noqa: F401,F403
