"""Pallas TPU kernels — the framework's native tier (SURVEY.md §2: the
reference's pandas/SciPy C internals map to custom Mosaic kernels here)."""
