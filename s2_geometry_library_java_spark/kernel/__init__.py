"""Pure-NumPy vectorized S2 geometry kernels (no Spark dependency)."""
