"""Scalar functions: pure-Python cores + their vectorized pandas forms."""
