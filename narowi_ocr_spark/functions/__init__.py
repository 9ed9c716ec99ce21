"""Scalar extraction kernels and native column functions."""
