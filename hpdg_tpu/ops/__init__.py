"""Pallas TPU kernels for the hot operators."""
