"""Pallas TPU kernels for the hot geometry primitives."""
