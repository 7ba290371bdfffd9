"""Pallas TPU kernels for the hot temporal ops."""
