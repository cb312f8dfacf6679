"""Pallas TPU kernels: fused VQ nearest-neighbour, fused AR decode, INT8."""
