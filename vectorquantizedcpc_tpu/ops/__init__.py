"""Pallas TPU kernels: fused AR vocoder decode, INT8 weight-only quant."""
