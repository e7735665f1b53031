"""Pallas TPU kernels (cstp_tpu.ops.pallas)."""
