"""Pallas TPU kernels."""

from cstp_tpu.ops.pallas.augment import fused_augment_clips  # noqa: F401
