"""S3D-G backbone — separable-Inception video network with self-gating.

Flax/NDHWC reimplementation of reference ``models/coclr/s3dg.py:39-248``:
BasicConv3d (conv+BN+ReLU), STConv3d (separable spatial->temporal, each with
BN+ReLU), SepInception blocks with optional per-branch SelfGating, 'slow'
stem (temporal stride 1). 1024-d pooled feature; optional 1024-hidden
projector (s3dg.py:229-234).

The legacy pace S3D-G exposes a "3D space-to-depth trick for TPU
optimization" (models/pace/s3d_g.py:280-287) — provided here as
``space_to_depth_stem``: (B,T,H,W,C) -> (B,T/2,H/2,W/2,8C) ahead of a
stride-1 stem, turning the memory-bound 3-channel stem conv into an
MXU-friendly 24-channel one.
"""

from __future__ import annotations

from typing import Any, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

from cstp_tpu.models.layers import (
    BatchNorm,
    Conv3d,
    MLPHead,
    SelfGating,
    max_pool_3d,
)


def space_to_depth_stem(x: jnp.ndarray) -> jnp.ndarray:
    """(B, T, H, W, C) -> (B, T/2, H/2, W/2, 8C) (s3d_g.py:280-287)."""
    b, t, h, w, c = x.shape
    x = x.reshape(b, t // 2, 2, h // 2, 2, w // 2, 2, c)
    x = x.transpose(0, 1, 3, 5, 2, 4, 6, 7)
    return x.reshape(b, t // 2, h // 2, w // 2, 8 * c)


class BasicConv3d(nn.Module):
    """conv (no bias) + BN + ReLU (s3dg.py:39-59)."""

    features: int
    kernel: Tuple[int, int, int] = (1, 1, 1)
    stride: Tuple[int, int, int] = (1, 1, 1)
    padding: Tuple[int, int, int] = (0, 0, 0)
    dtype: Any = jnp.bfloat16
    bn_groups: int = 1
    quant: str = ""

    @nn.compact
    def __call__(self, x, train: bool = True):
        x = Conv3d(self.features, self.kernel, self.stride, self.padding,
                   dtype=self.dtype, quant=self.quant, name="conv")(x)
        x = BatchNorm(dtype=self.dtype, groups=self.bn_groups, name="bn")(x, not train)
        return nn.relu(x).astype(self.dtype)


class STConv3d(nn.Module):
    """Separable conv: (1,k,k) spatial + BN + ReLU then (k,1,1) temporal +
    BN + ReLU (s3dg.py:62-97)."""

    features: int
    kernel: int = 3
    stride: Tuple[int, int, int] = (1, 1, 1)
    padding: int = 0
    dtype: Any = jnp.bfloat16
    bn_groups: int = 1
    quant: str = ""

    @nn.compact
    def __call__(self, x, train: bool = True):
        k, p = self.kernel, self.padding
        ts, ss = self.stride[0], self.stride[-1]
        x = Conv3d(self.features, (1, k, k), (1, ss, ss), (0, p, p),
                   dtype=self.dtype, quant=self.quant, name="conv1")(x)
        x = BatchNorm(dtype=self.dtype, groups=self.bn_groups, name="bn1")(x, not train)
        x = nn.relu(x).astype(self.dtype)
        x = Conv3d(self.features, (k, 1, 1), (ts, 1, 1), (p, 0, 0),
                   dtype=self.dtype, quant=self.quant, name="conv2")(x)
        x = BatchNorm(dtype=self.dtype, groups=self.bn_groups, name="bn2")(x, not train)
        return nn.relu(x).astype(self.dtype)


class SepInception(nn.Module):
    """4-branch separable Inception block (s3dg.py:113-163)."""

    out_planes: Sequence[int]  # [b0, b1a, b1b, b2a, b2b, b3b]
    gating: bool = False
    dtype: Any = jnp.bfloat16
    bn_groups: int = 1
    quant: str = ""

    @nn.compact
    def __call__(self, x, train: bool = True):
        p0, p1a, p1b, p2a, p2b, p3b = self.out_planes
        x0 = BasicConv3d(p0, dtype=self.dtype, bn_groups=self.bn_groups, quant=self.quant, name="branch0")(x, train)
        x1 = BasicConv3d(p1a, dtype=self.dtype, bn_groups=self.bn_groups, quant=self.quant, name="branch1_0")(x, train)
        x1 = STConv3d(p1b, 3, (1, 1, 1), 1, dtype=self.dtype, bn_groups=self.bn_groups, quant=self.quant,
                      name="branch1_1")(x1, train)
        x2 = BasicConv3d(p2a, dtype=self.dtype, bn_groups=self.bn_groups, quant=self.quant, name="branch2_0")(x, train)
        x2 = STConv3d(p2b, 3, (1, 1, 1), 1, dtype=self.dtype, bn_groups=self.bn_groups, quant=self.quant,
                      name="branch2_1")(x2, train)
        x3 = max_pool_3d(x, (3, 3, 3), (1, 1, 1), (1, 1, 1))
        x3 = BasicConv3d(p3b, dtype=self.dtype, bn_groups=self.bn_groups, quant=self.quant, name="branch3_1")(x3, train)
        if self.gating:
            x0 = SelfGating(dtype=self.dtype, name="gating_b0")(x0)
            x1 = SelfGating(dtype=self.dtype, name="gating_b1")(x1)
            x2 = SelfGating(dtype=self.dtype, name="gating_b2")(x2)
            x3 = SelfGating(dtype=self.dtype, name="gating_b3")(x3)
        return jnp.concatenate([x0, x1, x2, x3], axis=-1)


# Inception plans (s3dg.py:193-222)
_MIXED_3 = [[64, 96, 128, 16, 32, 32], [128, 128, 192, 32, 96, 64]]
_MIXED_4 = [
    [192, 96, 208, 16, 48, 64],
    [160, 112, 224, 24, 64, 64],
    [128, 128, 256, 24, 64, 64],
    [112, 144, 288, 32, 64, 64],
    [256, 160, 320, 32, 128, 128],
]
_MIXED_5 = [[256, 160, 320, 32, 128, 128], [384, 192, 384, 48, 128, 128]]


class S3D(nn.Module):
    """1024-d feature extractor (s3dg.py:166-248); ``slow=True`` keeps the
    stem temporal stride at 1 (s3dg.py:172-175)."""

    gating: bool = True
    slow: bool = False
    s2d_stem: bool = False
    proj_flag: bool = False
    dtype: Any = jnp.bfloat16
    bn_groups: int = 1
    quant: str = ""          # '' | int8 modes threaded to every conv site

    @nn.compact
    def __call__(self, x, train: bool = True):
        x = x.astype(self.dtype)
        if self.s2d_stem:
            # legacy pace S3D-G "space to depth trick for TPU optimization"
            # (s3d_g.py:229-231, 281-299): s2d(2,2,2) then a stride-1
            # non-separable (2,4,4) stem conv, trimming one leading plane
            # per spatial-temporal axis to replicate TF-SAME alignment.
            assert not self.slow, "s2d_stem and slow stem are exclusive"
            x = space_to_depth_stem(x)
            x = BasicConv3d(64, (2, 4, 4), (1, 1, 1), (1, 2, 2),
                            dtype=self.dtype, bn_groups=self.bn_groups,
                            quant=self.quant, name="Conv_1a")(x, train)
            x = x[:, 1:, 1:, 1:, :]
        else:
            stem_stride = (1, 2, 2) if self.slow else (2, 2, 2)
            x = STConv3d(64, 7, stem_stride, 3, dtype=self.dtype,
                         bn_groups=self.bn_groups, quant=self.quant,
                         name="Conv_1a")(x, train)
        x = max_pool_3d(x, (1, 3, 3), (1, 2, 2), (0, 1, 1))
        x = BasicConv3d(64, dtype=self.dtype, bn_groups=self.bn_groups,
                        quant=self.quant, name="Conv_2b")(x, train)
        x = STConv3d(192, 3, (1, 1, 1), 1, dtype=self.dtype, bn_groups=self.bn_groups,
                     quant=self.quant, name="Conv_2c")(x, train)
        x = max_pool_3d(x, (1, 3, 3), (1, 2, 2), (0, 1, 1))
        for i, plan in enumerate(_MIXED_3):
            x = SepInception(plan, self.gating, dtype=self.dtype, bn_groups=self.bn_groups, quant=self.quant,
                             name=f"Mixed_3{'bc'[i]}")(x, train)
        x = max_pool_3d(x, (3, 3, 3), (2, 2, 2), (1, 1, 1))
        for i, plan in enumerate(_MIXED_4):
            x = SepInception(plan, self.gating, dtype=self.dtype, bn_groups=self.bn_groups, quant=self.quant,
                             name=f"Mixed_4{'bcdef'[i]}")(x, train)
        x = max_pool_3d(x, (2, 2, 2), (2, 2, 2), (0, 0, 0))
        for i, plan in enumerate(_MIXED_5):
            x = SepInception(plan, self.gating, dtype=self.dtype, bn_groups=self.bn_groups, quant=self.quant,
                             name=f"Mixed_5{'bc'[i]}")(x, train)
        feat = jnp.mean(x.astype(jnp.float32), axis=(1, 2, 3))  # (B, 1024)
        if self.proj_flag:
            proj = MLPHead(1024, 1024, dtype=self.dtype, bn_groups=self.bn_groups, name="project")(
                feat, train
            )
            return feat, proj
        return feat
