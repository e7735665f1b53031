"""3D ResNet backbone (depths 10/18/34 basic, 50/101/152/200 bottleneck).

Flax/NDHWC reimplementation of reference ``models/BE/r3d_byol.py:109-207``:
stem conv k7 stride (1,2,2) pad 3, maxpool 3^3 stride 2, four stages with
stride-2 downsampling, global average pool. Shortcut type 'B' (projection
conv) and 'A' (strided avg-pool + zero-pad channels,
r3d_byol.py:56-67) both supported.
"""

from __future__ import annotations

from typing import Any, Tuple

import jax.numpy as jnp
from flax import linen as nn

from cstp_tpu.models.layers import (
    BatchNorm,
    Conv3d,
    max_pool_3d,
)

R3D_LAYERS = {
    10: ("basic", (1, 1, 1, 1), 1),
    18: ("basic", (2, 2, 2, 2), 1),
    34: ("basic", (3, 4, 6, 3), 1),
    50: ("bottleneck", (3, 4, 6, 3), 4),
    101: ("bottleneck", (3, 4, 23, 3), 4),
    152: ("bottleneck", (3, 8, 36, 3), 4),
    200: ("bottleneck", (3, 24, 36, 3), 4),
}


def _conv(features, kernel, stride, padding, dtype, name, quant=""):
    # Conv3d is param-compatible with the previous nn.Conv (same
    # "{kernel}" path, DHWIO shape, glorot init) and carries the int8
    # quantization modes (--quant; ops/quant.py).
    return Conv3d(
        features, kernel, stride, padding, use_bias=False,
        dtype=dtype, quant=quant, name=name,
    )


class _BasicBlock(nn.Module):
    planes: int
    stride: int = 1
    shortcut: str = "B"
    dtype: Any = jnp.bfloat16
    bn_groups: int = 1
    quant: str = ""

    @nn.compact
    def __call__(self, x, train: bool = True):
        s = (self.stride,) * 3
        out = _conv(self.planes, (3, 3, 3), s, (1, 1, 1), self.dtype, "conv1", self.quant)(x)
        out = BatchNorm(dtype=self.dtype, groups=self.bn_groups, name="bn1")(out, not train)
        out = nn.relu(out).astype(self.dtype)
        out = _conv(self.planes, (3, 3, 3), (1, 1, 1), (1, 1, 1), self.dtype,
                    "conv2", self.quant)(out)
        out = BatchNorm(dtype=self.dtype, groups=self.bn_groups, name="bn2")(out, not train)
        res = _shortcut(self, x, self.planes, self.stride, train)
        return nn.relu(out.astype(jnp.float32) + res.astype(jnp.float32)).astype(
            self.dtype
        )


class _Bottleneck(nn.Module):
    planes: int
    stride: int = 1
    shortcut: str = "B"
    dtype: Any = jnp.bfloat16
    bn_groups: int = 1
    quant: str = ""

    @nn.compact
    def __call__(self, x, train: bool = True):
        s = (self.stride,) * 3
        out = _conv(self.planes, (1, 1, 1), (1, 1, 1), (0, 0, 0), self.dtype,
                    "conv1", self.quant)(x)
        out = BatchNorm(dtype=self.dtype, groups=self.bn_groups, name="bn1")(out, not train)
        out = nn.relu(out).astype(self.dtype)
        out = _conv(self.planes, (3, 3, 3), s, (1, 1, 1), self.dtype, "conv2", self.quant)(out)
        out = BatchNorm(dtype=self.dtype, groups=self.bn_groups, name="bn2")(out, not train)
        out = nn.relu(out).astype(self.dtype)
        out = _conv(self.planes * 4, (1, 1, 1), (1, 1, 1), (0, 0, 0), self.dtype,
                    "conv3", self.quant)(out)
        out = BatchNorm(dtype=self.dtype, groups=self.bn_groups, name="bn3")(out, not train)
        res = _shortcut(self, x, self.planes * 4, self.stride, train)
        return nn.relu(out.astype(jnp.float32) + res.astype(jnp.float32)).astype(
            self.dtype
        )


def _shortcut(mod: nn.Module, x, out_planes: int, stride: int, train: bool):
    """Identity, 'A' (avg-pool + zero-pad channels, r3d_byol.py:56-67), or
    'B' (1x1x1 projection conv + BN)."""
    in_planes = x.shape[-1]
    if stride == 1 and in_planes == out_planes:
        return x
    if mod.shortcut == "A":
        # F.avg_pool3d(kernel=1, stride=s) == strided subsample, then
        # zero-pad the channel dim (r3d_byol.py:56-67)
        pooled = x[:, ::stride, ::stride, ::stride, :]
        pad = out_planes - in_planes
        if pad > 0:
            pooled = jnp.pad(pooled, ((0, 0),) * 4 + ((0, pad),))
        return pooled
    out = _conv(out_planes, (1, 1, 1), (stride,) * 3, (0, 0, 0), mod.dtype,
                "downsample_conv", mod.quant)(x)
    return BatchNorm(dtype=mod.dtype, groups=mod.bn_groups, name="downsample_bn")(out, not train)


class ResNet3D(nn.Module):
    """Feature extractor: 512*expansion dims (r3d_byol.py:139-207)."""

    block: str = "basic"
    layers: Tuple[int, int, int, int] = (2, 2, 2, 2)
    shortcut: str = "B"
    dtype: Any = jnp.bfloat16
    bn_groups: int = 1
    proj_flag: bool = False  # parity; reference R3D has no projector
    quant: str = ""         # '' | int8 modes threaded to every conv site

    @nn.compact
    def __call__(self, x, train: bool = True):
        block_cls = _BasicBlock if self.block == "basic" else _Bottleneck
        x = x.astype(self.dtype)
        x = _conv(64, (7, 7, 7), (1, 2, 2), (3, 3, 3), self.dtype, "conv1",
                  self.quant)(x)
        x = BatchNorm(dtype=self.dtype, groups=self.bn_groups, name="bn1")(x, not train)
        x = nn.relu(x).astype(self.dtype)
        x = max_pool_3d(x, (3, 3, 3), (2, 2, 2), (1, 1, 1))
        for li, (planes, blocks) in enumerate(
            zip((64, 128, 256, 512), self.layers)
        ):
            for bi in range(blocks):
                stride = 2 if (li > 0 and bi == 0) else 1
                x = block_cls(
                    planes, stride, self.shortcut, dtype=self.dtype,
                    # bn_groups threaded (round-4 fix: the blocks previously
                    # fell back to groups=1, computing cross-view statistics
                    # in two-view-concat pretraining — the same bug fixed
                    # for R2Plus1DNet in PERF.md's per-view BN section)
                    bn_groups=self.bn_groups, quant=self.quant,
                    name=f"layer{li + 1}_block{bi + 1}",
                )(x, train)
        return jnp.mean(x.astype(jnp.float32), axis=(1, 2, 3))
