"""C3D backbone — plain 5-stage 3D convnet.

Flax/NDHWC reimplementation of reference ``models/pace/c3d_byol.py:29-107``:
conv(+bias)+BN+ReLU stages with max pools (1,2,2) then (2,2,2) x3, global
average pool to 512-d. Conv biases ON (torch nn.Conv3d default there).
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from cstp_tpu.models.layers import BatchNorm, Conv3d, max_pool_3d


class _ConvBNReLU(nn.Module):
    features: int
    dtype: Any = jnp.bfloat16
    bn_groups: int = 1
    quant: str = ""

    @nn.compact
    def __call__(self, x, train: bool = True):
        # Conv3d is param-compatible with the previous nn.Conv (same
        # "conv/{kernel,bias}" paths, same DHWIO kernel shape/init) and
        # carries the int8 quantization modes (--quant; ops/quant.py).
        x = Conv3d(
            self.features, (3, 3, 3), (1, 1, 1), (1, 1, 1),
            use_bias=True,  # reference C3D convs keep the torch default bias
            dtype=self.dtype, quant=self.quant, name="conv",
        )(x)
        x = BatchNorm(dtype=self.dtype, groups=self.bn_groups, name="bn")(x, not train)
        return nn.relu(x).astype(self.dtype)


class C3D(nn.Module):
    """512-d feature extractor (c3d_byol.py:70-107)."""

    dtype: Any = jnp.bfloat16
    bn_groups: int = 1
    proj_flag: bool = False  # accepted for API parity; C3D has no projector
    quant: str = ""          # '' | int8 modes threaded to every conv site

    @nn.compact
    def __call__(self, x, train: bool = True):
        x = x.astype(self.dtype)
        x = _ConvBNReLU(64, dtype=self.dtype, bn_groups=self.bn_groups, quant=self.quant, name="conv1")(x, train)
        x = max_pool_3d(x, (1, 2, 2), (1, 2, 2))
        x = _ConvBNReLU(128, dtype=self.dtype, bn_groups=self.bn_groups, quant=self.quant, name="conv2")(x, train)
        x = max_pool_3d(x, (2, 2, 2), (2, 2, 2))
        x = _ConvBNReLU(256, dtype=self.dtype, bn_groups=self.bn_groups, quant=self.quant, name="conv3a")(x, train)
        x = _ConvBNReLU(256, dtype=self.dtype, bn_groups=self.bn_groups, quant=self.quant, name="conv3b")(x, train)
        x = max_pool_3d(x, (2, 2, 2), (2, 2, 2))
        x = _ConvBNReLU(512, dtype=self.dtype, bn_groups=self.bn_groups, quant=self.quant, name="conv4a")(x, train)
        x = _ConvBNReLU(512, dtype=self.dtype, bn_groups=self.bn_groups, quant=self.quant, name="conv4b")(x, train)
        x = max_pool_3d(x, (2, 2, 2), (2, 2, 2))
        x = _ConvBNReLU(512, dtype=self.dtype, bn_groups=self.bn_groups, quant=self.quant, name="conv5a")(x, train)
        x = _ConvBNReLU(512, dtype=self.dtype, bn_groups=self.bn_groups, quant=self.quant, name="conv5b")(x, train)
        return jnp.mean(x.astype(jnp.float32), axis=(1, 2, 3))  # (B, 512)
