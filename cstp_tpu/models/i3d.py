"""I3D backbone — Inception-3D with TF-style SAME padding.

Flax/NDHWC reimplementation of reference ``models/BE/i3d_byol.py:99-426``:
Unit3Dpy (conv + BN + ReLU with TF SAME padding), TF-SAME max pools, Mixed
inception blocks, global average pool. The reference's id_head
(projection=False) is AdaptiveAvgPool + flatten + L2-normalize
(i3d_byol.py:328-341) — the L2 normalization is applied by the BYOL engine
via ``BackboneSpec.l2_feat``.

NDHWC + XLA note: TF SAME padding is just asymmetric explicit padding on the
conv, which XLA:TPU fuses into the convolution — no separate pad op like
torch's ConstantPad3d path.
"""

from __future__ import annotations

from typing import Any, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

from cstp_tpu.models.layers import BatchNorm, Conv3d, max_pool_3d_same


def _same_pads(kernel, stride):
    """TF SAME padding (i3d_byol.py:70-86): pad = max(k - s, 0), bottom-heavy."""
    pads = []
    for k, s in zip(kernel, stride):
        pad_along = max(k - s, 0)
        lo = pad_along // 2
        pads.append((lo, pad_along - lo))
    return pads


class Unit3D(nn.Module):
    """conv (SAME, no bias) + BN + ReLU (reference Unit3Dpy,
    i3d_byol.py:99-168)."""

    features: int
    kernel: Tuple[int, int, int] = (1, 1, 1)
    stride: Tuple[int, int, int] = (1, 1, 1)
    use_bn: bool = True
    activation: bool = True
    dtype: Any = jnp.bfloat16
    bn_groups: int = 1
    quant: str = ""

    @nn.compact
    def __call__(self, x, train: bool = True):
        # Conv3d is param-compatible with the previous nn.Conv (same
        # "conv/kernel" path, DHWIO shape, glorot init), accepts the
        # asymmetric TF-SAME (lo, hi) pads, and carries the int8
        # quantization modes (--quant; ops/quant.py).
        x = Conv3d(
            self.features, self.kernel, self.stride,
            tuple(_same_pads(self.kernel, self.stride)), use_bias=False,
            dtype=self.dtype, quant=self.quant, name="conv",
        )(x)
        if self.use_bn:
            x = BatchNorm(dtype=self.dtype, groups=self.bn_groups, name="bn")(x, not train)
        if self.activation:
            x = nn.relu(x)
        return x.astype(self.dtype)


class Mixed(nn.Module):
    """4-branch Inception block (i3d_byol.py:186-221)."""

    out_channels: Sequence[int]  # [b0, b1a, b1b, b2a, b2b, b3]
    dtype: Any = jnp.bfloat16
    bn_groups: int = 1
    quant: str = ""

    @nn.compact
    def __call__(self, x, train: bool = True):
        c = self.out_channels
        x0 = Unit3D(c[0], dtype=self.dtype, bn_groups=self.bn_groups, quant=self.quant, name="branch_0")(x, train)
        x1 = Unit3D(c[1], dtype=self.dtype, bn_groups=self.bn_groups, quant=self.quant, name="branch_1_0")(x, train)
        x1 = Unit3D(c[2], (3, 3, 3), dtype=self.dtype, bn_groups=self.bn_groups, quant=self.quant,
                    name="branch_1_1")(x1, train)
        x2 = Unit3D(c[3], dtype=self.dtype, bn_groups=self.bn_groups, quant=self.quant, name="branch_2_0")(x, train)
        x2 = Unit3D(c[4], (3, 3, 3), dtype=self.dtype, bn_groups=self.bn_groups, quant=self.quant,
                    name="branch_2_1")(x2, train)
        x3 = max_pool_3d_same(x, (3, 3, 3), (1, 1, 1))
        x3 = Unit3D(c[5], dtype=self.dtype, bn_groups=self.bn_groups, quant=self.quant, name="branch_3_1")(x3, train)
        return jnp.concatenate([x0, x1, x2, x3], axis=-1)


class I3D(nn.Module):
    """1024-d pooled feature extractor (i3d_byol.py:223-426, RGB modality).

    ``conv_head=True`` rebuilds the reference finetune classifier exactly
    (i3d_byol.py:295-306, forward 405-412): AvgPool3d((2,7,7), stride 1) →
    Dropout(p=0; the factory never sets dropout_prob) → Unit3Dpy
    1024→num_classes with kernel (7,1,1), SAME padding, no bias/BN/act →
    squeeze spatial → mean over T. The (2,7,7) window plus the double
    ``squeeze(3)`` hard-require a 7×7 final map, i.e. 224² inputs (and
    T ≥ 16) — the reference crashes on anything else. Without the flag,
    CSTPClassify applies the generic L2-norm/BN/linear head on the pooled
    feature instead — works at any input size (documented deviation,
    PARITY.md)."""

    dtype: Any = jnp.bfloat16
    bn_groups: int = 1
    proj_flag: bool = False  # parity; BYOL uses the raw normalized feature
    conv_head: bool = False  # faithful reference classifier (224^2 only)
    num_classes: int = 0     # used only with conv_head
    quant: str = ""         # '' | int8 modes threaded to every conv site

    @nn.compact
    def __call__(self, x, train: bool = True):
        x = x.astype(self.dtype)
        x = Unit3D(64, (7, 7, 7), (2, 2, 2), dtype=self.dtype, bn_groups=self.bn_groups,
                   quant=self.quant, name="conv3d_1a_7x7")(x, train)
        x = max_pool_3d_same(x, (1, 3, 3), (1, 2, 2))
        x = Unit3D(64, dtype=self.dtype, bn_groups=self.bn_groups, quant=self.quant, name="conv3d_2b_1x1")(x, train)
        x = Unit3D(192, (3, 3, 3), dtype=self.dtype, bn_groups=self.bn_groups, quant=self.quant,
                   name="conv3d_2c_3x3")(x, train)
        x = max_pool_3d_same(x, (1, 3, 3), (1, 2, 2))
        x = Mixed([64, 96, 128, 16, 32, 32], dtype=self.dtype, bn_groups=self.bn_groups, quant=self.quant,
                  name="mixed_3b")(x, train)
        x = Mixed([128, 128, 192, 32, 96, 64], dtype=self.dtype, bn_groups=self.bn_groups, quant=self.quant,
                  name="mixed_3c")(x, train)
        x = max_pool_3d_same(x, (3, 3, 3), (2, 2, 2))
        x = Mixed([192, 96, 208, 16, 48, 64], dtype=self.dtype, bn_groups=self.bn_groups, quant=self.quant,
                  name="mixed_4b")(x, train)
        x = Mixed([160, 112, 224, 24, 64, 64], dtype=self.dtype, bn_groups=self.bn_groups, quant=self.quant,
                  name="mixed_4c")(x, train)
        x = Mixed([128, 128, 256, 24, 64, 64], dtype=self.dtype, bn_groups=self.bn_groups, quant=self.quant,
                  name="mixed_4d")(x, train)
        x = Mixed([112, 144, 288, 32, 64, 64], dtype=self.dtype, bn_groups=self.bn_groups, quant=self.quant,
                  name="mixed_4e")(x, train)
        x = Mixed([256, 160, 320, 32, 128, 128], dtype=self.dtype, bn_groups=self.bn_groups, quant=self.quant,
                  name="mixed_4f")(x, train)
        x = max_pool_3d_same(x, (2, 2, 2), (2, 2, 2))
        x = Mixed([256, 160, 320, 32, 128, 128], dtype=self.dtype, bn_groups=self.bn_groups, quant=self.quant,
                  name="mixed_5b")(x, train)
        x = Mixed([384, 192, 384, 48, 128, 128], dtype=self.dtype, bn_groups=self.bn_groups, quant=self.quant,
                  name="mixed_5c")(x, train)
        if self.conv_head:
            if x.shape[1] < 2 or x.shape[2] != 7 or x.shape[3] != 7:
                raise ValueError(
                    "i3d conv_head (the reference classifier) requires a "
                    "(T>=2, 7, 7) final feature map — i.e. sample_size 224 "
                    f"and sample_duration >= 16; got map {x.shape[1:4]}. "
                    "Use the generic head (--i3d_conv_head 0) for other "
                    "input sizes.")
            x = nn.avg_pool(x, (2, 7, 7), (1, 1, 1), "VALID")
            x = Unit3D(self.num_classes, (7, 1, 1), use_bn=False,
                       activation=False, dtype=self.dtype,
                       name="conv3d_0c_1x1_custom")(x, train)
            # spatial dims are exactly 1 here; torch squeezes them then
            # means over T (i3d_byol.py:409-411)
            return jnp.mean(x.astype(jnp.float32), axis=(1, 2, 3))
        return jnp.mean(x.astype(jnp.float32), axis=(1, 2, 3))  # (B, 1024)
