"""R(2+1)D backbone — the flagship CSTP encoder.

TPU-native Flax reimplementation of the reference ``R2Plus1DNet``
(``models/pace/r21d_byol.py:184-229``): a 5-stage ResNet of factorized
(2+1)D convolutions, ``layer_sizes`` blocks per stage, global average pool
to a 512-d feature. NDHWC layout, bf16 compute, f32 params/BN.

Depth map (reference passes layer_sizes=(1,1,1,1), "depth" flag 1):
  depth 1  -> (1, 1, 1, 1)   (the paper/reference config)
  depth 18 -> (2, 2, 2, 2)
  depth 34 -> (3, 4, 6, 3)
"""

from __future__ import annotations

from typing import Any, Tuple

import jax.numpy as jnp
from flax import linen as nn

from cstp_tpu.models.layers import (
    BatchNorm,
    MLPHead,
    SpatioTemporalConv,
    tag_bnrelu,
)

LAYER_SIZES = {1: (1, 1, 1, 1), 10: (1, 1, 1, 1), 18: (2, 2, 2, 2), 34: (3, 4, 6, 3)}


class SpatioTemporalResBlock(nn.Module):
    """conv -> BN -> ReLU -> conv -> BN -> (+shortcut) -> ReLU
    (reference r21d_byol.py:100-148)."""

    features: int
    downsample: bool = False
    dtype: Any = jnp.bfloat16
    bn_groups: int = 1
    fused_conv: bool = False
    mid_round: int = 1
    t_fold: bool = False
    quant: str = ""

    @nn.compact
    def __call__(self, x, train: bool = True):
        stride = (2, 2, 2) if self.downsample else (1, 1, 1)
        res = SpatioTemporalConv(
            self.features, (3, 3, 3), stride, (1, 1, 1),
            dtype=self.dtype, bn_groups=self.bn_groups,
            fused=self.fused_conv, mid_round=self.mid_round,
            t_fold=self.t_fold, quant=self.quant, name="conv1",
        )(x, train)
        res = BatchNorm(dtype=self.dtype, groups=self.bn_groups, name="bn1")(res, not train)
        res = tag_bnrelu(nn.relu(res).astype(self.dtype))
        res = SpatioTemporalConv(
            self.features, (3, 3, 3), (1, 1, 1), (1, 1, 1),
            dtype=self.dtype, bn_groups=self.bn_groups,
            fused=self.fused_conv, mid_round=self.mid_round,
            t_fold=self.t_fold, quant=self.quant, name="conv2",
        )(res, train)
        res = BatchNorm(dtype=self.dtype, groups=self.bn_groups, name="bn2")(res, not train)

        if self.downsample:
            x = SpatioTemporalConv(
                self.features, (1, 1, 1), (2, 2, 2), (0, 0, 0),
                dtype=self.dtype, bn_groups=self.bn_groups,
                mid_round=self.mid_round, t_fold=self.t_fold,
                quant=self.quant, name="downsampleconv",
            )(x, train)
            x = BatchNorm(dtype=self.dtype, groups=self.bn_groups, name="downsamplebn")(x, not train)

        return tag_bnrelu(
            tag_bnrelu(
                nn.relu(x.astype(jnp.float32) + res.astype(jnp.float32))
            ).astype(self.dtype)
        )


class SpatioTemporalResLayer(nn.Module):
    """First block (optionally downsampling) + (layer_size-1) identity blocks
    (reference r21d_byol.py:151-181)."""

    features: int
    layer_size: int
    downsample: bool = False
    dtype: Any = jnp.bfloat16
    bn_groups: int = 1
    fused_conv: bool = False
    mid_round: int = 1
    t_fold: bool = False
    quant: str = ""

    @nn.compact
    def __call__(self, x, train: bool = True):
        x = SpatioTemporalResBlock(
            self.features, self.downsample, dtype=self.dtype,
            bn_groups=self.bn_groups, fused_conv=self.fused_conv,
            mid_round=self.mid_round, t_fold=self.t_fold, quant=self.quant, name="block1"
        )(x, train)
        for i in range(self.layer_size - 1):
            x = SpatioTemporalResBlock(
                self.features, False, dtype=self.dtype,
                bn_groups=self.bn_groups, fused_conv=self.fused_conv,
                mid_round=self.mid_round, t_fold=self.t_fold, quant=self.quant, name=f"block{i + 2}"
            )(x, train)
        return x


class R2Plus1DNet(nn.Module):
    """Returns 512-d pooled features; with ``proj_flag`` also the 512-d BYOL
    projection (reference r21d_byol.py:184-229)."""

    layer_sizes: Tuple[int, int, int, int] = (1, 1, 1, 1)
    proj_flag: bool = False
    dtype: Any = jnp.bfloat16
    bn_groups: int = 1
    # rematerialize residual stages in backward (jax.checkpoint): trades
    # recompute FLOPs for activation HBM, unlocking larger per-chip batches
    # (PERF.md: b>=96 OOMs at compile without it). Off by default — the
    # train program is bandwidth-bound and remat adds traffic.
    remat: bool = False
    # selective remat: '' (off) | 'bnrelu' — keep every conv output as a
    # residual but recompute the tagged wide BN/ReLU activations in backward
    # (layers.tag_bnrelu); cuts saved-activation HBM traffic without the
    # full-remat conv recompute that measured -13% (PERF.md round 3)
    remat_policy: str = ""
    # exact space-to-depth stem (--s2d_stem): same parameters/numerics,
    # denser MXU contraction in the stride-2 stem conv (layers.SpatialS2DConv)
    s2d_stem: bool = False
    # Pallas-fused spatial->BN->ReLU->temporal chain for the stride-1 blocks
    # (--fused_conv; ops/pallas/conv21d.py)
    fused_conv: bool = False
    # round factorized mid-channel widths to multiples of N (--mid_round;
    # 128 = TPU lane width). Changes parameter shapes — an explicit
    # TPU-variant model, see layers.r21d_intermediate_channels
    mid_round: int = 1
    # T-folded spatial convs with folded BN+ReLU (--t_fold; numerically
    # identical, see layers.SpatioTemporalConv.t_fold)
    t_fold: bool = False
    quant: str = ""

    @nn.compact
    def __call__(self, x, train: bool = True):
        # stem: (3,7,7) stride (1,2,2) factorized conv + BN + ReLU
        x = x.astype(self.dtype)
        x = SpatioTemporalConv(
            64, (3, 7, 7), (1, 2, 2), (1, 3, 3), dtype=self.dtype,
            bn_groups=self.bn_groups, s2d=self.s2d_stem,
            mid_round=self.mid_round, t_fold=self.t_fold, quant=self.quant, name="conv1"
        )(x, train)
        x = BatchNorm(dtype=self.dtype, groups=self.bn_groups, name="bn1")(x, not train)
        x = nn.relu(x).astype(self.dtype)
        if self.remat:
            Layer = nn.remat(SpatioTemporalResLayer, static_argnums=(2,))
        elif self.remat_policy == "bnrelu":
            import jax

            Layer = nn.remat(
                SpatioTemporalResLayer, static_argnums=(2,),
                policy=jax.checkpoint_policies
                .save_anything_except_these_names("bnrelu"),
            )
        else:
            Layer = SpatioTemporalResLayer
        x = Layer(
            64, self.layer_sizes[0], False, dtype=self.dtype,
            bn_groups=self.bn_groups, fused_conv=self.fused_conv,
            mid_round=self.mid_round, t_fold=self.t_fold, quant=self.quant, name="conv2"
        )(x, train)
        x = Layer(
            128, self.layer_sizes[1], True, dtype=self.dtype,
            bn_groups=self.bn_groups, fused_conv=self.fused_conv,
            mid_round=self.mid_round, t_fold=self.t_fold, quant=self.quant, name="conv3"
        )(x, train)
        x = Layer(
            256, self.layer_sizes[2], True, dtype=self.dtype,
            bn_groups=self.bn_groups, fused_conv=self.fused_conv,
            mid_round=self.mid_round, t_fold=self.t_fold, quant=self.quant, name="conv4"
        )(x, train)
        x = Layer(
            512, self.layer_sizes[3], True, dtype=self.dtype,
            bn_groups=self.bn_groups, fused_conv=self.fused_conv,
            mid_round=self.mid_round, t_fold=self.t_fold, quant=self.quant, name="conv5"
        )(x, train)
        # global average pool over (T, H, W) -> (B, 512), f32 like the torch
        # AdaptiveAvgPool3d output feeding f32 heads
        feat = jnp.mean(x.astype(jnp.float32), axis=(1, 2, 3))
        if self.proj_flag:
            proj = MLPHead(4096, 512, dtype=self.dtype, bn_groups=self.bn_groups, name="project")(feat, train)
            return feat, proj
        return feat
