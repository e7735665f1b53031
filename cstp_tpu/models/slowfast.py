"""SlowFast two-pathway video network (TPU-native rebuild of the reference's
deleted ``slowfast_fb`` model).

The reference repo ships only the BYTECODE of its SlowFast-era training loop
(``/root/reference/__pycache__/train_slowfast.cpython-37.pyc`` — source
deleted; disassembled with ``tools/py37_disasm.py``, reconstruction in
``docs/SLOWFAST.md``) plus two orphaned flags: ``--tau`` "A large stride of
slow path" (default 8) and ``--alpha`` "Frame rate ratio between fast and
slow" (default 4) (``/root/reference/opts.py:176-184``). The loop is a plain
supervised CE epoch where ``model_name == 'slowfast_fb'`` makes the batch a
``[slow_clip, fast_clip]`` pair. The model source does not survive; the
architecture is the cited public one — SlowFast networks (Feichtenhofer et
al., ICCV 2019, arXiv:1812.03982).

TPU-first design decisions:

* **One input tensor.** The two pathways see the SAME time span — slow =
  stride tau, fast = stride tau/alpha — so the slow clip is exactly the
  fast clip's every-alpha-th frame. The module takes only the FAST clip
  (B, T, H, W, 3) and derives the slow pathway as ``x[:, ::alpha]`` on
  device: zero loader/step changes, the whole finetune/test stack (loaders,
  on-device augmentation, sliding-window eval) works unchanged, and no
  second host->device transfer exists. ``--tau`` stays the *sampling*
  stride knob: the loader's frame stride is ``tau // alpha`` and a
  ``sample_duration`` of T fast frames spans ``T * tau / alpha`` raw frames.
* **Spatial-only downsampling** (the paper's design) maps well to XLA: all
  stage convs keep static temporal extent per pathway; the lateral
  time-strided convs are ordinary ``conv_general_dilated`` calls with
  temporal stride alpha.
* Channels-last NDHWC, bf16 compute / f32 BN statistics like every other
  backbone here (models/layers.py conventions).
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

# depth -> (block, per-stage block counts, expansion). Same table as the
# reference's 3D-ResNet factories (models/BE/r3d_byol.py:435-481).
SLOWFAST_LAYERS = {
    18: ("basic", (2, 2, 2, 2), 1),
    34: ("basic", (3, 4, 6, 3), 1),
    50: ("bottleneck", (3, 4, 6, 3), 4),
    101: ("bottleneck", (3, 4, 23, 3), 4),
}


def _conv(features, kernel, stride, padding, dtype, name, quant=""):
    # Conv3d is param-compatible with the previous nn.Conv (same
    # "<name>/kernel" path, DHWIO f32 param, glorot init, symmetric pads)
    # and carries the int8 quantization modes (--quant; ops/quant.py) into
    # both pathways and the lateral connections.
    return Conv3d(features, kernel, stride, padding, use_bias=False,
                  dtype=dtype, quant=quant, name=name)


class _SFBasic(nn.Module):
    """Basic residual block with a configurable temporal kernel on conv1 and
    spatial-only stride (SlowFast never downsamples time)."""

    planes: int
    t_kernel: int = 1       # 1 = degenerate temporal conv (slow early stages)
    stride: int = 1         # spatial
    dtype: Any = jnp.bfloat16
    bn_groups: int = 1
    quant: str = ""

    @nn.compact
    def __call__(self, x, train: bool = True):
        kt, pt = self.t_kernel, self.t_kernel // 2
        s = (1, self.stride, self.stride)
        out = _conv(self.planes, (kt, 3, 3), s, (pt, 1, 1), self.dtype,
                    "conv1", quant=self.quant)(x)
        out = BatchNorm(dtype=self.dtype, groups=self.bn_groups,
                        name="bn1")(out, not train)
        out = nn.relu(out).astype(self.dtype)
        out = _conv(self.planes, (1, 3, 3), (1, 1, 1), (0, 1, 1), self.dtype,
                    "conv2", quant=self.quant)(out)
        out = BatchNorm(dtype=self.dtype, groups=self.bn_groups,
                        name="bn2")(out, not train)
        if self.stride != 1 or x.shape[-1] != self.planes:
            res = _conv(self.planes, (1, 1, 1), s, (0, 0, 0), self.dtype,
                        "downsample_conv", quant=self.quant)(x)
            res = BatchNorm(dtype=self.dtype, groups=self.bn_groups,
                            name="downsample_bn")(res, not train)
        else:
            res = x
        return nn.relu(out.astype(jnp.float32)
                       + res.astype(jnp.float32)).astype(self.dtype)


class _SFBottleneck(nn.Module):
    """Bottleneck block; the temporal kernel lives on the first 1x1 conv
    (arXiv:1812.03982 table 1)."""

    planes: int
    t_kernel: int = 1
    stride: int = 1
    dtype: Any = jnp.bfloat16
    bn_groups: int = 1
    quant: str = ""

    @nn.compact
    def __call__(self, x, train: bool = True):
        kt, pt = self.t_kernel, self.t_kernel // 2
        s = (1, self.stride, self.stride)
        out = _conv(self.planes, (kt, 1, 1), (1, 1, 1), (pt, 0, 0),
                    self.dtype, "conv1", quant=self.quant)(x)
        out = BatchNorm(dtype=self.dtype, groups=self.bn_groups,
                        name="bn1")(out, not train)
        out = nn.relu(out).astype(self.dtype)
        out = _conv(self.planes, (1, 3, 3), s, (0, 1, 1), self.dtype,
                    "conv2", quant=self.quant)(out)
        out = BatchNorm(dtype=self.dtype, groups=self.bn_groups,
                        name="bn2")(out, not train)
        out = nn.relu(out).astype(self.dtype)
        out = _conv(self.planes * 4, (1, 1, 1), (1, 1, 1), (0, 0, 0),
                    self.dtype, "conv3", quant=self.quant)(out)
        out = BatchNorm(dtype=self.dtype, groups=self.bn_groups,
                        name="bn3")(out, not train)
        if self.stride != 1 or x.shape[-1] != self.planes * 4:
            res = _conv(self.planes * 4, (1, 1, 1), s, (0, 0, 0), self.dtype,
                        "downsample_conv", quant=self.quant)(x)
            res = BatchNorm(dtype=self.dtype, groups=self.bn_groups,
                            name="downsample_bn")(res, not train)
        else:
            res = x
        return nn.relu(out.astype(jnp.float32)
                       + res.astype(jnp.float32)).astype(self.dtype)


class _Lateral(nn.Module):
    """Fast->slow lateral connection: time-strided conv (5, 1, 1) stride
    (alpha, 1, 1) producing 2*C_fast channels, concatenated onto the slow
    pathway (arXiv:1812.03982 §3.2 "time-strided convolution")."""

    alpha: int
    dtype: Any = jnp.bfloat16
    bn_groups: int = 1
    quant: str = ""

    @nn.compact
    def __call__(self, fast, train: bool = True):
        c = fast.shape[-1]
        out = _conv(2 * c, (5, 1, 1), (self.alpha, 1, 1), (2, 0, 0),
                    self.dtype, "conv", quant=self.quant)(fast)
        out = BatchNorm(dtype=self.dtype, groups=self.bn_groups,
                        name="bn")(out, not train)
        return nn.relu(out).astype(self.dtype)


class SlowFastNet(nn.Module):
    """Two-pathway feature extractor.

    Input: the FAST clip (B, T, H, W, 3); the slow pathway runs on
    ``x[:, ::alpha]``. Output: concatenated GAP features of both pathways,
    ``(512 + 512/beta_inv) * expansion`` dims (576 @ depth 18/34,
    2304 @ depth 50/101).
    """

    depth: int = 18
    alpha: int = 4            # frame-rate ratio fast/slow (--alpha)
    beta_inv: int = 8         # slow/fast channel ratio (paper beta = 1/8)
    shortcut: str = "B"       # accepted for registry uniformity (projection
    #                           shortcuts only — 'A' falls back to 'B')
    dtype: Any = jnp.bfloat16
    bn_groups: int = 1
    proj_flag: bool = False   # no BYOL projector (supervised-era model)
    quant: str = ""           # '' | int8 modes threaded to every conv site

    @nn.compact
    def __call__(self, x, train: bool = True):
        block, counts, _ = SLOWFAST_LAYERS.get(self.depth, SLOWFAST_LAYERS[18])
        block_cls = _SFBasic if block == "basic" else _SFBottleneck
        assert x.shape[1] % self.alpha == 0, (
            f"fast-path length {x.shape[1]} not divisible by alpha={self.alpha}")
        x = x.astype(self.dtype)
        slow, fast = x[:, :: self.alpha], x

        # stems: slow 1x7x7 C=64; fast 5x7x7 C=64/beta_inv (paper table 1)
        cf = max(64 // self.beta_inv, 8)
        slow = _conv(64, (1, 7, 7), (1, 2, 2), (0, 3, 3), self.dtype,
                     "slow_conv1", quant=self.quant)(slow)
        slow = BatchNorm(dtype=self.dtype, groups=self.bn_groups,
                         name="slow_bn1")(slow, not train)
        slow = nn.relu(slow).astype(self.dtype)
        slow = max_pool_3d(slow, (1, 3, 3), (1, 2, 2), (0, 1, 1))
        fast = _conv(cf, (5, 7, 7), (1, 2, 2), (2, 3, 3), self.dtype,
                     "fast_conv1", quant=self.quant)(fast)
        fast = BatchNorm(dtype=self.dtype, groups=self.bn_groups,
                         name="fast_bn1")(fast, not train)
        fast = nn.relu(fast).astype(self.dtype)
        fast = max_pool_3d(fast, (1, 3, 3), (1, 2, 2), (0, 1, 1))
        slow = jnp.concatenate(
            [slow, _Lateral(self.alpha, self.dtype, self.bn_groups,
                            quant=self.quant,
                            name="lateral_pool1")(fast, train)], axis=-1)

        # slow temporal kernels degenerate (1) in res2/3, real (3) in res4/5;
        # fast has temporal kernel 3 throughout (paper table 1)
        slow_kt = (1, 1, 3, 3)
        for li, blocks in enumerate(counts):
            planes_s, planes_f = 64 * 2 ** li, cf * 2 ** li
            for bi in range(blocks):
                stride = 2 if (li > 0 and bi == 0) else 1
                slow = block_cls(planes_s, slow_kt[li], stride,
                                 dtype=self.dtype, bn_groups=self.bn_groups,
                                 quant=self.quant,
                                 name=f"slow_layer{li + 1}_block{bi + 1}",
                                 )(slow, train)
                fast = block_cls(planes_f, 3, stride, dtype=self.dtype,
                                 bn_groups=self.bn_groups, quant=self.quant,
                                 name=f"fast_layer{li + 1}_block{bi + 1}",
                                 )(fast, train)
            if li < len(counts) - 1:  # no lateral after the last stage
                slow = jnp.concatenate(
                    [slow, _Lateral(self.alpha, self.dtype, self.bn_groups,
                                    quant=self.quant,
                                    name=f"lateral_res{li + 2}",
                                    )(fast, train)], axis=-1)

        pooled_s = jnp.mean(slow.astype(jnp.float32), axis=(1, 2, 3))
        pooled_f = jnp.mean(fast.astype(jnp.float32), axis=(1, 2, 3))
        return jnp.concatenate([pooled_s, pooled_f], axis=-1)


def slowfast_feat_dim(depth: int, beta_inv: int = 8) -> int:
    _, _, expansion = SLOWFAST_LAYERS.get(depth, SLOWFAST_LAYERS[18])
    cf = max(64 // beta_inv, 8)
    return (512 + 8 * cf) * expansion
