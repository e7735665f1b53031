"""Legacy "pace-era" models (reference ``models/pace/{r21d,c3d,r3d,s3d_g}.py``).

These predate the CSTP BYOL recipe: they are the NT-Xent/contrastive-era
model zoo whose training loop (``train.py``) was deleted from the reference
(it survives only as bytecode, SURVEY §2.5).  None of them are dispatchable
from the reference's live factory (``models/model.py``) except the bare
``r21d`` name, whose project-head behavior is rebuilt in
:class:`cstp_tpu.ssl.byol.CSTPClassify` (``head_style='pace_project'``,
``--legacy_pace``).  The rest are rebuilt here, in full, for component
parity (SURVEY §2.2 rows "R(2+1)D legacy pace", "C3D legacy", "R3D legacy
pace", "S3D-G legacy pace"):

* :class:`LegacyProjector` — ``pace/r21d.py:242-256`` (Projector with a
  *trailing* BN+ReLU, unlike the BYOL-era projector).
* :class:`LegacyR21DPace` — ``pace/r21d.py:184-238`` (``R2Plus1DNet`` with
  the ``linear_flag`` head switch: 'linear' or 'project'); the trunk is
  byte-identical to ``pace/r21d_byol.py`` (verified by diff), so it reuses
  :class:`cstp_tpu.models.r21d.R2Plus1DNet`.
* :class:`LegacyR21DBYOL` — ``pace/r21d.py:271-357``: online/target towers
  of project-headed nets, the ``Pridictor`` [sic] MLP, the 10x-scaled
  symmetric BYOL regression loss (``_cal_loss``, line 339), and the
  ``ft_fc`` classify head.  EMA lives in the train step (as in our main
  engine) with the same update-before-target-forward ordering the
  reference uses (``r21d.py:343-347``).
* :class:`LegacyC3D` — ``pace/c3d.py:26-117``: the C3D trunk (identical to
  ``c3d_byol.py``'s, verified by diff) with the two-head ``ctr``/``cls``
  forward.
* :class:`LegacyR3DNet` — ``pace/r3d.py:10-167``: a FULL-3D-conv ResNet
  (its ``SpatioTemporalConv`` is a plain Conv3d, not factorized) with a
  4-way speed head.
* :class:`LegacyS3DG` — ``pace/s3d_g.py:222-330`` (``s3d_g_byol.py`` is
  byte-identical): the MIL-NCE-style S3D-G with per-branch self-gating
  Inception blocks, TF-SAME max pools, and the "3D space to depth trick
  for TPU optimization" stem (lines 280-287) — a genuinely different
  architecture from the coclr S3D in :mod:`cstp_tpu.models.s3dg`.

All modules are NDHWC / bf16-compute / f32-stats like the rest of the
package, and are weight-transplant parity-tested against the reference
modules in ``tests/test_legacy.py``.
"""

from __future__ import annotations

from typing import Any, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from cstp_tpu.models.c3d import C3D
from cstp_tpu.models.layers import (
    BatchNorm,
    MLPHead,
    SelfGating,
    glorot_conv_init,
    max_pool_3d,
    max_pool_3d_same,
    torch_linear_bias_init,
)
from cstp_tpu.models.r21d import R2Plus1DNet

# the legacy loss formula is identical to the live engine's
# (pace/r21d.py:334-338 == r21d_byol.py:346-349) — share one implementation
from cstp_tpu.ssl.byol import byol_regression_loss as _byol_regression

# pace/s3d_g.py _space_to_depth (lines 280-287): the same permutation as the
# coclr s2d stem already rebuilt in models/s3dg.py — reused, not duplicated.
from cstp_tpu.models.s3dg import space_to_depth_stem as legacy_space_to_depth


def _dense(out: int, in_dim: int, name: str) -> nn.Dense:
    return nn.Dense(
        out,
        dtype=jnp.float32,
        param_dtype=jnp.float32,
        kernel_init=nn.initializers.glorot_uniform(),
        bias_init=torch_linear_bias_init(in_dim),
        name=name,
    )


class LegacyProjector(nn.Module):
    """Linear-BN-ReLU-Linear-BN-ReLU (pace/r21d.py:242-256).

    The BYOL-era projector (r21d_byol.py:232-245 = our MLPHead) stops at the
    second Linear; this legacy one adds a trailing BN+ReLU.
    """

    out: int = 512
    hidden: int = 4096
    dtype: Any = jnp.bfloat16
    bn_groups: int = 1

    @nn.compact
    def __call__(self, x, train: bool = True):
        x = MLPHead(self.hidden, self.out, dtype=self.dtype,
                    bn_groups=self.bn_groups, name="mlp")(x, train)
        x = BatchNorm(dtype=self.dtype, groups=self.bn_groups,
                      name="bn2")(x, not train)
        return nn.relu(x.astype(jnp.float32))


class LegacyR21DPace(nn.Module):
    """pace/r21d.py R2Plus1DNet(linear_flag=...) (lines 184-238).

    'linear'  -> Linear(512, num_classes) speed head.
    'project' -> LegacyProjector output (512-d) — the head the reference's
                 live factory builds for bare ``--model_name r21d``
                 (models/model.py:41-43).
    """

    linear_flag: str = "project"
    num_classes: int = 4
    layer_sizes: Tuple[int, int, int, int] = (1, 1, 1, 1)
    dtype: Any = jnp.bfloat16
    bn_groups: int = 1

    @nn.compact
    def __call__(self, x, train: bool = True):
        feat = R2Plus1DNet(self.layer_sizes, proj_flag=False,
                           dtype=self.dtype, bn_groups=self.bn_groups,
                           name="trunk")(x, train)
        if self.linear_flag == "linear":
            return _dense(self.num_classes, 512, "linear")(feat)
        return LegacyProjector(dtype=self.dtype, bn_groups=self.bn_groups,
                               name="project")(feat, train)


class LegacyR21DBYOL(nn.Module):
    """pace/r21d.py R21DBYOL (lines 271-357).

    Differences from the live CSTP engine (ssl/byol.py CSTPPretrain): towers
    carry the legacy trailing-BN-ReLU projector INSIDE the net, the
    predictor is the 'Pridictor' MLP (Linear-BN-ReLU-Linear, lines 259-269),
    the loss is 10x-scaled (``_cal_loss``, line 339), and there are no
    pretext heads.  EMA of the target tower is applied by the train step
    BEFORE the target forward (reference ordering, lines 343-347) via
    :func:`cstp_tpu.ssl.byol.ema_update` on the ``target_net`` subtree.
    """

    num_classes: int = 4
    momentum: float = 0.996  # consumed by the train step's ema_update
    layer_sizes: Tuple[int, int, int, int] = (1, 1, 1, 1)
    dtype: Any = jnp.bfloat16
    bn_groups: int = 1

    def setup(self):
        kw = dict(linear_flag="project", layer_sizes=self.layer_sizes,
                  dtype=self.dtype, bn_groups=self.bn_groups)
        self.online_net = LegacyR21DPace(name="online_net", **kw)
        self.target_net = LegacyR21DPace(name="target_net", **kw)
        # reference 'Pridictor' (sic): Linear(512,4096)-BN-ReLU-Linear(4096,512)
        self.prodictor = MLPHead(4096, 512, dtype=self.dtype,
                                 bn_groups=self.bn_groups, name="prodictor")
        self.classify = _dense(self.num_classes, 512, "classify")

    def __call__(self, x1, x2, train: bool = True):
        """o_type='r_byol' (pace/r21d.py:342-353): mean of the 10x-scaled
        symmetric BYOL regression loss over the batch."""
        if self.is_initializing():  # materialize the ft_fc head's params
            self.classify(jnp.zeros((1, 512), jnp.float32))
        o1 = self.prodictor(self.online_net(x1, train), train)
        o2 = self.prodictor(self.online_net(x2, train), train)
        t1 = jax.lax.stop_gradient(self.target_net(x1, train))
        t2 = jax.lax.stop_gradient(self.target_net(x2, train))
        loss = _byol_regression(o1, t2) + _byol_regression(o2, t1)
        return jnp.mean(10.0 * loss)

    def classify_forward(self, x, train: bool = False):
        """o_type='ft_fc' (pace/r21d.py:354-357): classify the 512-d
        project-head output of the online tower."""
        return self.classify(self.online_net(x, train))


class LegacyC3D(nn.Module):
    """pace/c3d.py C3D (lines 26-117): the c3d_byol trunk plus a classify
    head and the two-head ``ctr``/``cls`` forward."""

    num_classes: int = 4
    dtype: Any = jnp.bfloat16
    bn_groups: int = 1

    def setup(self):
        self.trunk = C3D(dtype=self.dtype, bn_groups=self.bn_groups,
                         name="trunk")
        self.classify = _dense(self.num_classes, 512, "classify")

    def __call__(self, x1, x2, train: bool = True):
        """o_type='ctr' (c3d.py:108-112): the two clips' 512-d features."""
        if self.is_initializing():  # materialize the cls head's params
            self.classify(jnp.zeros((1, 512), jnp.float32))
        return self.trunk(x1, train), self.trunk(x2, train)

    def cls(self, x, train: bool = True):
        """o_type='cls' (c3d.py:113-116)."""
        return self.classify(self.trunk(x, train))


class _FullConv3d(nn.Module):
    """pace/r3d.py SpatioTemporalConv (lines 10-38) — despite its name, a
    plain full-3D Conv3d (bias off by default there)."""

    features: int
    kernel: Tuple[int, int, int]
    stride: Tuple[int, int, int] = (1, 1, 1)
    padding: Tuple[int, int, int] = (0, 0, 0)
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        return nn.Conv(
            self.features, self.kernel, self.stride,
            [(p, p) for p in self.padding], use_bias=False,
            dtype=self.dtype, param_dtype=jnp.float32,
            kernel_init=glorot_conv_init(), name="conv",
        )(x)


class _LegacyR3DBlock(nn.Module):
    """pace/r3d.py SpatioTemporalResBlock (lines 41-90): full-3D
    conv-BN-ReLU-conv-BN + (optionally strided 1x1x1) shortcut, sum, ReLU."""

    features: int
    downsample: bool = False
    dtype: Any = jnp.bfloat16
    bn_groups: int = 1

    @nn.compact
    def __call__(self, x, train: bool = True):
        stride = (2, 2, 2) if self.downsample else (1, 1, 1)
        res = _FullConv3d(self.features, (3, 3, 3), stride, (1, 1, 1),
                          dtype=self.dtype, name="conv1")(x)
        res = BatchNorm(dtype=self.dtype, groups=self.bn_groups,
                        name="bn1")(res, not train)
        res = nn.relu(res).astype(self.dtype)
        res = _FullConv3d(self.features, (3, 3, 3), (1, 1, 1), (1, 1, 1),
                          dtype=self.dtype, name="conv2")(res)
        res = BatchNorm(dtype=self.dtype, groups=self.bn_groups,
                        name="bn2")(res, not train)
        if self.downsample:
            x = _FullConv3d(self.features, (1, 1, 1), (2, 2, 2),
                            dtype=self.dtype, name="downsampleconv")(x)
            x = BatchNorm(dtype=self.dtype, groups=self.bn_groups,
                          name="downsamplebn")(x, not train)
        return nn.relu(x + res).astype(self.dtype)


class LegacyR3DNet(nn.Module):
    """pace/r3d.py R3DNet (lines 125-167): full-3D ResNet with the 4-way
    playback-speed head.  Distinct from models/r3d.py (the BE-family
    depth-parametrized 3D ResNet): this one mirrors the R(2+1)D layer
    layout but with unfactorized convolutions."""

    layer_sizes: Tuple[int, int, int, int] = (1, 1, 1, 1)
    num_classes: int = 4
    dtype: Any = jnp.bfloat16
    bn_groups: int = 1

    @nn.compact
    def __call__(self, x, train: bool = True):
        x = x.astype(self.dtype)
        x = _FullConv3d(64, (3, 7, 7), (1, 2, 2), (1, 3, 3),
                        dtype=self.dtype, name="conv1")(x)
        x = BatchNorm(dtype=self.dtype, groups=self.bn_groups,
                      name="bn1")(x, not train)
        x = nn.relu(x).astype(self.dtype)
        for i, (feats, down) in enumerate(
                zip((64, 128, 256, 512), (False, True, True, True))):
            for b in range(self.layer_sizes[i]):
                x = _LegacyR3DBlock(
                    feats, downsample=down and b == 0, dtype=self.dtype,
                    bn_groups=self.bn_groups, name=f"conv{i + 2}_b{b + 1}",
                )(x, train)
        feat = jnp.mean(x.astype(jnp.float32), axis=(1, 2, 3))
        return _dense(self.num_classes, 512, "linear")(feat)


class _LegacySTConv3d(nn.Module):
    """pace/s3d_g.py STConv3D (lines 76-133): conv-BN-ReLU, optionally
    separable (spatial conv-BN-ReLU then temporal conv-BN-ReLU)."""

    features: int
    kernel: Tuple[int, int, int]
    stride: Tuple[int, int, int] = (1, 1, 1)
    padding: Tuple[int, int, int] = (0, 0, 0)
    separable: bool = False
    dtype: Any = jnp.bfloat16
    bn_groups: int = 1

    @nn.compact
    def __call__(self, x, train: bool = True):
        def conv_bn_relu(x, kernel, stride, padding, name):
            x = nn.Conv(
                self.features, kernel, stride, [(p, p) for p in padding],
                use_bias=False, dtype=self.dtype, param_dtype=jnp.float32,
                kernel_init=glorot_conv_init(), name=f"conv{name}",
            )(x)
            x = BatchNorm(dtype=self.dtype, groups=self.bn_groups,
                          name=f"bn{name}")(x, not train)
            return nn.relu(x).astype(self.dtype)

        kt, kh, kw = self.kernel
        if self.separable and kt != 1:
            st, sh, sw = self.stride
            pt, ph, pw = self.padding
            x = conv_bn_relu(x, (1, kh, kw), (1, sh, sw), (0, ph, pw), "1")
            x = conv_bn_relu(x, (kt, 1, 1), (st, 1, 1), (pt, 0, 0), "2")
            return x
        return conv_bn_relu(x, self.kernel, self.stride, self.padding, "1")


class _LegacyInception(nn.Module):
    """pace/s3d_g.py InceptionBlock (lines 9-59): four branches, each
    self-gated (gating defaults on and the reference never turns it off)."""

    b0: int
    b1a: int
    b1b: int
    b2a: int
    b2b: int
    b3b: int
    dtype: Any = jnp.bfloat16
    bn_groups: int = 1

    @nn.compact
    def __call__(self, x, train: bool = True):
        kw = dict(dtype=self.dtype, bn_groups=self.bn_groups)
        one = (1, 1, 1)
        br0 = _LegacySTConv3d(self.b0, one, name="conv_b0", **kw)(x, train)
        br1 = _LegacySTConv3d(self.b1a, one, name="conv_b1_a", **kw)(x, train)
        br1 = _LegacySTConv3d(self.b1b, (3, 3, 3), padding=one,
                              separable=True, name="conv_b1_b", **kw)(br1, train)
        br2 = _LegacySTConv3d(self.b2a, one, name="conv_b2_a", **kw)(x, train)
        br2 = _LegacySTConv3d(self.b2b, (3, 3, 3), padding=one,
                              separable=True, name="conv_b2_b", **kw)(br2, train)
        br3 = max_pool_3d(x, (3, 3, 3), (1, 1, 1), (1, 1, 1))
        br3 = _LegacySTConv3d(self.b3b, one, name="conv_b3_b", **kw)(br3, train)
        br0 = SelfGating(dtype=self.dtype, name="gating_b0")(br0)
        br1 = SelfGating(dtype=self.dtype, name="gating_b1")(br1)
        br2 = SelfGating(dtype=self.dtype, name="gating_b2")(br2)
        br3 = SelfGating(dtype=self.dtype, name="gating_b3")(br3)
        return jnp.concatenate([br0, br1, br2, br3], axis=-1)




class LegacyS3DG(nn.Module):
    """pace/s3d_g.py S3D (lines 222-330) — the MIL-NCE-style S3D-G.

    Structurally distinct from the coclr S3D (models/s3dg.py): non-separable
    stem + 1x1x1 conv_2b, self-gating after conv_2c AND inside every
    Inception branch, TF-SAME max pools throughout, Linear head on the
    1024-d pooled feature.  Two reference quirks kept faithfully: the
    constructor's ``gating`` flag is overwritten by the gating *module*
    (line 239), so gating is ALWAYS applied regardless of the flag; and the
    space-to-depth stem crops one leading element of T/H/W after conv1
    (line 299) to replicate TF-SAME alignment.
    """

    num_classes: int = 512
    space_to_depth: bool = True
    dtype: Any = jnp.bfloat16
    bn_groups: int = 1

    @nn.compact
    def __call__(self, x, train: bool = True):
        kw = dict(dtype=self.dtype, bn_groups=self.bn_groups)
        x = x.astype(self.dtype)
        if self.space_to_depth:
            x = legacy_space_to_depth(x)
            x = _LegacySTConv3d(64, (2, 4, 4), (1, 1, 1), (1, 2, 2),
                                name="conv1", **kw)(x, train)
            x = x[:, 1:, 1:, 1:, :]
        else:
            x = _LegacySTConv3d(64, (3, 7, 7), (2, 2, 2), (1, 3, 3),
                                name="conv1", **kw)(x, train)
        x = max_pool_3d_same(x, (1, 3, 3), (1, 2, 2))
        x = _LegacySTConv3d(64, (1, 1, 1), name="conv_2b", **kw)(x, train)
        x = _LegacySTConv3d(192, (3, 3, 3), padding=(1, 1, 1), separable=True,
                            name="conv_2c", **kw)(x, train)
        x = SelfGating(dtype=self.dtype, name="gating")(x)  # always on
        x = max_pool_3d_same(x, (1, 3, 3), (1, 2, 2))
        x = _LegacyInception(64, 96, 128, 16, 32, 32,
                             name="mixed_3b", **kw)(x, train)
        x = _LegacyInception(128, 128, 192, 32, 96, 64,
                             name="mixed_3c", **kw)(x, train)
        x = max_pool_3d_same(x, (3, 3, 3), (2, 2, 2))
        x = _LegacyInception(192, 96, 208, 16, 48, 64,
                             name="mixed_4b", **kw)(x, train)
        x = _LegacyInception(160, 112, 224, 24, 64, 64,
                             name="mixed_4c", **kw)(x, train)
        x = _LegacyInception(128, 128, 256, 24, 64, 64,
                             name="mixed_4d", **kw)(x, train)
        x = _LegacyInception(112, 144, 288, 32, 64, 64,
                             name="mixed_4e", **kw)(x, train)
        x = _LegacyInception(256, 160, 320, 32, 128, 128,
                             name="mixed_4f", **kw)(x, train)
        x = max_pool_3d_same(x, (2, 2, 2), (2, 2, 2))
        x = _LegacyInception(256, 160, 320, 32, 128, 128,
                             name="mixed_5b", **kw)(x, train)
        x = _LegacyInception(384, 192, 384, 48, 128, 128,
                             name="mixed_5c", **kw)(x, train)
        feat = jnp.mean(x.astype(jnp.float32), axis=(1, 2, 3))  # (B, 1024)
        return _dense(self.num_classes, feat.shape[-1], "fc")(feat)


_LEGACY = {
    "r21d": LegacyR21DPace,
    "r21d_byol": LegacyR21DBYOL,
    "c3d": LegacyC3D,
    "r3d": LegacyR3DNet,
    "s3d_g": LegacyS3DG,
}


def make_legacy_model(name: str, **kwargs) -> nn.Module:
    """Instantiate a legacy pace model by its reference file name."""
    if name not in _LEGACY:
        raise ValueError(f"unknown legacy model {name!r}; have {sorted(_LEGACY)}")
    return _LEGACY[name](**kwargs)
