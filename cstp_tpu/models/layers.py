"""Shared Flax building blocks for the CSTP backbones.

Layout is NDHWC (channels last) — the native TPU conv layout — whereas the
reference is NCDHW torch. Convs/matmuls run in ``dtype`` (bfloat16 by
default); BatchNorm statistics and all parameters stay float32.

Initialization parity with the reference (``models/pace/r21d_byol.py:301-329``):
the reference glorot-uniform-initializes EVERY weight, including BatchNorm
scales (giving BN scales ~U(-sqrt(6/C), sqrt(6/C)) — tiny and random-sign,
which materially changes early training dynamics, so we reproduce it).
Linear/conv biases keep torch defaults (uniform ±1/sqrt(fan_in); convs here
are bias-free as in the reference).
"""

from __future__ import annotations

import math
from typing import Any, Callable, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = Any


def bn_glorot_scale_init(key, shape, dtype=jnp.float32):
    """Reference `_glorot_uniform` on a 1-D tensor: fan_in = fan_out = C/2
    -> bound sqrt(6 / C) (r21d_byol.py:311-329)."""
    c = shape[-1]
    bound = math.sqrt(6.0 / float(c))
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def torch_linear_bias_init(fan_in: int) -> Callable:
    bound = 1.0 / math.sqrt(fan_in) if fan_in > 0 else 0.0

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


def glorot_conv_init():
    """Glorot uniform over conv kernels (HWIO-style fans) — matches the
    reference's custom _glorot_uniform on torch conv weights."""
    return nn.initializers.glorot_uniform()


def tag_bnrelu(x):
    """``checkpoint_name`` tag on BN/ReLU outputs, consumed by the 'bnrelu'
    selective-remat policy (``--remat_policy bnrelu``): under
    ``save_anything_except_these_names('bnrelu')`` the backward pass keeps
    every conv output as a residual but RECOMPUTES these cheap elementwise
    tensors from it — the wide post-BN / post-ReLU activations (144/230/288
    mid channels, lane-padded in HBM) are never saved. A no-op identity when
    no remat policy is active."""
    from jax.ad_checkpoint import checkpoint_name

    return checkpoint_name(x, "bnrelu")


class BatchNorm(nn.Module):
    """BatchNorm with torch semantics (momentum 0.1 torch == 0.9 flax,
    eps 1e-5) and the reference's glorot-uniform scale init.

    ``groups=1`` (default, ``--sync_bn 1``): batch statistics are computed
    over the GLOBAL batch — under jit/GSPMD a mean over a sharded batch axis
    lowers to a cross-replica reduction, so this is *correct* synchronous BN,
    unlike the reference whose SyncBN uses a single-rank process group and
    never actually syncs (models/model.py:86-100).

    ``groups=N`` (``--sync_bn 0``): per-replica statistics — the batch is
    split into N groups along dim 0 (group g lives on data-shard g, so the
    reduction stays local, no collectives) and each group is normalized with
    its own mean/var. This reproduces the reference's *effective* per-GPU BN
    behavior for accuracy-parity debugging. Running stats average the group
    stats. Normalization math in f32 either way; output cast to ``dtype``
    so bf16 activations stay bf16 through the BN->ReLU->conv chain.
    """

    use_running_average: Optional[bool] = None
    dtype: Dtype = jnp.float32
    groups: int = 1

    @nn.compact
    def __call__(self, x, use_running_average: Optional[bool] = None):
        ura = nn.merge_param(
            "use_running_average", self.use_running_average, use_running_average
        )
        out_dtype = x.dtype if jnp.issubdtype(x.dtype, jnp.floating) else jnp.float32
        if self.groups == 1:
            y = nn.BatchNorm(
                use_running_average=ura,
                momentum=0.9,
                epsilon=1e-5,
                dtype=jnp.float32,  # stats & normalization in f32
                param_dtype=jnp.float32,
                scale_init=bn_glorot_scale_init,
                bias_init=nn.initializers.zeros,
                name="bn",
            )(tag_bnrelu(x.astype(jnp.float32)))
            return tag_bnrelu(tag_bnrelu(y).astype(out_dtype))
        y = _GroupedBN(groups=self.groups, name="bn")(x, ura)
        return tag_bnrelu(y.astype(out_dtype))


class _GroupedBN(nn.Module):
    """Per-replica-statistics BN body; same param/stat names ('scale',
    'bias' / 'mean', 'var') and paths as ``nn.BatchNorm(name='bn')`` so
    checkpoints are interchangeable between the two modes."""

    groups: int

    @nn.compact
    def __call__(self, x, use_running_average: bool):
        c = x.shape[-1]
        scale = self.param("scale", bn_glorot_scale_init, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros((c,), jnp.float32))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones((c,), jnp.float32))
        xf = tag_bnrelu(x.astype(jnp.float32))
        if use_running_average:
            return ((xf - ra_mean.value)
                    * jax.lax.rsqrt(ra_var.value + 1e-5) * scale + bias)
        g = self.groups
        b = xf.shape[0]
        assert b % g == 0, f"batch {b} not divisible by {g} BN groups"
        # Two-stage ("partial moments") per-group statistics: stage 1 reduces
        # each SAMPLE's spatial moments straight off the conv output (no
        # reshape between the conv and the reduce, so XLA keeps its conv +
        # stat-epilogue fusion); stage 2 combines the tiny (B, C) partials
        # into (G, C) group stats. Normalization broadcasts per-sample
        # (B, 1..1, C) stats — pure elementwise, fuses into the consumer.
        # Alternatives measured and REJECTED on v5e b=64 (PERF.md round 3):
        # (a) reshape-form (G, B/G, ...) stats — the reduce consumes a
        # reshape, defeating the epilogue fusion (~208 clips/s); (b) per-half
        # slice + normalize + concat — extra 784M bf16 temps per site, OOM;
        # (c) slice-fed stats + broadcast normalize — 19.2G at compile.
        spatial_axes = tuple(range(1, xf.ndim - 1))
        pmean = jnp.mean(xf, axis=spatial_axes)              # (B, C)
        psq = jnp.mean(jnp.square(xf), axis=spatial_axes)    # (B, C)
        gmean = pmean.reshape(g, b // g, c).mean(axis=1)     # (G, C)
        gvar = psq.reshape(g, b // g, c).mean(axis=1) - jnp.square(gmean)
        mean_b = jnp.repeat(gmean, b // g, axis=0)           # (B, C)
        var_b = jnp.repeat(gvar, b // g, axis=0)
        bshape = (b,) + (1,) * (xf.ndim - 2) + (c,)
        y = tag_bnrelu((xf - mean_b.reshape(bshape)) * jax.lax.rsqrt(
            var_b.reshape(bshape) + 1e-5))
        y = tag_bnrelu(y * scale + bias)
        if not self.is_initializing():
            ra_mean.value = 0.9 * ra_mean.value + 0.1 * jnp.mean(gmean, 0)
            ra_var.value = 0.9 * ra_var.value + 0.1 * jnp.mean(gvar, 0)
        return y


class Conv3d(nn.Module):
    """3D conv on NDHWC with explicit torch-style symmetric padding.

    Uses the native XLA 3D convolution. Two decompositions were measured on
    v5e and REJECTED (PERF.md "negative results"): (a) T-folded 2D spatial
    convs — 6.4x faster in isolation but 2x SLOWER in-graph (XLA already
    picks good layouts inside the fused train program; the fold breaks its
    conv+BN-stat fusions); (b) kt-shifted-matmul temporal convs — faster in
    isolation but the backward retains kt shifted activation copies and
    exhausts HBM at the bench batch.
    """

    features: int
    kernel: Tuple[int, int, int]
    stride: Tuple[int, int, int] = (1, 1, 1)
    # per-dim padding: int = symmetric, (lo, hi) pair = explicit asymmetric
    # (the TF-SAME backbones — i3d — pad bottom-heavy)
    padding: Tuple = (0, 0, 0)
    use_bias: bool = False
    dtype: Dtype = jnp.bfloat16
    # declare-and-return the kernel param WITHOUT building the convolution —
    # used by the Pallas-fused (2+1)D path to keep parameter paths identical
    # to the unfused modules (checkpoint interchange)
    param_only: bool = False
    # '' | 'int8': dynamically-quantized int8 forward contraction with
    # straight-through bf16 backward (--quant; ops/quant.py — 3.8x MXU rate
    # + half-size saved residuals on v5e)
    quant: str = ""

    @nn.compact
    def __call__(self, x):
        kt, kh, kw = self.kernel
        st, sh, sw = self.stride
        pt, ph, pw = self.padding
        in_ch = x.shape[-1]
        kernel = self.param(
            "kernel", glorot_conv_init(),
            (kt, kh, kw, in_ch, self.features), jnp.float32,
        )
        if self.param_only:
            return kernel
        bias = (self.param("bias", nn.initializers.zeros,
                           (self.features,), jnp.float32)
                if self.use_bias else None)
        xd = x.astype(self.dtype)
        kd = kernel.astype(self.dtype)

        if self.quant == "int8_calib":
            # calibration pass: observe this site's activation range into a
            # batch_stats variable (rides checkpoints and the eval-step
            # plumbing), compute the FLOAT conv — calibration statistics
            # must not depend on quantization noise. Run under
            # mutable=["batch_stats"] (serve/quantize.py).
            from cstp_tpu.ops.quant import activation_absmax_scale

            sv = self.variable("batch_stats", "act_scale",
                               lambda: jnp.zeros((), jnp.float32))
            if not self.is_initializing():
                sv.value = jnp.maximum(sv.value,
                                       activation_absmax_scale(xd))
        elif self.quant.startswith("int8"):
            from cstp_tpu.ops.quant import int8_conv

            if self.quant == "int8_fixed":
                sa = 0.05
            elif self.quant == "int8_static":
                # calibrated per-site scale (written by an int8_calib pass).
                # A never-calibrated site (act_scale == 0) would quantize
                # with the 1e-8 floor — clipping every activation to +/-127
                # and dequantizing to ~0 — so the eval/test/retrieval/serve
                # restore paths refuse uncalibrated checkpoints up front
                # (ops/quant.py check_int8_calibrated; ADVICE r3).
                sv = self.variable("batch_stats", "act_scale",
                                   lambda: jnp.zeros((), jnp.float32))
                sa = jnp.maximum(sv.value, 1e-8)
            else:
                sa = None
            if x.ndim == 4:
                assert (kt, st, pt) == (1, 1, 0), (self.kernel, self.stride,
                                                   self.padding)
                out = int8_conv(xd, kernel[0], (sh, sw), (ph, pw), self.dtype,
                                act_scale=sa)
            else:
                out = int8_conv(xd, kernel, self.stride, self.padding,
                                self.dtype, act_scale=sa)
            if bias is not None:
                out = out + bias.astype(self.dtype)
            return out

        pairs = [(p, p) if isinstance(p, int) else tuple(p)
                 for p in self.padding]
        if x.ndim == 4:
            # T-folded input (B*T, H, W, C) — the --t_fold path: a purely
            # spatial (1,kh,kw) tap applied frame-wise is exactly a 2D conv
            # on the folded batch. Param shape/path stays the 5-D Conv3d
            # kernel, so checkpoints interchange with the unfolded model.
            assert (kt, st, pt) == (1, 1, 0), (self.kernel, self.stride,
                                               self.padding)
            out = jax.lax.conv_general_dilated(
                xd, kd[0], (sh, sw), pairs[1:],
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=self.dtype,
            )
            if bias is not None:
                out = out + bias.astype(self.dtype)
            return out

        del kt, kh, kw, st, sh, sw, pt, ph, pw
        out = jax.lax.conv_general_dilated(
            xd, kd, self.stride, pairs,
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
            preferred_element_type=self.dtype,
        )
        if bias is not None:
            out = out + bias.astype(self.dtype)
        return out


def r21d_intermediate_channels(
    in_channels: int, out_channels: int, kernel: Tuple[int, int, int],
    round_to: int = 1,
) -> int:
    """Mid-channel count of the factorized (2+1)D conv — paper §3.5 formula
    as coded at reference r21d_byol.py:74-76.

    ``round_to`` > 1 (--mid_round): round the formula's result to the nearest
    multiple of ``round_to`` (minimum one multiple). TPU arrays are tiled with
    a 128-lane minor dimension, so a C=144 mid tensor physically occupies (and
    moves) 256 lanes of HBM; since the train step is memory-bound (PERF.md),
    lane-aligning the mid widths (83/144/230/288 -> 128/128/256/256 at
    round_to=128) removes pure padding traffic. This changes parameter shapes
    — an explicit TPU model variant, not the reference architecture."""
    kt, kh, kw = kernel
    num = kt * kh * kw * in_channels * out_channels
    den = kh * kw * in_channels + kt * out_channels
    mid = int(math.floor(num / den))
    if round_to > 1:
        mid = max(round_to, round_to * int(round(mid / round_to)))
    return mid


class SpatialS2DConv(nn.Module):
    """EXACT space-to-depth rewrite of a spatial (1,k,k) stride-(1,2,2)
    conv (the classic TPU stem trick, cf. reference s3d_g.py:280-287 "3D
    space to depth trick for TPU optimization" — here derived to be
    bit-equivalent rather than an architecture change).

    Requires stride 2 and even padded extent. The padded input's HxW 2x2
    blocks move into channels (C -> 4C) and the kernel's taps are
    rearranged by parity into a (ceil((k+1)/2)... k2/2)^2 stride-1 kernel
    over the half-resolution grid — same arithmetic, reassociated, but the
    MXU sees 4x the contraction depth and no strided access. The parameter
    ('kernel', shape (1,k,k,C,O)) is IDENTICAL to the plain Conv3d's, so
    checkpoints are interchangeable with the non-s2d stem.
    """

    features: int
    kernel_hw: int = 7
    pad: int = 3
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        k = self.kernel_hw
        in_ch = x.shape[-1]
        kernel = self.param(
            "kernel", glorot_conv_init(),
            (1, k, k, in_ch, self.features), jnp.float32,
        )
        kd = kernel.astype(self.dtype)
        k2 = (k + 2) // 2 * 2  # taps zero-padded to the even cover (7 -> 8)
        kp = jnp.pad(kd, ((0, 0), (0, k2 - k), (0, k2 - k), (0, 0), (0, 0)))
        kp = kp.reshape(1, k2 // 2, 2, k2 // 2, 2, in_ch, self.features)
        kr = kp.transpose(0, 1, 3, 2, 4, 5, 6).reshape(
            1, k2 // 2, k2 // 2, 4 * in_ch, self.features)
        b, t, h, w, c = x.shape
        p = self.pad
        assert (h + 2 * p) % 2 == 0 and (w + 2 * p) % 2 == 0, (h, w, p)
        xd = x.astype(self.dtype)
        xp = jnp.pad(xd, ((0, 0), (0, 0), (p, p), (p, p), (0, 0)))
        hp, wp = h + 2 * p, w + 2 * p
        xs = xp.reshape(b, t, hp // 2, 2, wp // 2, 2, c)
        xs = xs.transpose(0, 1, 2, 4, 3, 5, 6).reshape(
            b, t, hp // 2, wp // 2, 4 * c)
        return jax.lax.conv_general_dilated(
            xs, kr, (1, 1, 1), [(0, 0), (0, 0), (0, 0)],
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
            preferred_element_type=self.dtype,
        )


class _BNParamsInner(nn.Module):
    """Declares the same parameter/variable names as ``nn.BatchNorm`` /
    ``_GroupedBN`` (scale/bias + batch_stats mean/var) without computing —
    the Pallas-fused path owns the normalization math."""

    c: int

    @nn.compact
    def __call__(self):
        scale = self.param("scale", bn_glorot_scale_init, (self.c,),
                           jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (self.c,),
                          jnp.float32)
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros((self.c,), jnp.float32))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones((self.c,), jnp.float32))
        return scale, bias, ra_mean, ra_var


class _BNParams(nn.Module):
    """Path shim: BatchNorm nests its body under 'bn', so fused params live
    at <parent>/bn/bn/{scale,bias} exactly like the unfused modules."""

    c: int

    @nn.compact
    def __call__(self):
        return _BNParamsInner(self.c, name="bn")()


class SpatioTemporalConv(nn.Module):
    """Factorized (2+1)D conv: spatial (1,k,k) conv -> BN -> ReLU ->
    temporal (k,1,1) conv (reference r21d_byol.py:38-97).

    The BN+ReLU lives INSIDE the factorized conv; callers add their own
    post-BN/ReLU exactly like the reference modules do.

    ``s2d``: compute the spatial conv via the exact space-to-depth rewrite
    (stride-2 stems only; see SpatialS2DConv).

    ``fused``: run the whole train-mode chain as the Pallas fused kernel
    (ops/pallas/conv21d.py) so the wide mid tensor never reaches HBM.
    Applies to stride-1 3x3x3 blocks (the hot layer1 shapes); other shapes
    and eval mode fall through to the unfused path. Parameter paths are
    identical, so checkpoints interchange freely.
    """

    features: int
    kernel: Tuple[int, int, int]
    stride: Tuple[int, int, int] = (1, 1, 1)
    padding: Tuple[int, int, int] = (0, 0, 0)
    dtype: Dtype = jnp.bfloat16
    bn_groups: int = 1
    s2d: bool = False
    fused: bool = False
    mid_round: int = 1
    # --t_fold: run the spatial conv T-folded — (B,T,H,W,C) collapses to
    # (B*T,H,W,C) and the (1,kh,kw) conv becomes a plain 2D conv, with the
    # mid BN + ReLU computed ON THE FOLDED TENSOR (numerically identical for
    # both BN modes: flax BN reduces (B*T,H,W) == (B,T,H,W); _GroupedBN's
    # per-sample partial moments see (B/g)*T contiguous rows per group).
    # The fold is unwound only at the temporal conv. Round 2's T-fold
    # experiment lost 2x because it unfolded BEFORE BN, so the stat reduce
    # consumed a reshape and XLA dropped the conv+stat epilogue fusion
    # (PERF.md "negative results"); keeping BN folded is the fix VERDICT r2
    # #1 calls for.
    t_fold: bool = False
    # '' | 'int8': quantized forward convs (--quant; see Conv3d.quant)
    quant: str = ""

    @nn.compact
    def __call__(self, x, train: bool = True):
        kt, kh, kw = self.kernel
        st, sh, sw = self.stride
        pt, ph, pw = self.padding
        in_ch = x.shape[-1]
        mid = r21d_intermediate_channels(in_ch, self.features, self.kernel,
                                         self.mid_round)
        # The fused kernel lowers via Mosaic, which exists only on TPU;
        # on CPU/GPU backends (conftest meshes, dryrun) fall through to
        # the numerically-equivalent unfused XLA chain — including during
        # model.init, which traces the train-mode body. Denylist rather
        # than `== "tpu"`: the tunneled dev TPU reports a non-canonical
        # platform name (see serve/export.py check_platform note).
        fused_ok = (self.fused and jax.default_backend()
                    not in ("cpu", "gpu", "cuda", "rocm", "metal"))
        if (self.quant in ("int8_store", "int8_store_fz",
                           "int8_store_calib") and x.ndim == 5):
            # --quant int8_store: s8 as the STORAGE dtype of the whole
            # spatial-conv -> BN -> ReLU -> temporal-conv chain, BN folded
            # into the dequant epilogue so the bf16 mid activation never
            # reaches HBM, and s8 saved residuals for backward
            # (ops/quant.py int8_store_chain — the VERDICT r3 #1 lever; the
            # reference chain being re-stored: r21d_byol.py:94-97).
            # 'int8_store_calib' is the one-batch float bootstrap pass that
            # seeds the delayed activation scales (make_pretrain_step runs
            # it automatically before step 0); eval mode also runs float.
            assert not (self.s2d or self.t_fold or self.fused), \
                "--quant int8_store is exclusive with s2d/t_fold/fused_conv"
            from cstp_tpu.ops.quant import float_store_chain, int8_store_chain

            ws = Conv3d(mid, (1, kh, kw), (1, 1, 1), (0, ph, pw),
                        dtype=self.dtype, name="spatial_conv",
                        param_only=True)(x)
            scale, bias, ra_mean, ra_var = _BNParams(mid, name="bn")()
            wt = Conv3d(self.features, (kt, 1, 1), (1, 1, 1), (pt, 0, 0),
                        dtype=self.dtype, name="temporal_conv",
                        param_only=True)(jnp.zeros((1, 1, 1, 1, mid),
                                                   x.dtype))
            zscalar = lambda: jnp.zeros((), jnp.float32)  # noqa: E731
            sv_in = self.variable("batch_stats", "act_scale_in", zscalar)
            sv_mid = self.variable("batch_stats", "act_scale_mid", zscalar)
            sv_act = self.variable("batch_stats", "act_scale_act", zscalar)
            stride_s, pad_s = (1, sh, sw), (0, ph, pw)
            stride_t, pad_t = (st, 1, 1), (pt, 0, 0)
            if self.quant == "int8_store_calib" or not train:
                out, gmean, gvar, (a_in, a_mid, a_act) = float_store_chain(
                    x, ws, wt, scale, bias, self.bn_groups,
                    stride_s, pad_s, stride_t, pad_t, train,
                    ra_mean.value, ra_var.value, self.dtype)
                if train and not self.is_initializing():
                    # bootstrap: seed the delayed scales with this batch's
                    # exact absmax; update running stats like a train step
                    sv_in.value = jnp.maximum(sv_in.value, a_in)
                    sv_mid.value = jnp.maximum(sv_mid.value, a_mid)
                    sv_act.value = jnp.maximum(sv_act.value, a_act)
                    ra_mean.value = (0.9 * ra_mean.value
                                     + 0.1 * jnp.mean(gmean, axis=0))
                    ra_var.value = (0.9 * ra_var.value
                                    + 0.1 * jnp.mean(gvar, axis=0))
                return out.astype(self.dtype)
            # DELAYED scales: quantize with the previous step's running
            # absmax (batch_stats), never a same-step reduce — the quantize
            # stays a pure elementwise epilogue. The 1e-6 floor only guards
            # division; training must seed scales via the calib pass first
            # (make_pretrain_step does).
            # 'int8_store_fz': frozen scales — no in-chain absmax
            # observations. The observation reduces force the quantize/
            # normalize chains to materialize as standalone kernels (their
            # reduce results must be kernel outputs), costing +208 ms of
            # loop fusions on the b=64 step (PERF.md round 7); frozen mode
            # keeps the bootstrap-seeded scales for the whole run.
            observe = self.quant == "int8_store"
            out, gmean, gvar, a_in, a_mid, a_act = int8_store_chain(
                x, ws, wt, scale, bias,
                jnp.maximum(sv_in.value, 1e-6),
                jnp.maximum(sv_mid.value, 1e-6),
                jnp.maximum(sv_act.value, 1e-6),
                stride_s, pad_s, stride_t, pad_t, self.bn_groups, observe)
            if not self.is_initializing():
                if observe:
                    # running max with slow decay: tracks absmax growth
                    # fast, shrinks slowly; exact (pre-quantization)
                    # observations so clipping cannot feed back
                    decay = jnp.float32(0.999)
                    sv_in.value = jnp.maximum(decay * sv_in.value, a_in)
                    sv_mid.value = jnp.maximum(decay * sv_mid.value, a_mid)
                    sv_act.value = jnp.maximum(decay * sv_act.value, a_act)
                ra_mean.value = (0.9 * ra_mean.value
                                 + 0.1 * jnp.mean(gmean, axis=0))
                ra_var.value = (0.9 * ra_var.value
                                + 0.1 * jnp.mean(gvar, axis=0))
            return out
        if (fused_ok and train and self.stride == (1, 1, 1)
                and (kt, pt) == (3, 1) and (ph, pw) == (kh // 2, kw // 2)):
            from cstp_tpu.ops.pallas.conv21d import fused_st_conv

            ws = Conv3d(mid, (1, kh, kw), (1, 1, 1), (0, ph, pw),
                        dtype=self.dtype, name="spatial_conv",
                        param_only=True)(x)
            scale, bias, ra_mean, ra_var = _BNParams(mid, name="bn")()
            wt = Conv3d(self.features, (kt, 1, 1), (1, 1, 1), (pt, 0, 0),
                        dtype=self.dtype, name="temporal_conv",
                        param_only=True)(jnp.zeros((1, 1, 1, 1, mid),
                                                   x.dtype))
            out, gmean, gvar = fused_st_conv(
                x, ws[0], wt[:, 0, 0], scale, bias, self.bn_groups)
            if not self.is_initializing():
                ra_mean.value = (0.9 * ra_mean.value
                                 + 0.1 * jnp.mean(gmean, axis=0))
                ra_var.value = (0.9 * ra_var.value
                                + 0.1 * jnp.mean(gvar, axis=0))
            return out
        if self.s2d and (sh, sw) == (2, 2) and kh == kw:
            x = SpatialS2DConv(mid, kernel_hw=kh, pad=ph,
                               dtype=self.dtype, name="spatial_conv")(x)
            x = BatchNorm(dtype=self.dtype, groups=self.bn_groups,
                          name="bn")(x, not train)
            x = tag_bnrelu(nn.relu(x).astype(self.dtype))
        elif self.t_fold:
            b0, t0 = x.shape[0], x.shape[1]
            x = x.reshape(b0 * t0, *x.shape[2:])
            x = Conv3d(mid, (1, kh, kw), (1, sh, sw), (0, ph, pw),
                       dtype=self.dtype, quant=self.quant,
                       name="spatial_conv")(x)
            x = BatchNorm(dtype=self.dtype, groups=self.bn_groups,
                          name="bn")(x, not train)
            x = tag_bnrelu(nn.relu(x).astype(self.dtype))
            x = x.reshape(b0, t0, *x.shape[1:])
        else:
            x = Conv3d(mid, (1, kh, kw), (1, sh, sw), (0, ph, pw),
                       dtype=self.dtype, quant=self.quant,
                       name="spatial_conv")(x)
            x = BatchNorm(dtype=self.dtype, groups=self.bn_groups,
                          name="bn")(x, not train)
            x = tag_bnrelu(nn.relu(x).astype(self.dtype))
        x = Conv3d(self.features, (kt, 1, 1), (st, 1, 1), (pt, 0, 0),
                   dtype=self.dtype, quant=self.quant,
                   name="temporal_conv")(x)
        return x


class MLPHead(nn.Module):
    """Linear -> BN1d -> ReLU -> Linear.

    Covers the reference Projector/Predictor (4096 hidden, r21d_byol.py:232-257)
    and the four pretext heads (1024/512 hidden, r21d_byol.py:276-291).
    """

    hidden: int
    out: int
    dtype: Dtype = jnp.bfloat16
    bn_groups: int = 1

    @nn.compact
    def __call__(self, x, train: bool = True):
        in_dim = x.shape[-1]
        x = nn.Dense(
            self.hidden,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            kernel_init=nn.initializers.glorot_uniform(),
            bias_init=torch_linear_bias_init(in_dim),
            name="fc1",
        )(x)
        x = BatchNorm(dtype=self.dtype, groups=self.bn_groups, name="bn")(x, not train)
        x = nn.relu(x).astype(self.dtype)
        x = nn.Dense(
            self.out,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            kernel_init=nn.initializers.glorot_uniform(),
            bias_init=torch_linear_bias_init(self.hidden),
            name="fc2",
        )(x)
        return x


def l2_normalize(x, axis=-1, eps=1e-12):
    """torch F.normalize(p=2) semantics (clamps the norm, not norm+eps)."""
    n = jnp.linalg.norm(x, axis=axis, keepdims=True)
    return x / jnp.maximum(n, eps)


class PretextHead(nn.Module):
    """Pretext classification head: 'mlp' = Linear-BN-ReLU-Linear (r21d/s3d
    families, r21d_byol.py:276-291) or 'linear' = single Linear (c3d/r3d/i3d
    families, c3d_byol.py:150-153)."""

    style: str
    hidden: int
    out: int
    dtype: Dtype = jnp.bfloat16
    bn_groups: int = 1

    @nn.compact
    def __call__(self, x, train: bool = True):
        if self.style == "mlp":
            return MLPHead(self.hidden, self.out, dtype=self.dtype, bn_groups=self.bn_groups,
                           name="mlp")(x, train)
        in_dim = x.shape[-1]
        return nn.Dense(
            self.out,
            dtype=jnp.float32,
            param_dtype=jnp.float32,
            kernel_init=nn.initializers.glorot_uniform(),
            bias_init=torch_linear_bias_init(in_dim),
            name="fc",
        )(x.astype(jnp.float32))


def max_pool_3d(x, kernel: Tuple[int, int, int], stride: Tuple[int, int, int],
                padding: Tuple[int, int, int] = (0, 0, 0)):
    """torch nn.MaxPool3d on NDHWC (symmetric padding, -inf identity).

    For the post-ReLU activations all reference models pool, -inf padding is
    equivalent to the zero-padding I3D's TF-SAME pooling uses.
    """
    dims = (1, *kernel, 1)
    strides = (1, *stride, 1)
    pads = ((0, 0), *[(p, p) for p in padding], (0, 0))
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, dims, strides, pads
    )


def max_pool_3d_same(x, kernel: Tuple[int, int, int],
                     stride: Tuple[int, int, int]):
    """TF-SAME max pool (I3D MaxPool3dTFPadding, i3d_byol.py:170-184):
    asymmetric pad so out = ceil(in / stride)."""
    pads = [(0, 0)]
    for k, s in zip(kernel, stride):
        pad_along = max(k - s, 0)
        lo = pad_along // 2
        pads.append((lo, pad_along - lo))
    pads.append((0, 0))
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, *kernel, 1), (1, *stride, 1), pads
    )


class SelfGating(nn.Module):
    """S3D-G feature gating: sigmoid(fc(mean over THW)) * x
    (s3dg.py:100-111)."""

    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        avg = jnp.mean(x.astype(jnp.float32), axis=(1, 2, 3))  # (B, C)
        w = nn.Dense(
            c,
            dtype=jnp.float32,
            param_dtype=jnp.float32,
            kernel_init=nn.initializers.glorot_uniform(),
            bias_init=torch_linear_bias_init(c),
            name="fc",
        )(avg)
        w = jax.nn.sigmoid(w)
        return (x.astype(jnp.float32) * w[:, None, None, None, :]).astype(
            x.dtype
        )
