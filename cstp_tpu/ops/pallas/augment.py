"""Fused CSTP augmentation as ONE Pallas TPU kernel per clip.

The XLA pipeline (augment/pipeline.py) lowers to dozens of small kernels
that materialize every intermediate (cropped clip, rotated clip, jittered
clip, …) in HBM — measured at ~52 ms/step of a ~230 ms pretrain step at
b=32 on v5e. This kernel performs the whole chain

    uint8 frames ─ crop+resize (MXU band matmuls) ─ rot90 ─ 3-shear small
    rotation (MXU) ─ color jitter (brightness/contrast/saturation/hue) ─
    gray mix ─ gaussian blur (MXU band matmuls) ─ hflip ─ normalize ─ bf16

entirely in VMEM: HBM traffic is one uint8 read + one bf16 write per clip
(~3 MB/clip-view vs ~80 MB of intermediates), one dispatch per batch.

Layout: channels-first (T, C, H, W) inside the kernel so the W axis fills
vector lanes (a trailing C=3 axis would waste 125/128 lanes in VMEM).
Randomness: all stochastic decisions are sampled OUTSIDE
(augment/params.py + pretext/boxes.py) and arrive as identity-when-off
parameter arrays — the kernel is deterministic given its inputs and
equivalence-tested against the XLA path (tests/test_pallas_augment.py).

Reference semantics covered: ClipRandomSizedCropOverlap crop + PIL resize
(preprocess_data.py:479-565), rot90 pretext label (datasets.py:878-881),
RandomRotation(10) (1113), ClipColorJitter (584-672), ClipRandomGray
(690-710), ClipGaussianBlur (675-687), flip (568-581), tf/imagenet
normalize (337-371).
"""

from __future__ import annotations

import functools
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LUMA_R, _LUMA_G, _LUMA_B = 0.299, 0.587, 0.114
_IMAGENET_MEAN = (0.485, 0.456, 0.406)
_IMAGENET_STD = (0.229, 0.224, 0.225)


def _resample_weights(in_size: int, out_size: int, start, size,
                      method: str = "bicubic") -> jnp.ndarray:
    """(out, in) crop+resize matrix — same math as augment/ops.py
    resample_weights, built from broadcasted_iota (TPU needs 2D iota)."""
    scale = size / out_size
    fscale = jnp.maximum(scale, 1.0)
    out_i = jax.lax.broadcasted_iota(jnp.int32, (out_size, in_size), 0).astype(jnp.float32)
    in_i = jax.lax.broadcasted_iota(jnp.int32, (out_size, in_size), 1).astype(jnp.float32)
    centers = start + (out_i + 0.5) * scale
    taps = in_i + 0.5
    d = (taps - centers) / fscale
    if method == "bicubic":
        a = -0.5
        ad = jnp.abs(d)
        ad2, ad3 = ad * ad, ad * ad * ad
        inner = (a + 2.0) * ad3 - (a + 3.0) * ad2 + 1.0
        outer = a * ad3 - 5.0 * a * ad2 + 8.0 * a * ad - 4.0 * a
        w = jnp.where(ad <= 1.0, inner, jnp.where(ad < 2.0, outer, 0.0))
    else:
        w = jnp.maximum(0.0, 1.0 - jnp.abs(d))
    inside = (taps >= jnp.floor(start)) & (taps <= jnp.ceil(start + size))
    w = jnp.where(inside, w, 0.0)
    denom = jnp.sum(w, axis=1, keepdims=True)
    return jnp.where(denom > 1e-6, w / jnp.maximum(denom, 1e-6), 0.0)


def _shear_weights(s: int, shift_per_row) -> jnp.ndarray:
    """(S_rows, S_out, S_in) linear-interp shear bands (ops._shear_weights)."""
    out_i = jax.lax.broadcasted_iota(jnp.int32, (s, s, s), 1).astype(jnp.float32)
    in_i = jax.lax.broadcasted_iota(jnp.int32, (s, s, s), 2).astype(jnp.float32)
    src = out_i + shift_per_row[:, None, None]
    w = jnp.maximum(0.0, 1.0 - jnp.abs(in_i - src))
    inside = (src >= 0.0) & (src <= s - 1)
    return jnp.where(inside, w, 0.0)


def _rot90(v, k):
    """jnp.rot90(v, k, axes=(2, 3)) for (T, C, S, S), traced k."""
    return jax.lax.switch(
        k,
        [
            lambda x: x,
            lambda x: jnp.rot90(x, 1, axes=(2, 3)),
            lambda x: jnp.rot90(x, 2, axes=(2, 3)),
            lambda x: jnp.rot90(x, 3, axes=(2, 3)),
        ],
        v,
    )


def _augment_kernel(box_ref, rotk_ref, angle_ref, factors_ref, sigma_ref,
                    flip_ref, graymix_ref, frames_ref, out_ref, *,
                    sample_size: int, norm_method: str, out_dtype):
    s = sample_size
    i = pl.program_id(0)
    frames = frames_ref[0]                       # (T, C, H0, W0) uint8
    t, c, h0, w0 = frames.shape
    x0, y0, bw, bh = (box_ref[i, 0], box_ref[i, 1], box_ref[i, 2],
                      box_ref[i, 3])

    # ---- crop + bicubic resize: two band matmuls on the MXU ----
    wy = _resample_weights(h0, s, y0, bh)        # (S, H0)
    wx = _resample_weights(w0, s, x0, bw)        # (S, W0)
    # Mosaic can't cast u8->f32 directly; hop through int32
    f = frames.astype(jnp.int32).astype(jnp.float32)
    v = jax.lax.dot_general(                     # (S,H0) x (T,C,H0,W0)
        wy, f, (((1,), (2,)), ((), ())),
        preferred_element_type=jnp.float32)      # (S, T, C, W0)
    v = jax.lax.dot_general(
        wx, v, (((1,), (3,)), ((), ())),
        preferred_element_type=jnp.float32)      # (S, S, T, C) [x, y, t, c]
    v = v.transpose(2, 3, 1, 0)                  # (T, C, S=y, S=x)

    # ---- rot90 pretext rotation ----
    v = _rot90(v, rotk_ref[i])

    # ---- small-angle rotation: 3-shear (identity at angle 0) ----
    theta = angle_ref[i] * jnp.pi / 180.0
    rows = jax.lax.broadcasted_iota(jnp.int32, (s, 1), 0).astype(jnp.float32)[:, 0] - (s - 1) / 2.0
    a = -jnp.tan(theta / 2.0)
    b = jnp.sin(theta)

    def shear_x(arr, shift):
        w = _shear_weights(s, shift)             # (S=y, S=x_out, S=x_in)
        # out[t,c,y,x] = sum_w W[y,x,w] arr[t,c,y,w]
        return jnp.einsum("yxw,tcyw->tcyx", w, arr,
                          preferred_element_type=jnp.float32)

    def shear_y(arr, shift):
        w = _shear_weights(s, shift)             # (S=x, S=y_out, S=y_in)
        return jnp.einsum("xyh,tchx->tcyx", w, arr,
                          preferred_element_type=jnp.float32)

    v = shear_x(v, a * rows)
    v = shear_y(v, b * rows)
    v = shear_x(v, a * rows)

    # ---- color jitter: brightness -> contrast -> saturation -> hue ----
    fb, fc, fs, hue = (factors_ref[i, 0], factors_ref[i, 1],
                       factors_ref[i, 2], factors_ref[i, 3])
    jit_on = (fb != 1.0) | (fc != 1.0) | (fs != 1.0) | (hue != 0.0)
    v = v * fb
    luma = (_LUMA_R * v[:, 0] + _LUMA_G * v[:, 1] + _LUMA_B * v[:, 2])  # (T,S,S)
    mean_l = jnp.mean(luma, axis=(1, 2), keepdims=True)                 # (T,1,1)
    v = v * fc + (1.0 - fc) * mean_l[:, None]
    luma = (_LUMA_R * v[:, 0] + _LUMA_G * v[:, 1] + _LUMA_B * v[:, 2])
    v = v * fs + (1.0 - fs) * luma[:, None]

    # hue via HSV roundtrip; selected only when hue != 0 so null clips are
    # bit-exact passthrough
    r, g, bl = v[:, 0] / 255.0, v[:, 1] / 255.0, v[:, 2] / 255.0
    mx = jnp.maximum(jnp.maximum(r, g), bl)
    mn = jnp.minimum(jnp.minimum(r, g), bl)
    diff = mx - mn
    safe = jnp.where(diff == 0, 1.0, diff)
    hh = jnp.where(
        mx == r, (g - bl) / safe,
        jnp.where(mx == g, 2.0 + (bl - r) / safe, 4.0 + (r - g) / safe))
    hh = jnp.where(diff == 0, 0.0, hh / 6.0) % 1.0
    sat = jnp.where(mx == 0, 0.0, diff / jnp.maximum(mx, 1e-12))
    hh = (hh + hue) % 1.0
    hsec = jnp.floor(hh * 6.0)
    ffrac = hh * 6.0 - hsec
    p = mx * (1.0 - sat)
    q = mx * (1.0 - ffrac * sat)
    tt = mx * (1.0 - (1.0 - ffrac) * sat)
    hsec = hsec.astype(jnp.int32) % 6
    sel = lambda vals: jnp.select([hsec == j for j in range(6)], vals)
    nr = sel([mx, q, p, p, tt, mx]) * 255.0
    ng = sel([tt, mx, mx, q, p, p]) * 255.0
    nb = sel([p, p, tt, mx, mx, q]) * 255.0
    vh = jnp.stack([nr, ng, nb], axis=1)
    v = jnp.where(hue != 0.0, vh, v)
    v = jnp.where(jit_on, jnp.clip(v, 0.0, 255.0), v)

    # ---- gray: per-frame 3x3 channel mix (identity when off) ----
    m = graymix_ref[0]                           # (T, 9) f32 row-major 3x3
    outs = []
    for cc in range(3):
        acc = m[:, cc * 3 + 0, None, None] * v[:, 0]
        acc = acc + m[:, cc * 3 + 1, None, None] * v[:, 1]
        acc = acc + m[:, cc * 3 + 2, None, None] * v[:, 2]
        outs.append(acc)
    v = jnp.stack(outs, axis=1)

    # ---- gaussian blur: band matmuls; identity when sigma == 0 ----
    sigma = sigma_ref[i]
    radius = 7
    oi = jax.lax.broadcasted_iota(jnp.int32, (s, s), 0).astype(jnp.float32)
    ii = jax.lax.broadcasted_iota(jnp.int32, (s, s), 1).astype(jnp.float32)
    off = ii - oi
    gk = jnp.exp(-(off * off) / (2.0 * jnp.maximum(sigma, 1e-3) ** 2))
    gk = jnp.where(jnp.abs(off) <= radius, gk, 0.0)
    gk = gk / jnp.sum(gk, axis=1, keepdims=True)
    band = jnp.where(sigma > 0.0, gk, (off == 0.0).astype(jnp.float32))
    v = jnp.einsum("yh,tchw->tcyw", band, v,
                   preferred_element_type=jnp.float32)
    v = jnp.einsum("xw,tcyw->tcyx", band, v,
                   preferred_element_type=jnp.float32)

    # ---- hflip + normalize + cast ----
    v = jnp.where(flip_ref[i] > 0, v[:, :, :, ::-1], v)
    if norm_method == "tf":
        v = jnp.clip(v / 255.0 * 2.0 - 1.0, -1.0, 1.0)
    else:  # imagenet — scalar constants per channel (array constants can't
        # be captured by a pallas kernel)
        chans = [
            (v[:, j] / 255.0 - _IMAGENET_MEAN[j]) / _IMAGENET_STD[j]
            for j in range(3)
        ]
        v = jnp.stack(chans, axis=1)
    out_ref[0] = v.astype(out_dtype)


@functools.partial(
    jax.jit,
    static_argnames=("sample_size", "norm_method", "out_dtype", "interpret"))
def fused_augment_clips(
    frames: jnp.ndarray,    # (B, T, H0, W0, 3) uint8 (NDHWC at the API)
    box: jnp.ndarray,       # (B, 4) f32 crop boxes [x, y, w, h]
    rotk: jnp.ndarray,      # (B,) int32 rot90 labels
    angle: jnp.ndarray,     # (B,) f32 degrees (0 = none)
    factors: jnp.ndarray,   # (B, 4) f32 jitter (1,1,1,0 = none)
    graymix: jnp.ndarray,   # (B, T, 3, 3) f32 (identity = none)
    sigma: jnp.ndarray,     # (B,) f32 (0 = none)
    flip: jnp.ndarray,      # (B,) bool
    sample_size: int = 112,
    norm_method: str = "tf",
    out_dtype=jnp.bfloat16,
    interpret: bool = False,
) -> jnp.ndarray:
    """One fused kernel invocation for a batch of clips.

    Returns (B, T, S, S, 3) normalized views in ``out_dtype``.
    """
    b, t, h0, w0, c = frames.shape
    s = sample_size
    frames_cf = jnp.transpose(frames, (0, 1, 4, 2, 3))  # (B, T, C, H0, W0)

    kernel = functools.partial(
        _augment_kernel, sample_size=s, norm_method=norm_method,
        out_dtype=jnp.dtype(out_dtype))
    out_cf = pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),            # box
            pl.BlockSpec(memory_space=pltpu.SMEM),            # rotk
            pl.BlockSpec(memory_space=pltpu.SMEM),            # angle
            pl.BlockSpec(memory_space=pltpu.SMEM),            # factors
            pl.BlockSpec(memory_space=pltpu.SMEM),            # sigma
            pl.BlockSpec(memory_space=pltpu.SMEM),            # flip
            pl.BlockSpec((1, t, 9), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),            # graymix
            pl.BlockSpec((1, t, c, h0, w0), lambda i: (i, 0, 0, 0, 0),
                         memory_space=pltpu.VMEM),            # frames
        ],
        out_specs=pl.BlockSpec((1, t, c, s, s), lambda i: (i, 0, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, t, c, s, s), jnp.dtype(out_dtype)),
        interpret=interpret,
    )(box.astype(jnp.float32), rotk.astype(jnp.int32),
      angle.astype(jnp.float32), factors.astype(jnp.float32),
      sigma.astype(jnp.float32), flip.astype(jnp.int32),
      graymix.astype(jnp.float32).reshape(b, t, 9), frames_cf)
    return jnp.transpose(out_cf, (0, 1, 3, 4, 2))  # back to NDHWC
