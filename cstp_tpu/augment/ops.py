"""On-device clip augmentation primitives.

TPU-first reimplementation of the reference's host-side PIL transform zoo
(``data_process/preprocess_data.py``). Design rules:

* clips are float32 ``(T, H, W, C)`` in [0, 255] until the final normalize —
  channels-last (NDHWC) is the native TPU conv layout;
* geometric resampling (crop+resize, blur) is expressed as small per-clip
  weight *matrices* contracted on the MXU (two matmuls) instead of gathers;
* every random decision is a masked ``jnp.where`` on statically-shaped data —
  no data-dependent control flow, so the whole pipeline jits and fuses.

Numerics deviations from PIL (documented, accuracy-neutral):
  - resize uses the same Catmull-Rom bicubic kernel family as PIL BICUBIC
    with antialiasing on downscale, but weights are computed in float32 and
    edge taps renormalized rather than PIL's exact precomputed-int path;
  - small-angle rotation is bilinear (PIL ``Image.rotate`` defaults NEAREST);
  - Gaussian blur is an exact separable Gaussian (PIL approximates with
    three box blurs).
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
import numpy as np

# Module-level constants are NUMPY, not jnp: a jnp.asarray at import time
# initializes the default JAX backend as a side effect of merely importing
# this module (observed hanging CLI starts on a dead tunneled-TPU backend).
# Under jit these fold to identical on-device constants.
_LUMA = np.asarray([0.299, 0.587, 0.114], np.float32)  # PIL "L" weights


# ---------------------------------------------------------------------------
# crop + resize (reference: PIL crop().resize(BICUBIC); preprocess_data.py:514-515)
# ---------------------------------------------------------------------------

def _kernel_triangle(d):
    return jnp.maximum(0.0, 1.0 - jnp.abs(d))


def _kernel_cubic(d):
    """Catmull-Rom (a = -0.5), the PIL BICUBIC kernel."""
    a = -0.5
    ad = jnp.abs(d)
    ad2, ad3 = ad * ad, ad * ad * ad
    inner = (a + 2.0) * ad3 - (a + 3.0) * ad2 + 1.0
    outer = a * ad3 - 5.0 * a * ad2 + 8.0 * a * ad - 4.0 * a
    return jnp.where(ad <= 1.0, inner, jnp.where(ad < 2.0, outer, 0.0))


_KERNELS = {"bilinear": (_kernel_triangle, 1.0), "bicubic": (_kernel_cubic, 2.0)}


def resample_weights(
    in_size: int,
    out_size: int,
    start: jnp.ndarray,
    size: jnp.ndarray,
    method: str = "bicubic",
    antialias: bool = True,
) -> jnp.ndarray:
    """(out_size, in_size) row-stochastic resampling matrix for one axis.

    Maps the crop window [start, start+size) of an ``in_size`` axis onto
    ``out_size`` output pixels (PIL half-pixel-center convention). Taps
    outside the crop window are masked and rows renormalized, which both
    implements the crop and mimics PIL's edge handling; fully-out-of-bounds
    rows produce 0 (PIL pads out-of-image crops with black).
    """
    kernel_fn, support = _KERNELS[method]
    scale = size / out_size
    fscale = jnp.maximum(scale, 1.0) if antialias else jnp.asarray(1.0)
    centers = start + (jnp.arange(out_size, dtype=jnp.float32) + 0.5) * scale  # (out,)
    taps = jnp.arange(in_size, dtype=jnp.float32) + 0.5                        # (in,)
    d = (taps[None, :] - centers[:, None]) / fscale
    w = kernel_fn(d)
    # mask taps outside the crop window (the reference crops THEN resizes)
    inside = (taps[None, :] >= jnp.floor(start)) & (
        taps[None, :] <= jnp.ceil(start + size)
    )
    w = jnp.where(inside, w, 0.0)
    denom = jnp.sum(w, axis=1, keepdims=True)
    return jnp.where(denom > 1e-6, w / jnp.maximum(denom, 1e-6), 0.0)


def crop_resize_clip(
    frames: jnp.ndarray,  # (T, H, W, C) float32
    box: jnp.ndarray,     # (4,) x, y, w, h in input pixels
    out_size: int,
    method: str = "bicubic",
) -> jnp.ndarray:
    """Crop ``box`` from every frame and resize to (out_size, out_size)."""
    _, h_in, w_in, _ = frames.shape
    wy = resample_weights(h_in, out_size, box[1], box[3], method)  # (S, H)
    wx = resample_weights(w_in, out_size, box[0], box[2], method)  # (S, W)
    # two MXU contractions; f32 accumulate
    out = jnp.einsum("yh,thwc->tywc", wy, frames,
                     preferred_element_type=jnp.float32)
    out = jnp.einsum("xw,tywc->tyxc", wx, out,
                     preferred_element_type=jnp.float32)
    return out


# ---------------------------------------------------------------------------
# rotations
# ---------------------------------------------------------------------------

def rot90_clip(clip: jnp.ndarray, k: jnp.ndarray) -> jnp.ndarray:
    """rot90^k of a SQUARE clip (T, S, S, C); k traced int in [0, 4)."""
    return jax.lax.switch(
        k % 4,
        [
            lambda x: x,
            lambda x: jnp.rot90(x, 1, axes=(1, 2)),
            lambda x: jnp.rot90(x, 2, axes=(1, 2)),
            lambda x: jnp.rot90(x, 3, axes=(1, 2)),
        ],
        clip,
    )


def _shear_weights(s: int, shift_per_row: jnp.ndarray) -> jnp.ndarray:
    """(S_rows, S_out, S_in) linear-interp band matrices: row r resamples a
    length-S axis at ``x_in = x_out + shift_per_row[r]`` with zero fill."""
    out_idx = jnp.arange(s, dtype=jnp.float32)
    in_idx = jnp.arange(s, dtype=jnp.float32)
    src = out_idx[None, :, None] + shift_per_row[:, None, None]  # (S,S_out,1)
    d = jnp.abs(in_idx[None, None, :] - src)                     # (S,S_out,S_in)
    w = jnp.maximum(0.0, 1.0 - d)
    # zero fill outside the source range (PIL rotate fills black)
    inside = (src >= 0.0) & (src <= s - 1)
    return jnp.where(inside, w, 0.0)


def rotate_small_clip(clip: jnp.ndarray, angle_deg: jnp.ndarray) -> jnp.ndarray:
    """Rotate a square clip by a small angle (degrees, CCW) about its center
    with black fill — reference ``RandomRotation(10)``
    (preprocess_data.py:1060-1099, applied at 1113).

    TPU-first formulation: the classic 3-shear decomposition
    ``R(θ) = shear_x(-tan θ/2) · shear_y(sin θ) · shear_x(-tan θ/2)`` where
    each shear is a per-row/column 1-D linear resample expressed as a batched
    band-matrix contraction on the MXU. The previous per-pixel bilinear
    gather issued ~S² scalar-indexed loads per frame — milliseconds per batch
    on TPU; three small matmuls are ~100× cheaper. Numerics: linear-interp
    shears ≈ bilinear rotation (the reference's PIL default is NEAREST, so
    both are documented interpolation upgrades).
    """
    t, s, s2, c = clip.shape
    assert s == s2
    theta = angle_deg * jnp.pi / 180.0  # sign matches PIL rotate (CCW visual)
    ctr = (s - 1) / 2.0
    rows = jnp.arange(s, dtype=jnp.float32) - ctr
    a = -jnp.tan(theta / 2.0)
    b = jnp.sin(theta)

    wx1 = _shear_weights(s, a * rows)   # shear along x, per row y
    wy = _shear_weights(s, b * rows)    # shear along y, per column x
    wx2 = wx1

    # out[t,y,x,c] = sum_w W[y,x,w] * in[t,y,w,c]
    out = jnp.einsum("yxw,tywc->tyxc", wx1, clip,
                     preferred_element_type=jnp.float32)
    # out[t,y,x,c] = sum_h W[x,y,h] * in[t,h,x,c]
    out = jnp.einsum("xyh,thxc->tyxc", wy, out,
                     preferred_element_type=jnp.float32)
    out = jnp.einsum("yxw,tywc->tyxc", wx2, out,
                     preferred_element_type=jnp.float32)
    return out


# ---------------------------------------------------------------------------
# photometric ops (reference ClipColorJitter / ClipRandomGray / ClipGaussianBlur;
# preprocess_data.py:584-710). Input range [0, 255].
# ---------------------------------------------------------------------------

def adjust_brightness(clip, factor):
    return clip * factor


def adjust_contrast(clip, factor):
    """Blend with per-frame mean luma (PIL ImageEnhance.Contrast)."""
    luma = jnp.einsum("thwc,c->thw", clip, _LUMA)
    mean = jnp.mean(luma, axis=(1, 2), keepdims=True)[..., None]  # (T,1,1,1)
    return clip * factor + mean * (1.0 - factor)


def adjust_saturation(clip, factor):
    """Blend with per-pixel luma (PIL ImageEnhance.Color)."""
    luma = jnp.einsum("thwc,c->thw", clip, _LUMA)[..., None]
    return clip * factor + luma * (1.0 - factor)


def _rgb_to_hsv(rgb):
    r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
    mx = jnp.max(rgb, axis=-1)
    mn = jnp.min(rgb, axis=-1)
    diff = mx - mn
    safe = jnp.where(diff == 0, 1.0, diff)
    h = jnp.where(
        mx == r, (g - b) / safe,
        jnp.where(mx == g, 2.0 + (b - r) / safe, 4.0 + (r - g) / safe),
    )
    h = jnp.where(diff == 0, 0.0, h / 6.0) % 1.0
    s = jnp.where(mx == 0, 0.0, diff / jnp.maximum(mx, 1e-12))
    return h, s, mx


def _hsv_to_rgb(h, s, v):
    i = jnp.floor(h * 6.0)
    f = h * 6.0 - i
    p = v * (1.0 - s)
    q = v * (1.0 - f * s)
    t = v * (1.0 - (1.0 - f) * s)
    i = i.astype(jnp.int32) % 6
    r = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5],
                   [v, q, p, p, t, v])
    g = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5],
                   [t, v, v, q, p, p])
    b = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5],
                   [p, p, t, v, v, q])
    return jnp.stack([r, g, b], axis=-1)


def adjust_hue(clip, hue_shift):
    """Shift hue by ``hue_shift`` in [-0.5, 0.5] turns."""
    h, s, v = _rgb_to_hsv(clip / 255.0)
    return _hsv_to_rgb((h + hue_shift) % 1.0, s, v) * 255.0


def color_jitter_clip(clip, factors):
    """Brightness, contrast, saturation, hue in fixed order.

    The reference shuffles the op order per call (preprocess_data.py:654);
    we fix the order b->c->s->h (documented distributional deviation).
    ``factors`` = (brightness, contrast, saturation, hue_shift).
    """
    clip = adjust_brightness(clip, factors[0])
    clip = adjust_contrast(clip, factors[1])
    clip = adjust_saturation(clip, factors[2])
    clip = adjust_hue(clip, factors[3])
    return jnp.clip(clip, 0.0, 255.0)


def random_gray_clip(clip, channel_per_frame):
    """Reference 'gray' = per-frame channel splitting: replicate one randomly
    chosen channel to all three (preprocess_data.py:705-710)."""
    t = clip.shape[0]
    onehot = jax.nn.one_hot(channel_per_frame, 3, dtype=clip.dtype)  # (T, 3)
    picked = jnp.einsum("thwc,tc->thw", clip, onehot)
    return jnp.repeat(picked[..., None], 3, axis=-1)


def gaussian_blur_clip(clip, sigma, radius: int = 7):
    """Separable Gaussian blur with one sigma per clip
    (preprocess_data.py:675-687). Static 2*radius+1 taps; boundary taps
    renormalized (≈ edge clamp)."""
    t, h, w, c = clip.shape
    offs = jnp.arange(-radius, radius + 1, dtype=jnp.float32)
    g = jnp.exp(-(offs**2) / (2.0 * jnp.maximum(sigma, 1e-3) ** 2))  # (K,)

    def band(n):
        idx = jnp.arange(n, dtype=jnp.int32)
        cols = idx[None, :] - idx[:, None]  # (n, n) signed offsets
        inside = jnp.abs(cols) <= radius
        wmat = jnp.where(inside, g[jnp.clip(cols + radius, 0, 2 * radius)], 0.0)
        return wmat / jnp.sum(wmat, axis=1, keepdims=True)

    by = band(h)
    bx = band(w)
    out = jnp.einsum("yh,thwc->tywc", by, clip,
                     preferred_element_type=jnp.float32)
    out = jnp.einsum("xw,tywc->tyxc", bx, out,
                     preferred_element_type=jnp.float32)
    return out


def hflip_clip(clip):
    return clip[:, :, ::-1, :]


def tf_normalize(clip):
    """[0,255] -> [-1,1] ('tf' norm: x/255*2-1, clamp; preprocess_data.py:361-364)."""
    return jnp.clip(clip / 255.0 * 2.0 - 1.0, -1.0, 1.0)


_IMAGENET_MEAN = np.asarray([0.485, 0.456, 0.406], np.float32)
_IMAGENET_STD = np.asarray([0.229, 0.224, 0.225], np.float32)


def normalize_clip(clip, method: str = "tf"):
    """--norm_method dispatch (reference ClipNormalize,
    preprocess_data.py:787-802): 'tf' = x*2-1 clamp, 'imagenet' =
    per-channel (x - mean)/std on [0,1] input."""
    if method == "tf":
        return tf_normalize(clip)
    if method == "imagenet":
        return (clip / 255.0 - _IMAGENET_MEAN) / _IMAGENET_STD
    raise ValueError(f"unknown norm_method {method!r}")
