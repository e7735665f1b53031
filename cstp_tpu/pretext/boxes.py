"""Spatial-overlap crop-box sampling — jittable, closed-form.

Reimplements the reference ``ClipRandomSizedCropOverlap``
(``data_process/preprocess_data.py:479-565``) without unbounded rejection
loops so it can run inside a jitted, batched device program:

* first crop (flag=0): 10 vectorized random-resized-crop attempts
  (area fraction ~ U[0.2,1], aspect ratio ~ U[3/4,4/3], 50% w/h swap); first
  in-bounds attempt wins, else the reference's Scale+CenterCrop fallback
  (preprocess_data.py:470-473) == a centered max square.
* second crop (flag=1): the reference resamples ``(spa, corner, s_w)`` until
  the derived box fits (preprocess_data.py:516-562). Its stationary law is
  P(spa, corner, s_w) ∝ [valid] / n_range(spa). We enumerate the valid
  ``s_w`` interval for each of the 20 (spa, corner) combos, sample the combo
  from that exact law, then ``s_w`` uniformly inside its valid interval.
  The (spa=0, corner=0) combo is always valid (the second crop equals the
  first), so the law is never degenerate.

Rotation geometry: the reference rotates full frames by k*90° CCW (PIL
ROTATE_90 semantics; datasets.py:19,878-881) *before* cropping. We instead
sample the crop box in rotated-frame coordinates, map it back to original
coordinates with :func:`rot90_box_to_original`, crop-resize from the original
frame, and apply ``rot90^k`` to the square output — mathematically identical
and static-shaped (no W/H swap of the full frame on device).

Boxes are (x, y, w, h) in pixels, float32 carrying integer values (the
reference works in ints; we mirror its ``int()`` floors explicitly).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from cstp_tpu.pretext.sampling import OVERLAP_SPA_RATE

Box = jnp.ndarray  # (4,) float32: x, y, w, h


def _randint(key, minval, maxval_inclusive):
    """Uniform integer in [minval, maxval_inclusive] with traced bounds.

    Mirrors python ``random.randint``. Bounds are float32 carrying ints.
    """
    u = jax.random.uniform(key)
    n = jnp.maximum(maxval_inclusive - minval + 1.0, 1.0)
    return minval + jnp.floor(u * n).clip(0.0, n - 1.0)


def sample_first_crop_box(
    key: jax.Array,
    img_w: jnp.ndarray,
    img_h: jnp.ndarray,
    bottom_area: float = 0.2,
    attempts: int = 10,
) -> Box:
    """flag=0 crop of ClipRandomSizedCropOverlap (preprocess_data.py:494-515)."""
    k_area, k_ar, k_swap, k_x, k_y = jax.random.split(key, 5)
    area = img_w * img_h
    frac = jax.random.uniform(k_area, (attempts,), minval=bottom_area, maxval=1.0)
    target_area = frac * area
    ar = jax.random.uniform(k_ar, (attempts,), minval=3.0 / 4.0, maxval=4.0 / 3.0)
    w = jnp.round(jnp.sqrt(target_area * ar))
    h = jnp.round(jnp.sqrt(target_area / ar))
    swap = jax.random.bernoulli(k_swap, 0.5, (attempts,))
    w, h = jnp.where(swap, h, w), jnp.where(swap, w, h)
    valid = (w <= img_w) & (h <= img_h)
    any_valid = jnp.any(valid)
    first = jnp.argmax(valid)  # first True (argmax returns first max index)
    w_pick = jnp.where(any_valid, w[first], jnp.minimum(img_w, img_h))
    h_pick = jnp.where(any_valid, h[first], jnp.minimum(img_w, img_h))
    # x1 ~ U{0..W-w}, y1 ~ U{0..H-h}; fallback is the centered square
    x1 = jnp.where(any_valid, _randint(k_x, 0.0, img_w - w_pick),
                   jnp.round((img_w - w_pick) / 2.0))
    y1 = jnp.where(any_valid, _randint(k_y, 0.0, img_h - h_pick),
                   jnp.round((img_h - h_pick) / 2.0))
    return jnp.stack([x1, y1, w_pick, h_pick]).astype(jnp.float32)


def sample_second_crop_box(
    key: jax.Array, box1: Box, img_w: jnp.ndarray, img_h: jnp.ndarray
) -> Tuple[Box, jnp.ndarray]:
    """flag=1 crop: same-size box overlapping box1 by OVERLAP_SPA_RATE[spa]
    of its area, anchored at one of 4 corners (preprocess_data.py:516-562).

    Returns (box2, spa_label int32).
    """
    p_x, p_y, p_w, p_h = box1[0], box1[1], box1[2], box1[3]
    rates = jnp.asarray(OVERLAP_SPA_RATE, jnp.float32)  # (5,)

    s_w_lo = jnp.floor(rates * p_w)                      # int(spa_rate * p_w)
    n_range = p_w - s_w_lo + 1.0                         # size of raw s_w range
    # s_w >= a (x-fit) and s_h >= b (y-fit) per corner; s_h = floor(r*p_w*p_h/s_w)
    a_c = jnp.stack([p_w - p_x, p_x + 2 * p_w - img_w,
                     p_w - p_x, p_x + 2 * p_w - img_w])  # (4,)
    b_c = jnp.stack([p_h - p_y, p_h - p_y,
                     p_y + 2 * p_h - img_h, p_y + 2 * p_h - img_h])  # (4,)
    area1 = rates * p_w * p_h                            # (5,)
    # s_h >= b  <=>  s_w <= floor(area1 / b)   (b integer-valued, b >= 1)
    hi_b = jnp.where(b_c[None, :] >= 1.0,
                     jnp.floor(area1[:, None] / jnp.maximum(b_c[None, :], 1.0)),
                     jnp.inf)                            # (5, 4)
    lo = jnp.maximum(s_w_lo[:, None], jnp.ceil(a_c[None, :]))       # (5, 4)
    hi = jnp.minimum(p_w, hi_b)                                     # (5, 4)
    n_valid = jnp.maximum(hi - lo + 1.0, 0.0)                       # (5, 4)
    weight = n_valid / n_range[:, None]                             # (5, 4)

    k_cat, k_sw = jax.random.split(key)
    logits = jnp.where(weight > 0, jnp.log(jnp.maximum(weight, 1e-30)), -jnp.inf)
    choice = jax.random.categorical(k_cat, logits.reshape(-1))      # in [0,20)
    spa = choice // 4
    corner = choice % 4
    lo_c = lo.reshape(-1)[choice]
    hi_c = hi.reshape(-1)[choice]
    s_w = _randint(k_sw, lo_c, hi_c)
    s_h = jnp.floor(area1[spa] / s_w)

    is_right = (corner == 1) | (corner == 3)   # corners 1,3 anchor right edge
    is_bottom = (corner == 2) | (corner == 3)  # corners 2,3 anchor bottom edge
    e_w = jnp.where(is_right, p_x + 2 * p_w - s_w, p_x + s_w)
    e_h = jnp.where(is_bottom, p_y + 2 * p_h - s_h, p_y + s_h)
    box2 = jnp.stack([e_w - p_w, e_h - p_h, p_w, p_h]).astype(jnp.float32)
    return box2, spa.astype(jnp.int32)


def rot90_box_to_original(
    box: Box, k: jnp.ndarray, img_w0: float, img_h0: float
) -> Box:
    """Map a box from rot90^k(image) coordinates back to original coords.

    ``k`` counts 90° CCW rotations (np.rot90 / PIL ROTATE_90 convention).
    For odd k the rotated frame is (H0 x W0); callers must have sampled the
    box against those swapped dims.
    """
    a, b, w, h = box[0], box[1], box[2], box[3]
    b0 = jnp.stack([a, b, w, h])
    b1 = jnp.stack([img_w0 - b - h, a, h, w])
    b2 = jnp.stack([img_w0 - a - w, img_h0 - b - h, w, h])
    b3 = jnp.stack([b, img_h0 - a - w, h, w])
    return jnp.stack([b0, b1, b2, b3])[k % 4].astype(jnp.float32)


def rotated_dims(k: jnp.ndarray, img_w0: float, img_h0: float):
    """(w, h) of rot90^k(image)."""
    odd = (k % 2) == 1
    w = jnp.where(odd, img_h0, img_w0).astype(jnp.float32)
    h = jnp.where(odd, img_w0, img_h0).astype(jnp.float32)
    return w, h


def sample_pair_boxes(
    key: jax.Array,
    rot1: jnp.ndarray,
    rot2: jnp.ndarray,
    img_w0: float,
    img_h0: float,
    bottom_area: float = 0.2,
):
    """Sample both clips' crop boxes in their rotated coordinate frames and
    return them mapped to ORIGINAL coordinates, plus the spa label.

    The overlap label is computed between the two boxes in their respective
    rotated frames — exactly the reference semantics, where rotation happens
    before cropping (datasets.py:893-946 feed rotated frames into
    TwoClipTransform).
    """
    k1, k2 = jax.random.split(key)
    w1, h1 = rotated_dims(rot1, img_w0, img_h0)
    w2, h2 = rotated_dims(rot2, img_w0, img_h0)
    box1_rot = sample_first_crop_box(k1, w1, h1, bottom_area)
    # Reference computes the second box against the first box's geometry in
    # ITS OWN rotated frame (both clips pass through one
    # ClipRandomSizedCropOverlap whose pick_size/pick_loc persist;
    # preprocess_data.py:511-519). When rot1 != rot2 the overlap is measured
    # across differing orientations — we mirror that by reusing box1_rot
    # verbatim against clip 2's rotated dims.
    box2_rot, spa = sample_second_crop_box(k2, box1_rot, w2, h2)
    box1 = rot90_box_to_original(box1_rot, rot1, img_w0, img_h0)
    box2 = rot90_box_to_original(box2_rot, rot2, img_w0, img_h0)
    return box1, box2, spa
