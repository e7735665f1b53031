"""Fused on-device augmentation pipelines.

Replaces the reference's CPU/PIL per-frame transform chains
(``preprocess_data.py:1103-1178`` and ``TwoClipTransform``, 713-741) with a
single jitted, batch-vmapped program that consumes host-decoded uint8 frames
and emits normalized training views *plus* the spatial-overlap pretext label.

Reference pretrain semantics reproduced (order matters):
  dataset: rot90 by pretext label (datasets.py:878-881, folded into the crop
  geometry here — see pretext.boxes) ->
  TwoClipTransform (p=0.3 chance of 'base' per clip, else 'null'):
    base  = RandomRotation(±10°) -> ColorJitter(.4,.4,.4,.1)@p.8 ->
            RandomGray@p.2 -> GaussianBlur(σ∈[.1,2])@p.5 -> HFlip@p.5
    null  = HFlip@p.5
  -> ToTensor -> tf-normalize (x/255*2-1).

Every stochastic choice is computed for the whole batch and applied with
masked ``jnp.where`` — static shapes, one XLA program, no host round-trips.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from cstp_tpu.augment import ops
from cstp_tpu.pretext.boxes import sample_pair_boxes, sample_first_crop_box

BASE_PROB = 0.3     # TwoClipTransform p (preprocess_data.py:1128)
JITTER_PROB = 0.8   # RandomApply around ClipColorJitter (1114-1116)
GRAY_PROB = 0.2     # ClipRandomGray (1117)
BLUR_PROB = 0.5     # RandomApply around ClipGaussianBlur (1118)
FLIP_PROB = 0.5     # ClipRandomHorizontalFlip (1119/1107)
ROT_DEG = 10.0      # RandomRotation(10) (1113)
JITTER_STRENGTH = (0.4, 0.4, 0.4, 0.1)  # b, c, s, hue (1115)


def _augment_one_clip(key: jax.Array, clip: jnp.ndarray) -> jnp.ndarray:
    """Apply base-or-null augmentation to one cropped square clip [0,255]."""
    (k_base, k_rot, k_jit_on, k_jit, k_gray_on, k_gray_ch, k_blur_on,
     k_blur, k_flip) = jax.random.split(key, 9)
    use_base = jax.random.bernoulli(k_base, BASE_PROB)

    # RandomRotation(±10°) — always applied inside base
    angle = jax.random.uniform(k_rot, minval=-ROT_DEG, maxval=ROT_DEG)
    clip = jnp.where(use_base, ops.rotate_small_clip(clip, angle), clip)

    # ColorJitter
    b, c, s, h = JITTER_STRENGTH
    f = jnp.stack([
        jax.random.uniform(k_jit, minval=1.0 - b, maxval=1.0 + b),
        jax.random.uniform(jax.random.fold_in(k_jit, 1), minval=1.0 - c, maxval=1.0 + c),
        jax.random.uniform(jax.random.fold_in(k_jit, 2), minval=1.0 - s, maxval=1.0 + s),
        jax.random.uniform(jax.random.fold_in(k_jit, 3), minval=-h, maxval=h),
    ])
    jit_on = use_base & jax.random.bernoulli(k_jit_on, JITTER_PROB)
    clip = jnp.where(jit_on, ops.color_jitter_clip(clip, f), clip)

    # RandomGray (per-frame channel choice; preprocess_data.py:705-710)
    gray_on = use_base & jax.random.bernoulli(k_gray_on, GRAY_PROB)
    channels = jax.random.randint(k_gray_ch, (clip.shape[0],), 0, 3)
    clip = jnp.where(gray_on, ops.random_gray_clip(clip, channels), clip)

    # GaussianBlur, one sigma per clip
    blur_on = use_base & jax.random.bernoulli(k_blur_on, BLUR_PROB)
    sigma = jax.random.uniform(k_blur, minval=0.1, maxval=2.0)
    clip = jnp.where(blur_on, ops.gaussian_blur_clip(clip, sigma), clip)

    # HFlip — in both base and null branches
    flip_on = jax.random.bernoulli(k_flip, FLIP_PROB)
    clip = jnp.where(flip_on, ops.hflip_clip(clip), clip)
    return clip


def _pretrain_one_sample(
    key: jax.Array,
    frames1: jnp.ndarray,  # (T, H0, W0, 3) uint8
    frames2: jnp.ndarray,
    rot1: jnp.ndarray,     # () int32
    rot2: jnp.ndarray,
    sample_size: int,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    h0, w0 = frames1.shape[1], frames1.shape[2]
    k_box, k_aug1, k_aug2 = jax.random.split(key, 3)
    box1, box2, spa = sample_pair_boxes(k_box, rot1, rot2, float(w0), float(h0))

    f1 = frames1.astype(jnp.float32)
    f2 = frames2.astype(jnp.float32)
    v1 = ops.crop_resize_clip(f1, box1, sample_size)
    v2 = ops.crop_resize_clip(f2, box2, sample_size)
    v1 = ops.rot90_clip(v1, rot1)
    v2 = ops.rot90_clip(v2, rot2)
    v1 = _augment_one_clip(k_aug1, v1)
    v2 = _augment_one_clip(k_aug2, v2)
    return ops.tf_normalize(v1), ops.tf_normalize(v2), spa


@functools.partial(jax.jit, static_argnames=("sample_size",))
def pretrain_augment_batch(
    key: jax.Array,
    frames1: jnp.ndarray,  # (B, T, H0, W0, 3) uint8
    frames2: jnp.ndarray,
    rot1: jnp.ndarray,     # (B,) int32
    rot2: jnp.ndarray,
    sample_size: int = 112,
):
    """Batched two-clip pretrain augmentation.

    Returns (view1, view2, spa_label): views are (B, T, S, S, 3) float32 in
    [-1, 1]; spa_label is (B,) int32 in [0, 5).
    """
    keys = jax.random.split(key, frames1.shape[0])
    fn = functools.partial(_pretrain_one_sample, sample_size=sample_size)
    return jax.vmap(fn)(keys, frames1, frames2, rot1, rot2)


def _finetune_one_sample(key, frames, sample_size):
    """get_transforms('img'): ClipRandomSizedCrop + ColorJitter@p0.3 + norm
    (preprocess_data.py:1131-1138)."""
    h0, w0 = frames.shape[1], frames.shape[2]
    k_box, k_jit_on, k_jit = jax.random.split(key, 3)
    box = sample_first_crop_box(k_box, float(w0), float(h0), bottom_area=0.2)
    clip = ops.crop_resize_clip(frames.astype(jnp.float32), box, sample_size)
    b, c, s, h = JITTER_STRENGTH
    f = jnp.stack([
        jax.random.uniform(k_jit, minval=1.0 - b, maxval=1.0 + b),
        jax.random.uniform(jax.random.fold_in(k_jit, 1), minval=1.0 - c, maxval=1.0 + c),
        jax.random.uniform(jax.random.fold_in(k_jit, 2), minval=1.0 - s, maxval=1.0 + s),
        jax.random.uniform(jax.random.fold_in(k_jit, 3), minval=-h, maxval=h),
    ])
    jit_on = jax.random.bernoulli(k_jit_on, 0.3)
    clip = jnp.where(jit_on, ops.color_jitter_clip(clip, f), clip)
    return ops.tf_normalize(clip)


@functools.partial(jax.jit, static_argnames=("sample_size",))
def finetune_train_augment_batch(key, frames, sample_size: int = 112):
    """(B, T, H0, W0, 3) uint8 -> (B, T, S, S, 3) float32 in [-1, 1]."""
    keys = jax.random.split(key, frames.shape[0])
    fn = functools.partial(_finetune_one_sample, sample_size=sample_size)
    return jax.vmap(fn)(keys, frames)


@functools.partial(jax.jit, static_argnames=("sample_size", "short_side"))
def eval_augment_batch(frames, sample_size: int = 112, short_side: int = 128):
    """get_transforms('img_val'/'img_test'): scale short side to 128, center
    crop 112, normalize (preprocess_data.py:1139-1149). Deterministic."""
    b, t, h0, w0, c = frames.shape
    side = sample_size / short_side * min(h0, w0)
    x0 = (w0 - side) / 2.0
    y0 = (h0 - side) / 2.0
    box = jnp.asarray([x0, y0, side, side], jnp.float32)

    def one(fr):
        return ops.tf_normalize(
            ops.crop_resize_clip(fr.astype(jnp.float32), box, sample_size)
        )

    return jax.vmap(one)(frames)
