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
from cstp_tpu.augment.params import (
    BASE_PROB,
    BLUR_PROB,
    FLIP_PROB,
    GRAY_PROB,
    JITTER_PROB,
    JITTER_STRENGTH,
    ROT_DEG,
    ClipAugParams,
    sample_clip_aug_params,
)
from cstp_tpu.pretext.boxes import sample_pair_boxes, sample_first_crop_box


def apply_clip_aug(clip: jnp.ndarray, p: ClipAugParams) -> jnp.ndarray:
    """Branch-free pixel pipeline for one cropped square clip [0,255]:
    rotate(angle) -> jitter(factors) -> gray(mix) -> blur(sigma) -> flip.
    All 'off' states are identity-valued parameters (augment/params.py), so
    null clips pass through exactly. Shared semantics with the fused Pallas
    kernel (ops/pallas/augment.py), which is equivalence-tested against this.
    """
    clip = jnp.where(p.angle != 0.0, ops.rotate_small_clip(clip, p.angle),
                     clip)
    jit_on = (p.factors[0] != 1.0) | (p.factors[3] != 0.0)
    clip = jnp.where(jit_on, ops.color_jitter_clip(clip, p.factors), clip)
    # gray: per-frame linear channel mix (identity when off)
    clip = jnp.einsum("tcd,thwd->thwc", p.graymix, clip)
    clip = jnp.where(p.sigma > 0.0, ops.gaussian_blur_clip(clip, p.sigma),
                     clip)
    clip = jnp.where(p.flip, ops.hflip_clip(clip), clip)
    return clip


def _augment_one_clip(key: jax.Array, clip: jnp.ndarray) -> jnp.ndarray:
    """Apply base-or-null augmentation to one cropped square clip [0,255]."""
    return apply_clip_aug(clip, sample_clip_aug_params(key, clip.shape[0]))


def _pretrain_one_sample(
    key: jax.Array,
    frames1: jnp.ndarray,  # (T, H0, W0, 3) uint8
    frames2: jnp.ndarray,
    rot1: jnp.ndarray,     # () int32
    rot2: jnp.ndarray,
    sample_size: int,
    norm_method: str = "tf",
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
    return (ops.normalize_clip(v1, norm_method),
            ops.normalize_clip(v2, norm_method), spa)


@functools.partial(jax.jit, static_argnames=("sample_size", "norm_method"))
def pretrain_augment_batch(
    key: jax.Array,
    frames1: jnp.ndarray,  # (B, T, H0, W0, 3) uint8
    frames2: jnp.ndarray,
    rot1: jnp.ndarray,     # (B,) int32
    rot2: jnp.ndarray,
    sample_size: int = 112,
    norm_method: str = "tf",
):
    """Batched two-clip pretrain augmentation.

    Returns (view1, view2, spa_label): views are (B, T, S, S, 3) float32 in
    [-1, 1]; spa_label is (B,) int32 in [0, 5).
    """
    keys = jax.random.split(key, frames1.shape[0])
    fn = functools.partial(_pretrain_one_sample, sample_size=sample_size,
                           norm_method=norm_method)
    return jax.vmap(fn)(keys, frames1, frames2, rot1, rot2)


def sample_pretrain_aug_params(key, batch: int, t: int, w0: float, h0: float,
                               rot1, rot2):
    """Vmapped randomness for the whole pretrain batch — the same key
    structure as :func:`_pretrain_one_sample`, so the fused-Pallas and XLA
    pipelines consume identical streams."""

    def one(k, r1, r2):
        k_box, k1, k2 = jax.random.split(k, 3)
        box1, box2, spa = sample_pair_boxes(k_box, r1, r2, w0, h0)
        p1 = sample_clip_aug_params(k1, t)
        p2 = sample_clip_aug_params(k2, t)
        return box1, box2, spa, p1, p2

    keys = jax.random.split(key, batch)
    return jax.vmap(one)(keys, rot1, rot2)


def pretrain_augment_batch_fused(
    key: jax.Array,
    frames1: jnp.ndarray,  # (B, T, H0, W0, 3) uint8
    frames2: jnp.ndarray,
    rot1: jnp.ndarray,
    rot2: jnp.ndarray,
    sample_size: int = 112,
    norm_method: str = "tf",
    out_dtype=jnp.bfloat16,
):
    """Fused-Pallas variant of :func:`pretrain_augment_batch`: randomness in
    XLA (tiny), then ONE kernel over the 2B concatenated clip views
    (ops/pallas/augment.py). Returns (view1, view2, spa) in ``out_dtype``."""
    from cstp_tpu.ops.pallas.augment import fused_augment_clips

    b, t, h0, w0, _ = frames1.shape
    box1, box2, spa, p1, p2 = sample_pretrain_aug_params(
        key, b, t, float(w0), float(h0), rot1, rot2)
    frames = jnp.concatenate([frames1, frames2], axis=0)
    views = fused_augment_clips(
        frames,
        jnp.concatenate([box1, box2], axis=0),
        jnp.concatenate([rot1, rot2], axis=0),
        jnp.concatenate([p1.angle, p2.angle], axis=0),
        jnp.concatenate([p1.factors, p2.factors], axis=0),
        jnp.concatenate([p1.graymix, p2.graymix], axis=0),
        jnp.concatenate([p1.sigma, p2.sigma], axis=0),
        jnp.concatenate([p1.flip, p2.flip], axis=0),
        sample_size=sample_size,
        norm_method=norm_method,
        out_dtype=out_dtype,
    )
    return views[:b], views[b:], spa


def _finetune_one_sample(key, frames, sample_size, norm_method="tf"):
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
    return ops.normalize_clip(clip, norm_method)


@functools.partial(jax.jit, static_argnames=("sample_size", "norm_method"))
def finetune_train_augment_batch(key, frames, sample_size: int = 112,
                                 norm_method: str = "tf"):
    """(B, T, H0, W0, 3) uint8 -> (B, T, S, S, 3) float32 in [-1, 1]."""
    keys = jax.random.split(key, frames.shape[0])
    fn = functools.partial(_finetune_one_sample, sample_size=sample_size,
                           norm_method=norm_method)
    return jax.vmap(fn)(keys, frames)


@functools.partial(jax.jit,
                   static_argnames=("sample_size", "short_side", "norm_method"))
def eval_augment_batch(frames, sample_size: int = 112, short_side: int = 128,
                       norm_method: str = "tf"):
    """get_transforms('img_val'/'img_test'): scale short side to 128, center
    crop 112, normalize (preprocess_data.py:1139-1149). Deterministic."""
    b, t, h0, w0, c = frames.shape
    side = sample_size / short_side * min(h0, w0)
    x0 = (w0 - side) / 2.0
    y0 = (h0 - side) / 2.0
    box = jnp.asarray([x0, y0, side, side], jnp.float32)

    def one(fr):
        return ops.normalize_clip(
            ops.crop_resize_clip(fr.astype(jnp.float32), box, sample_size),
            norm_method,
        )

    return jax.vmap(one)(frames)
