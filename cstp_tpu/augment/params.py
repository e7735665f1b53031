"""Per-clip augmentation parameter sampling.

Splits the reference's TwoClipTransform randomness (preprocess_data.py:
713-741, 1103-1130) from its pixel work: :func:`sample_clip_aug_params`
draws every stochastic decision for ONE clip and encodes the masked
"base vs null" branch structure as *identity-valued parameters* —
angle 0, unit jitter factors, identity gray mix, sigma 0 — so the pixel
pipeline (XLA or the fused Pallas kernel) is branch-free and both consume
the exact same distribution.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

BASE_PROB = 0.3     # TwoClipTransform p (preprocess_data.py:1128)
JITTER_PROB = 0.8   # RandomApply around ClipColorJitter (1114-1116)
GRAY_PROB = 0.2     # ClipRandomGray (1117)
BLUR_PROB = 0.5     # RandomApply around ClipGaussianBlur (1118)
FLIP_PROB = 0.5     # ClipRandomHorizontalFlip (1119/1107)
ROT_DEG = 10.0      # RandomRotation(10) (1113)
JITTER_STRENGTH = (0.4, 0.4, 0.4, 0.1)  # b, c, s, hue (1115)


class ClipAugParams(NamedTuple):
    """All randomness for one clip's base-or-null augmentation, encoded so
    that 'off' == identity."""

    angle: jnp.ndarray     # () f32 degrees; 0 = no rotation
    factors: jnp.ndarray   # (4,) f32 brightness/contrast/saturation/hue
    graymix: jnp.ndarray   # (T, 3, 3) f32 channel-mixing matrix
    sigma: jnp.ndarray     # () f32 blur sigma; 0 = no blur
    flip: jnp.ndarray      # () bool


def sample_clip_aug_params(key: jax.Array, t: int) -> ClipAugParams:
    """Same draw structure (and key consumption) as round-1's
    ``_augment_one_clip`` so augmentation streams stay reproducible."""
    (k_base, k_rot, k_jit_on, k_jit, k_gray_on, k_gray_ch, k_blur_on,
     k_blur, k_flip) = jax.random.split(key, 9)
    use_base = jax.random.bernoulli(k_base, BASE_PROB)

    angle = jax.random.uniform(k_rot, minval=-ROT_DEG, maxval=ROT_DEG)
    angle = jnp.where(use_base, angle, 0.0)

    b, c, s, h = JITTER_STRENGTH
    factors = jnp.stack([
        jax.random.uniform(k_jit, minval=1.0 - b, maxval=1.0 + b),
        jax.random.uniform(jax.random.fold_in(k_jit, 1), minval=1.0 - c,
                           maxval=1.0 + c),
        jax.random.uniform(jax.random.fold_in(k_jit, 2), minval=1.0 - s,
                           maxval=1.0 + s),
        jax.random.uniform(jax.random.fold_in(k_jit, 3), minval=-h, maxval=h),
    ])
    jit_on = use_base & jax.random.bernoulli(k_jit_on, JITTER_PROB)
    factors = jnp.where(jit_on, factors, jnp.asarray([1.0, 1.0, 1.0, 0.0]))

    gray_on = use_base & jax.random.bernoulli(k_gray_on, GRAY_PROB)
    channels = jax.random.randint(k_gray_ch, (t,), 0, 3)
    # gray = broadcast one chosen channel to all three: rows of the mixing
    # matrix are the chosen channel's one-hot (preprocess_data.py:705-710)
    onehot = jax.nn.one_hot(channels, 3, dtype=jnp.float32)      # (T, 3)
    graymix = jnp.broadcast_to(onehot[:, None, :], (t, 3, 3))
    graymix = jnp.where(gray_on, graymix, jnp.eye(3, dtype=jnp.float32))

    blur_on = use_base & jax.random.bernoulli(k_blur_on, BLUR_PROB)
    sigma = jax.random.uniform(k_blur, minval=0.1, maxval=2.0)
    sigma = jnp.where(blur_on, sigma, 0.0)

    flip = jax.random.bernoulli(k_flip, FLIP_PROB)
    return ClipAugParams(angle, factors, graymix, sigma, flip)
