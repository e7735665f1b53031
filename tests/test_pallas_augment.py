"""Fused Pallas augmentation kernel vs the XLA pipeline (interpret mode).

Both consume the same parameter arrays (augment/params.py), so for any
params the kernel must reproduce crop+resize -> rot90 -> 3-shear rotation ->
jitter -> gray -> blur -> flip -> normalize to float tolerance.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cstp_tpu.augment import ops
from cstp_tpu.augment.params import ClipAugParams, sample_clip_aug_params
from cstp_tpu.augment.pipeline import apply_clip_aug
from cstp_tpu.ops.pallas.augment import fused_augment_clips

B, T, H0, W0, S = 3, 4, 64, 80, 48


def _xla_reference(frames, box, rotk, p: ClipAugParams, norm="tf"):
    """Per-sample XLA composition the kernel must match."""
    def one(f, bx, rk, angle, factors, graymix, sigma, flip):
        v = ops.crop_resize_clip(f.astype(jnp.float32), bx, S)
        v = ops.rot90_clip(v, rk)
        v = apply_clip_aug(v, ClipAugParams(angle, factors, graymix, sigma,
                                            flip))
        return ops.normalize_clip(v, norm)

    return jax.vmap(one)(frames, box, rotk, p.angle, p.factors, p.graymix,
                         p.sigma, p.flip)


def _random_inputs(rng, null=False):
    frames = jnp.asarray(rng.integers(0, 255, (B, T, H0, W0, 3)), jnp.uint8)
    box = jnp.asarray(
        np.stack([
            rng.uniform(0, 10, B), rng.uniform(0, 8, B),
            rng.uniform(30, 60, B), rng.uniform(30, 50, B),
        ], axis=1), jnp.float32)
    rotk = jnp.asarray(rng.integers(0, 4, (B,)), jnp.int32)
    if null:
        p = ClipAugParams(
            angle=jnp.zeros((B,)),
            factors=jnp.tile(jnp.asarray([1.0, 1.0, 1.0, 0.0]), (B, 1)),
            graymix=jnp.tile(jnp.eye(3), (B, T, 1, 1)),
            sigma=jnp.zeros((B,)),
            flip=jnp.asarray(rng.integers(0, 2, (B,)), bool),
        )
    else:
        p = ClipAugParams(
            angle=jnp.asarray(rng.uniform(-10, 10, B), jnp.float32),
            factors=jnp.asarray(np.stack([
                rng.uniform(0.6, 1.4, B), rng.uniform(0.6, 1.4, B),
                rng.uniform(0.6, 1.4, B), rng.uniform(-0.1, 0.1, B),
            ], axis=1), jnp.float32),
            graymix=jnp.asarray(
                np.eye(3)[rng.integers(0, 3, (B, T))][:, :, None, :]
                * np.ones((1, 1, 3, 1))),
            sigma=jnp.asarray(rng.uniform(0.1, 2.0, B), jnp.float32),
            flip=jnp.asarray(rng.integers(0, 2, (B,)), bool),
        )
    return frames, box, rotk, p


@pytest.mark.parametrize("null", [True, False])
def test_fused_kernel_matches_xla(rng, null):
    frames, box, rotk, p = _random_inputs(rng, null=null)
    want = np.asarray(_xla_reference(frames, box, rotk, p))
    got = np.asarray(fused_augment_clips(
        frames, box, rotk, p.angle, p.factors, p.graymix, p.sigma, p.flip,
        sample_size=S, out_dtype=jnp.float32, interpret=True))
    assert got.shape == (B, T, S, S, 3)
    np.testing.assert_allclose(got, want, atol=2e-2, rtol=0)


def test_fused_kernel_imagenet_norm(rng):
    frames, box, rotk, p = _random_inputs(rng, null=True)
    want = np.asarray(_xla_reference(frames, box, rotk, p, norm="imagenet"))
    got = np.asarray(fused_augment_clips(
        frames, box, rotk, p.angle, p.factors, p.graymix, p.sigma, p.flip,
        sample_size=S, norm_method="imagenet", out_dtype=jnp.float32,
        interpret=True))
    np.testing.assert_allclose(got, want, atol=2e-2, rtol=0)


def test_sampled_params_match_legacy_stream(key):
    """sample_clip_aug_params consumes the same key structure the inline
    _augment_one_clip used; applying them reproduces the pipeline op."""
    from cstp_tpu.augment.pipeline import _augment_one_clip

    rng = np.random.default_rng(0)
    clip = jnp.asarray(rng.uniform(0, 255, (T, S, S, 3)), jnp.float32)
    p = sample_clip_aug_params(key, T)
    a = np.asarray(apply_clip_aug(clip, p))
    b = np.asarray(_augment_one_clip(key, clip))
    np.testing.assert_allclose(a, b, atol=1e-4)
