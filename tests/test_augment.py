"""Tests for on-device augmentation ops and the fused pretrain pipeline."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cstp_tpu.augment import ops
from cstp_tpu.augment.pipeline import (
    eval_augment_batch,
    finetune_train_augment_batch,
    pretrain_augment_batch,
)

T, H0, W0 = 4, 64, 80


@pytest.fixture(scope="module")
def clip():
    rng = np.random.default_rng(1)
    return jnp.asarray(rng.uniform(0, 255, (T, H0, W0, 3)).astype(np.float32))


def test_crop_resize_identity_box(clip):
    """Cropping the full frame and 'resizing' to the same size ≈ identity."""
    box = jnp.asarray([0.0, 0.0, W0, H0])
    out = jax.jit(lambda c: ops.crop_resize_clip(c, box, H0))(clip)
    # out is (T, H0, H0, C) — resize W0->H0 changes W; use a square input
    sq = clip[:, :, :H0, :]
    box_sq = jnp.asarray([0.0, 0.0, H0, H0])
    out = jax.jit(lambda c: ops.crop_resize_clip(c, box_sq, H0))(sq)
    np.testing.assert_allclose(np.asarray(out), np.asarray(sq), atol=1e-2)


def test_crop_resize_matches_pil_bicubic():
    """Device crop+resize vs PIL BICUBIC on a smooth image (antialias paths
    differ on hard edges; smooth content must agree closely)."""
    from PIL import Image

    yy, xx = np.mgrid[0:H0, 0:W0].astype(np.float32)
    img = (
        127 + 80 * np.sin(xx / 9.0) * np.cos(yy / 7.0)
    ).astype(np.float32)
    rgb = np.stack([img, img[::-1], img.T[: H0, :W0] if False else img], -1)
    rgb = np.clip(rgb, 0, 255)
    box = (10, 6, 58, 50)  # x0, y0, x1, y1 PIL-style
    pil = Image.fromarray(rgb.astype(np.uint8)).crop(box).resize(
        (32, 32), Image.BICUBIC
    )
    want = np.asarray(pil).astype(np.float32)

    clip1 = jnp.asarray(rgb.astype(np.float32))[None]  # (1, H, W, C) as T=1
    dev_box = jnp.asarray([10.0, 6.0, 48.0, 44.0])  # x, y, w, h
    got = np.asarray(ops.crop_resize_clip(clip1, dev_box, 32))[0]
    err = np.abs(got - want).mean()
    assert err < 6.0, err  # mean abs err in [0,255] units


def test_rot90_clip_matches_numpy(clip):
    sq = clip[:, :, :H0, :]
    for k in range(4):
        got = np.asarray(ops.rot90_clip(sq, jnp.asarray(k)))
        want = np.rot90(np.asarray(sq), k, axes=(1, 2))
        np.testing.assert_array_equal(got, want)


def test_rotate_small_zero_angle_identity(clip):
    sq = clip[:, :, :H0, :]
    out = np.asarray(ops.rotate_small_clip(sq, jnp.asarray(0.0)))
    np.testing.assert_allclose(out, np.asarray(sq), atol=1e-3)


def test_rotate_small_matches_pil_bilinear():
    """3-shear MXU rotation vs PIL rotate(BILINEAR) on smooth content:
    interior must agree closely (borders differ in fill handling)."""
    from PIL import Image

    yy, xx = np.mgrid[0:64, 0:64].astype(np.float32)
    img = (127 + 80 * np.sin(xx / 9.0) * np.cos(yy / 7.0)).astype(np.float32)
    rgb = np.clip(np.stack([img] * 3, -1), 0, 255)
    for ang in (3.0, 7.5, -9.9):
        pil = Image.fromarray(rgb.astype(np.uint8)).rotate(ang, Image.BILINEAR)
        want = np.asarray(pil).astype(np.float32)
        got = np.asarray(
            ops.rotate_small_clip(jnp.asarray(rgb)[None], jnp.asarray(ang))
        )[0]
        err = np.abs(got[8:-8, 8:-8] - want[8:-8, 8:-8]).mean()
        assert err < 2.0, (ang, err)


def test_rotate_small_rotates_energy(clip):
    sq = clip[:, :, :H0, :]
    out = np.asarray(ops.rotate_small_clip(sq, jnp.asarray(10.0)))
    assert out.shape == sq.shape
    # corners become black
    assert out[:, 0, 0, :].max() == 0.0
    # interior preserved approximately (rotation is norm-preserving-ish)
    assert abs(out.mean() / np.asarray(sq).mean() - 1.0) < 0.1


def test_brightness_contrast_saturation(clip):
    np.testing.assert_allclose(
        np.asarray(ops.adjust_brightness(clip, 0.5)), np.asarray(clip) * 0.5
    )
    # contrast factor 1 / saturation factor 1 are identities
    np.testing.assert_allclose(
        np.asarray(ops.adjust_contrast(clip, 1.0)), np.asarray(clip), atol=1e-3
    )
    np.testing.assert_allclose(
        np.asarray(ops.adjust_saturation(clip, 1.0)), np.asarray(clip), atol=1e-3
    )
    # saturation 0 -> grayscale: all channels equal
    g = np.asarray(ops.adjust_saturation(clip, 0.0))
    np.testing.assert_allclose(g[..., 0], g[..., 1], atol=1e-3)


def test_hue_roundtrip(clip):
    out = np.asarray(ops.adjust_hue(clip, 0.0))
    np.testing.assert_allclose(out, np.asarray(clip), atol=0.5)
    # full-turn shift is also identity
    out = np.asarray(ops.adjust_hue(ops.adjust_hue(clip, 0.25), -0.25))
    np.testing.assert_allclose(out, np.asarray(clip), atol=1.0)


def test_random_gray_replicates_channel(clip):
    ch = jnp.asarray([0, 1, 2, 0])
    out = np.asarray(ops.random_gray_clip(clip, ch))
    src = np.asarray(clip)
    np.testing.assert_allclose(out[0, ..., 0], src[0, ..., 0])
    np.testing.assert_allclose(out[1, ..., 0], src[1, ..., 1])
    np.testing.assert_allclose(out[1, ..., 2], src[1, ..., 1])


def test_gaussian_blur_preserves_mean(clip):
    out = np.asarray(ops.gaussian_blur_clip(clip, jnp.asarray(1.5)))
    assert abs(out.mean() - np.asarray(clip).mean()) < 1.0
    # blur reduces variance
    assert out.var() < np.asarray(clip).var()


def test_tf_normalize_range(clip):
    out = np.asarray(ops.tf_normalize(clip))
    assert out.min() >= -1.0 and out.max() <= 1.0
    np.testing.assert_allclose(
        out, np.clip(np.asarray(clip) / 255.0 * 2 - 1, -1, 1), atol=1e-6
    )


def test_pretrain_pipeline_shapes_and_range(key):
    b, t = 4, 8
    rng = np.random.default_rng(2)
    f1 = jnp.asarray(rng.integers(0, 255, (b, t, H0, W0, 3)), jnp.uint8)
    f2 = jnp.asarray(rng.integers(0, 255, (b, t, H0, W0, 3)), jnp.uint8)
    rot1 = jnp.asarray(rng.integers(0, 4, (b,)), jnp.int32)
    rot2 = jnp.asarray(rng.integers(0, 4, (b,)), jnp.int32)
    v1, v2, spa = pretrain_augment_batch(key, f1, f2, rot1, rot2, sample_size=32)
    assert v1.shape == (b, t, 32, 32, 3) and v2.shape == (b, t, 32, 32, 3)
    assert spa.shape == (b,)
    assert np.asarray(spa).min() >= 0 and np.asarray(spa).max() <= 4
    assert float(jnp.max(jnp.abs(v1))) <= 1.0
    # different keys give different views
    v1b, _, _ = pretrain_augment_batch(
        jax.random.PRNGKey(99), f1, f2, rot1, rot2, sample_size=32
    )
    assert not np.allclose(np.asarray(v1), np.asarray(v1b))


def test_finetune_and_eval_pipelines(key):
    b, t = 2, 4
    rng = np.random.default_rng(3)
    f = jnp.asarray(rng.integers(0, 255, (b, t, H0, W0, 3)), jnp.uint8)
    out = finetune_train_augment_batch(key, f, sample_size=32)
    assert out.shape == (b, t, 32, 32, 3)
    ev = eval_augment_batch(f, sample_size=32, short_side=36)
    assert ev.shape == (b, t, 32, 32, 3)
    # eval is deterministic
    ev2 = eval_augment_batch(f, sample_size=32, short_side=36)
    np.testing.assert_array_equal(np.asarray(ev), np.asarray(ev2))
