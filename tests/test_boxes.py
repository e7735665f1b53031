"""Tests for the jittable spatial-overlap crop-box sampler
(reference ClipRandomSizedCropOverlap, preprocess_data.py:479-565).

Samplers are exercised through one jitted vmap call — both a speed measure
and a guarantee that the code paths used in training (traced, batched) are
the ones under test.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cstp_tpu.pretext import boxes as B
from cstp_tpu.pretext.sampling import OVERLAP_SPA_RATE

W, H = 171.0, 128.0
N = 256


@pytest.fixture(scope="module")
def sampled():
    """(box1, box2, spa) for N independent keys, via one jitted vmap."""

    @jax.jit
    def run(keys):
        def one(k):
            k1, k2 = jax.random.split(k)
            b1 = B.sample_first_crop_box(k1, jnp.asarray(W), jnp.asarray(H))
            b2, spa = B.sample_second_crop_box(k2, b1, jnp.asarray(W), jnp.asarray(H))
            return b1, b2, spa

        return jax.vmap(one)(keys)

    keys = jax.random.split(jax.random.PRNGKey(0), N)
    b1, b2, spa = run(keys)
    return np.asarray(b1), np.asarray(b2), np.asarray(spa)


def test_first_crop_box_in_bounds(sampled):
    b1, _, _ = sampled
    x, y, w, h = b1.T
    assert (x >= 0).all() and (y >= 0).all()
    assert (x + w <= W + 1e-4).all() and (y + h <= H + 1e-4).all()
    area_frac = (w * h) / (W * H)
    assert (area_frac >= 0.15).all() and (area_frac <= 1.01).all()
    ar = w / h
    assert (ar >= 0.7).all() and (ar <= 1.43).all()


def test_second_crop_box_same_size_and_overlap(sampled):
    """Overlap area between box1 and box2 must be ~OVERLAP_SPA_RATE[spa] of
    box1's area (the defining property of the pretext task)."""
    b1, b2, spa = sampled
    assert (b2[:, 2] == b1[:, 2]).all() and (b2[:, 3] == b1[:, 3]).all()
    ix = np.maximum(
        0.0,
        np.minimum(b1[:, 0] + b1[:, 2], b2[:, 0] + b2[:, 2])
        - np.maximum(b1[:, 0], b2[:, 0]),
    )
    iy = np.maximum(
        0.0,
        np.minimum(b1[:, 1] + b1[:, 3], b2[:, 1] + b2[:, 3])
        - np.maximum(b1[:, 1], b2[:, 1]),
    )
    got = (ix * iy) / (b1[:, 2] * b1[:, 3])
    want = np.asarray(OVERLAP_SPA_RATE)[spa]
    # s_w is random within [rate*p_w, p_w] and s_h = rate*area/s_w with
    # int() floors -> realized overlap tracks the label to a few %
    assert np.abs(got - want).max() < 0.08

    # box2 stays in-bounds up to the reference's own slack: s_h =
    # int(rate*p_w*p_h/s_w) can exceed p_h by a few px when
    # int(rate*p_w) < rate*p_w, and corners 0/1 only check the top edge
    # (preprocess_data.py:530-546) — PIL pads such crops with black, as does
    # our masked resampler.
    assert (b2[:, 0] >= -4).all() and (b2[:, 1] >= -4).all()
    assert (b2[:, 0] + b2[:, 2] <= W + 4).all()
    assert (b2[:, 1] + b2[:, 3] <= H + 4).all()


def test_second_crop_spa0_is_full_overlap(sampled):
    b1, b2, spa = sampled
    mask = spa == 0
    assert mask.any()
    np.testing.assert_allclose(b1[mask], b2[mask], atol=1.0)


def test_spa_label_covers_all_classes(sampled):
    _, _, spa = sampled
    assert set(np.unique(spa)) == {0, 1, 2, 3, 4}


def test_rot90_box_roundtrip():
    """Cropping the rotated image == rotating the mapped-box crop."""
    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, (16, 24, 1)).astype(np.float32)  # H0=16, W0=24
    h0, w0 = img.shape[:2]
    for k in range(4):
        rot = np.rot90(img, k, axes=(0, 1))
        hr, wr = rot.shape[:2]
        a, b, w, h = 3.0, 2.0, 7.0, 5.0  # box in rotated coords
        assert a + w <= wr and b + h <= hr
        want = rot[int(b):int(b + h), int(a):int(a + w)]
        box = B.rot90_box_to_original(
            jnp.asarray([a, b, w, h]), jnp.asarray(k), float(w0), float(h0)
        )
        x0, y0, ww, hh = [int(v) for v in np.asarray(box)]
        crop = img[y0:y0 + hh, x0:x0 + ww]
        got = np.rot90(crop, k, axes=(0, 1))
        np.testing.assert_array_equal(got, want)


def test_rotated_dims():
    w, h = B.rotated_dims(jnp.asarray(1), 171.0, 128.0)
    assert float(w) == 128.0 and float(h) == 171.0
    w, h = B.rotated_dims(jnp.asarray(2), 171.0, 128.0)
    assert float(w) == 171.0 and float(h) == 128.0


def test_sample_pair_boxes_jits(key):
    f = jax.jit(lambda k, r1, r2: B.sample_pair_boxes(k, r1, r2, W, H))
    box1, box2, spa = f(key, jnp.asarray(0), jnp.asarray(2))
    assert box1.shape == (4,) and box2.shape == (4,)
    assert 0 <= int(spa) <= 4
