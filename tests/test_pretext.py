"""Property tests for the CSTP pretext samplers against the reference
semantics (data_process/datasets.py:859-948)."""

import numpy as np
import pytest

from cstp_tpu.pretext import sampling as S


def test_max_playback_label():
    # T=16, L=16: T/(L-1) = 16/15 -> log2 ~ 0.09 -> 0
    assert S.max_playback_label(16, 16) == 0
    # T=30, L=16: 2.0 -> 1
    assert S.max_playback_label(30, 16) == 1
    # T=60: 4.0 -> 2 ; T=120: 8.0 -> 3 ; T=1000: capped at 3
    assert S.max_playback_label(60, 16) == 2
    assert S.max_playback_label(120, 16) == 3
    assert S.max_playback_label(10_000, 16) == 3


def test_playback_label_range(rng):
    for total in (15, 16, 40, 200, 5000):
        hi = S.max_playback_label(total, 16)
        labels = {S.sample_playback_label(rng, total, 16) for _ in range(200)}
        assert labels == set(range(hi + 1))


def test_wraparound_indices_matches_reference_walk():
    # reference walk (datasets.py:884-890): step by stride, reset to 0 at end
    idx = S.wraparound_frame_indices(total_frames=10, sample_duration=16, stride=1)
    assert idx.tolist() == [0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 0, 1, 2, 3, 4, 5]
    idx = S.wraparound_frame_indices(total_frames=7, sample_duration=8, stride=2)
    assert idx.tolist() == [0, 2, 4, 6, 0, 2, 4, 6]
    assert len(S.wraparound_frame_indices(3, 16, 8)) == 16


def test_strided_indices():
    assert S.strided_frame_indices(5, 4, 2).tolist() == [5, 7, 9, 11]


def test_valid_temporal_offsets_always_nonempty():
    # starts must be within the sampleable range [0, total - clip_range - 1]
    for total in (16, 40, 200):
        hi = total - 15 - 1
        for start in (0, hi // 2, hi):
            combos = S.valid_temporal_offsets(start, total, 15)
            assert combos, (total, start)
            # tem=0 must always be present (offset 0)
            assert any(t == 0 for t, _, _ in combos)


def test_temporal_offsets_bounds_and_magnitude():
    total, L, stride = 200, 16, 4
    cr = (L - 1) * stride  # 60
    for start in (0, 30, total - cr - 1):
        for tem, side, s2 in S.valid_temporal_offsets(start, total, cr):
            assert 0 <= s2 <= total - cr - 1
            off = int((1 - S.OVERLAP_TEM_RATE[tem]) * cr)
            assert abs(s2 - start) == off


def test_sample_clip_pair_shapes(rng):
    for total in (5, 16, 31, 120, 400):
        s = S.sample_clip_pair_host(rng, total, 16)
        assert s.indices_1.shape == (16,)
        assert s.indices_2.shape == (16,)
        assert 0 <= s.pb_label <= 3
        assert 0 <= s.tem_label <= 4
        assert 0 <= s.rot_label_1 <= 3 and 0 <= s.rot_label_2 <= 3
        assert s.indices_1.max() < total
        assert s.indices_2.max() < total
        assert s.indices_1.min() >= 0 and s.indices_2.min() >= 0


def test_clip2_uses_its_own_start(rng):
    """Regression guard on the reference LMDB bug (clip_2 read from
    start_frame instead of start_frame_2; datasets.py:630-641)."""
    saw_shift = False
    for _ in range(300):
        s = S.sample_clip_pair_host(rng, 400, 16)
        if s.tem_label > 0:
            assert s.indices_1[0] != s.indices_2[0]
            saw_shift = True
        else:
            stride = S.PACE[s.pb_label]
            cr = 15 * stride
            if 400 - cr > 0:
                assert s.indices_1[0] == s.indices_2[0]
    assert saw_shift


def test_temporal_label_distribution_unbiased(rng):
    """Deep inside a long video every (tem, side) combo is valid, so tem
    should be ~uniform over 5 labels."""
    counts = np.zeros(5)
    total, L = 10_000, 16
    for _ in range(3000):
        s = S.sample_clip_pair_host(rng, total, L)
        counts[s.tem_label] += 1
    freq = counts / counts.sum()
    assert np.all(np.abs(freq - 0.2) < 0.05), freq
