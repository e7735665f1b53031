"""CSTP pretext label/index samplers — pure functions, host (numpy) side.

Semantics mirror the reference sampler ``UcfRepreBYOLSpPre.repre_train_clip``
(reference ``data_process/datasets.py:859-948``) but every rejection loop is
replaced with closed-form sampling over the *valid* set, so the same math can
run bounded on host or inside a jitted program:

* playback-rate label ``pb in [0, min(3, floor(log2(T/(L-1))))]`` selecting a
  frame stride from ``PACE = [1,2,4,8]`` (datasets.py:17,872-874);
* temporal-overlap label ``tem in [0,4]`` shifting the second clip start by
  ``±(1-rate)*clip_range`` with ``OVERLAP_TEM_RATE=[1.,.8,.6,.4,.2]``
  (datasets.py:18,913-925) — the reference's retry loop resamples
  ``(tem, side)`` until in-bounds, whose stationary law is uniform over valid
  ``(tem, side)`` pairs; we sample that law directly;
* two independent rotation labels over ``ROTATE_DEG=[0,90,180,270]``
  (datasets.py:19,878-881);
* short-video wraparound padding (datasets.py:883-911).

Frame indices returned here are 0-based offsets into the video; the reference
uses 1-based JPEG filenames (``'%05d.jpg' % (start_frame + i)`` with
``start_frame >= 1``) — readers add the +1 at the filename layer.

NOTE (fixed reference bug): the reference's LMDB pretext readers fetch clip_2
from ``start_frame`` instead of ``start_frame_2`` (datasets.py:630-641,
1392-1403), silently zeroing the temporal-overlap signal for LMDB data. This
implementation always uses the correct second-clip start.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Tuple

import numpy as np

# Reference constants (data_process/datasets.py:17-19, preprocess_data.py:18)
PACE: Tuple[int, ...] = (1, 2, 4, 8)
OVERLAP_TEM_RATE: Tuple[float, ...] = (1.0, 0.8, 0.6, 0.4, 0.2)
OVERLAP_SPA_RATE: Tuple[float, ...] = (1.0, 0.8, 0.6, 0.4, 0.2)
ROTATE_DEG: Tuple[int, ...] = (0, 90, 180, 270)


def max_playback_label(total_frames: int, sample_duration: int) -> int:
    """Largest valid pb label: floor(log2(T/(L-1))) capped at 3 (datasets.py:872-873)."""
    if total_frames <= 0:
        return 0
    ratio = total_frames / (sample_duration - 1)
    if ratio < 1.0:
        # log2 < 0 -> int() truncates toward 0 in the reference too
        return 0
    return min(3, int(np.log2(ratio)))


def sample_playback_label(
    rng: np.random.Generator, total_frames: int, sample_duration: int
) -> int:
    """pb ~ U{0..min(3, floor(log2(T/(L-1))))} (datasets.py:872-874)."""
    hi = max_playback_label(total_frames, sample_duration)
    return int(rng.integers(0, hi + 1))


def wraparound_frame_indices(
    total_frames: int, sample_duration: int, stride: int
) -> np.ndarray:
    """Short-video padding: walk by ``stride``, wrap to 0 past the end
    (datasets.py:884-890). Returns 0-based frame offsets, shape (L,)."""
    idx = []
    f = 0
    while len(idx) < sample_duration:
        idx.append(f)
        f += stride
        if f >= total_frames:
            f = 0
    return np.asarray(idx, dtype=np.int32)


def strided_frame_indices(start: int, sample_duration: int, stride: int) -> np.ndarray:
    """0-based offsets start, start+stride, ... (L frames) — the in-bounds path
    ``np.arange(0, clip_range+1, sample_rate)`` of datasets.py:927."""
    return (start + np.arange(sample_duration, dtype=np.int32) * stride).astype(np.int32)


def valid_temporal_offsets(
    start: int, total_frames: int, clip_range: int
) -> List[Tuple[int, int, int]]:
    """Enumerate valid (tem_label, side, start_2) given the first-clip start.

    ``side`` 0 = second clip starts earlier ("front"), 1 = later ("behind")
    — datasets.py:917. Valid iff ``1 <= start_2 <= total_frames - clip_range``
    in the reference's 1-based frame space; ``start`` here is 0-based, so the
    bound becomes ``0 <= start_2 <= total_frames - clip_range - 1``.

    tem_label=0 gives offset 0 (both sides coincide and are always valid), so
    the set is never empty.
    """
    out = []
    hi = total_frames - clip_range - 1  # inclusive upper bound, 0-based
    for tem in range(5):
        offset = int((1.0 - OVERLAP_TEM_RATE[tem]) * clip_range)
        for side in (0, 1):
            s2 = start - offset if side == 0 else start + offset
            if 0 <= s2 <= hi:
                out.append((tem, side, s2))
    return out


def sample_temporal_overlap(
    rng: np.random.Generator, start: int, total_frames: int, clip_range: int
) -> Tuple[int, int]:
    """Sample (tem_label, start_2) uniform over valid (tem, side) pairs —
    the stationary distribution of the reference retry loop
    (datasets.py:914-925)."""
    combos = valid_temporal_offsets(start, total_frames, clip_range)
    tem, _side, s2 = combos[int(rng.integers(0, len(combos)))]
    return tem, s2


@dataclass
class ClipPairSample:
    """All host-side pretext decisions for one training sample."""

    indices_1: np.ndarray  # (L,) 0-based frame offsets of clip 1
    indices_2: np.ndarray  # (L,) 0-based frame offsets of clip 2
    pb_label: int
    tem_label: int
    rot_label_1: int
    rot_label_2: int


def sample_clip_pair_host(
    rng: np.random.Generator, total_frames: int, sample_duration: int
) -> ClipPairSample:
    """Full temporal pretext sampling for one video (datasets.py:859-948).

    Spatial-overlap boxes and all photometric augmentation are sampled
    on-device (see cstp_tpu.augment); this function only decides *which
    frames to read*, which must happen on the host.
    """
    pb = sample_playback_label(rng, total_frames, sample_duration)
    stride = PACE[pb]
    clip_range = (sample_duration - 1) * stride
    rot1 = int(rng.integers(0, 4))
    rot2 = int(rng.integers(0, 4))

    if total_frames - clip_range <= 0:
        idx = wraparound_frame_indices(total_frames, sample_duration, stride)
        return ClipPairSample(idx, idx.copy(), pb, 0, rot1, rot2)

    # start ~ U{1..T-clip_range} 1-based (datasets.py:913) == U{0..T-cr-1} 0-based
    start = int(rng.integers(0, total_frames - clip_range))
    tem, start2 = sample_temporal_overlap(rng, start, total_frames, clip_range)
    return ClipPairSample(
        strided_frame_indices(start, sample_duration, stride),
        strided_frame_indices(start2, sample_duration, stride),
        pb,
        tem,
        rot1,
        rot2,
    )
