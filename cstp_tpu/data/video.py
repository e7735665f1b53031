"""Direct video-file (mp4) ingest — the reference's decord path rebuilt.

The reference reads Kinetics mp4s with ``decord.VideoReader.get_batch``
(``data_process/datasets.py:1702-1717`` KINFTOnlineDecord, ``:1825-``
KINFTOnline via PIL-per-frame). decord is a GPU-adjacent C++ decoder; the
TPU-native equivalent keeps decode on the host CPU feeding the device
augmentation pipeline: OpenCV (ffmpeg-backed) ``VideoCapture`` with a
seek + sequential-grab batch fetch, resized to the fixed ingest resolution.

Exposes the standard dataset protocol (``num_videos`` / ``video_meta`` /
``read_frames``) so :class:`~cstp_tpu.data.loader.PretrainLoader` and
``FinetuneLoader`` work unchanged. Decode is per-call-open (cv2 captures are
not thread-safe to share), which the loaders' thread pools parallelize.

For production pretraining prefer offline extraction + CSTPack shards
(``python -m cstp_tpu.data.extract_frames`` + ``python -m cstp_tpu.data.pack``,
PERF.md "host input pipeline"); this reader is the parity path for users who
point the CLI straight at a directory of videos.
"""

from __future__ import annotations

import os
from typing import List, Sequence, Tuple

import numpy as np

from cstp_tpu.data.labels import (
    VideoRecord,
    kinetics_list_path,
    parse_kinetics_list,
    parse_ucf_list,
    ucf_list_path,
)

try:
    import cv2

    _HAVE_CV2 = True
except Exception:  # pragma: no cover
    _HAVE_CV2 = False

_EXTS = (".mp4", ".avi", ".mkv", ".webm", ".mov")


def have_video_backend() -> bool:
    return _HAVE_CV2


def _resolve_media(root: str, rel: str) -> str:
    """Label lists strip extensions (labels.py); find the media file."""
    p = os.path.join(root, rel)
    for cand in (p,) + tuple(p + e for e in _EXTS):
        if os.path.isfile(cand):
            return cand
    return p + ".mp4"  # reference assumption (datasets.py:1712 '.mp4' join)


def probe_nframes(path: str) -> int:
    cap = cv2.VideoCapture(path)
    try:
        return int(cap.get(cv2.CAP_PROP_FRAME_COUNT))
    finally:
        cap.release()


def read_video_frames(path: str, indices: Sequence[int],
                      hw: Tuple[int, int]) -> np.ndarray:
    """decord ``get_batch`` equivalent: fetch ``indices`` (0-based, any
    order/dups) as uint8 RGB (L, H, W, 3) resized to ``hw``.

    One seek to min(indices), then sequential ``grab()`` — mp4 seeks are
    keyframe-quantized, and CSTP clip spans are short (<=121 frames at
    pb_rate 8), so sequential decode beats per-frame seeking.
    """
    h, w = hw
    idx = [int(i) for i in indices]
    wanted = sorted(set(idx))
    out: dict = {}
    cap = cv2.VideoCapture(path)
    try:
        if not cap.isOpened():
            raise IOError(f"cannot open video {path!r}")
        lo = wanted[0]
        if lo > 0:
            cap.set(cv2.CAP_PROP_POS_FRAMES, lo)
            # some backends land before the target; verify and fall back
            if int(cap.get(cv2.CAP_PROP_POS_FRAMES)) != lo:
                cap.set(cv2.CAP_PROP_POS_FRAMES, 0)
                lo = 0
        pos = lo
        last = None
        for target in wanted:
            frame = None
            while pos <= target:
                ok = cap.grab()
                if not ok:
                    break
                pos += 1
                if pos - 1 == target:
                    ok, frame = cap.retrieve()
                    if not ok:
                        frame = None
            if frame is None:
                if last is None:
                    raise IOError(f"decode failed at frame {target} of {path!r}")
                out[target] = last  # tail-truncated container: repeat last
                continue
            frame = cv2.resize(frame, (w, h), interpolation=cv2.INTER_LINEAR)
            rgb = np.ascontiguousarray(frame[:, :, ::-1])  # BGR -> RGB
            out[target] = rgb
            last = rgb
    finally:
        cap.release()
    return np.stack([out[i] for i in idx])


class VideoDataset:
    """mp4/avi dataset over a UCF- or Kinetics-style annotation list
    (reference KINFTOnlineDecord, datasets.py:1702-1717).

    Missing ``nframes`` columns are probed from the container on first use
    (the reference requires precomputed ``*_nframe`` lists; probing removes
    that offline dependency for small runs).
    """

    def __init__(self, video_root: str, annotation_path: str,
                 dataset: str = "Kin400", data_type: str = "train",
                 split: str = "1", ingest_hw: Tuple[int, int] = (128, 171)):
        if not _HAVE_CV2:
            raise RuntimeError(
                "opencv (cv2) is required for direct video ingest; extract "
                "frames offline instead (python -m cstp_tpu.data.extract_frames)"
            )
        self.root = video_root
        self.h0, self.w0 = ingest_hw
        if dataset.lower().startswith("kin"):
            list_path = kinetics_list_path(annotation_path, data_type)
            self.records: List[VideoRecord] = parse_kinetics_list(list_path)
        else:
            list_path = ucf_list_path(annotation_path, data_type, split)
            self.records = parse_ucf_list(list_path)
        if not self.records:
            raise FileNotFoundError(f"no videos in {list_path}")
        self._paths = [_resolve_media(self.root, r.path) for r in self.records]

    def num_videos(self) -> int:
        return len(self.records)

    def video_meta(self, i: int) -> Tuple[int, int]:
        r = self.records[i]
        if r.nframes <= 0:
            r.nframes = probe_nframes(self._paths[i])
        return r.nframes, r.label

    def read_frames(self, i: int, indices: Sequence[int]) -> np.ndarray:
        return read_video_frames(self._paths[i], indices, (self.h0, self.w0))
