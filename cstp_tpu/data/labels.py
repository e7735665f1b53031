"""Annotation/label-file parsing.

Formats (reference ``data_process/*_labels/``, SURVEY §2.3):
* UCF-101 / HMDB-51: ``relpath label [nframes]`` single-space separated
  (``trainlist0{split}_nframe.txt`` / ``testlist0{split}_nframe.txt``,
  consumed at datasets.py:832-838);
* Kinetics: ``path  label  nframes`` double-space separated
  (``kin400_mmlab_labels/*_list_label_nframe.txt``, datasets.py:1280-1289).
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from typing import List, Optional


@dataclass
class VideoRecord:
    path: str       # relative path, extension stripped like the reference
    label: int
    nframes: int


def parse_ucf_list(list_path: str, frame_dir: Optional[str] = None,
                   check_exists: bool = False) -> List[VideoRecord]:
    """UCF/HMDB ``relpath label nframes``; strips the media extension the way
    the reference does (``line_split[0].split('.')[0]``, datasets.py:835)."""
    out = []
    with open(list_path) as f:
        for line in f:
            parts = line.strip().split(" ")
            if len(parts) < 2:
                continue
            rel = parts[0].split(".")[0]
            label = int(parts[1])
            nframes = int(parts[2]) if len(parts) > 2 else -1
            if check_exists and frame_dir is not None:
                if not os.path.exists(os.path.join(frame_dir, rel)):
                    continue
            out.append(VideoRecord(rel, label, nframes))
    return out


def parse_kinetics_list(list_path: str) -> List[VideoRecord]:
    """Kinetics ``path  label  nframes`` (double-space; datasets.py:1283-1289)."""
    out = []
    with open(list_path) as f:
        for line in f:
            parts = line.strip().split("  ")
            if len(parts) < 3:
                continue
            out.append(VideoRecord(parts[0].split(".")[0], int(parts[1]),
                                   int(parts[2])))
    return out


def train_list_name(split: str) -> str:
    return f"trainlist0{split}_nframe.txt"


def test_list_name(split: str) -> str:
    return f"testlist0{split}_nframe.txt"
