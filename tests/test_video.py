"""Direct mp4 ingest (cstp_tpu/data/video.py — reference decord path)."""

import os

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from cstp_tpu.data.loader import FinetuneLoader, PretrainLoader
from cstp_tpu.data.video import VideoDataset, read_video_frames

H, W = 64, 96
NFRAMES = 40


def _write_video(path, nframes=NFRAMES, fps=30):
    """Each frame's mean gray level encodes its index: idx*5 + 20."""
    for fourcc in ("mp4v", "avc1", "MJPG"):
        wr = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*fourcc), fps, (W, H))
        if wr.isOpened():
            break
    else:
        pytest.skip("no usable video codec in this cv2 build")
    for i in range(nframes):
        frame = np.full((H, W, 3), i * 5 + 20, np.uint8)
        wr.write(frame)
    wr.release()
    assert os.path.getsize(path) > 0


@pytest.fixture(scope="module")
def video_tree(tmp_path_factory):
    root = tmp_path_factory.mktemp("videos")
    (root / "cls_a").mkdir()
    (root / "cls_b").mkdir()
    _write_video(str(root / "cls_a" / "v0.mp4"))
    _write_video(str(root / "cls_b" / "v1.mp4"), nframes=25)
    ann = tmp_path_factory.mktemp("ann")
    # kinetics double-space list, nframes for v0, probe for v1 (-1 absent)
    (ann / "train_list_label_nframe.txt").write_text(
        f"cls_a/v0.mp4  0  {NFRAMES}\ncls_b/v1.mp4  1  25\n"
    )
    (ann / "val_list_label_nframe.txt").write_text(
        f"cls_a/v0.mp4  0  {NFRAMES}\n"
    )
    return str(root), str(ann)


def test_read_video_frames_indices_and_values(video_tree):
    root, _ = video_tree
    path = os.path.join(root, "cls_a", "v0.mp4")
    idx = [3, 0, 10, 10, 31]
    frames = read_video_frames(path, idx, hw=(48, 64))
    assert frames.shape == (5, 48, 64, 3)
    assert frames.dtype == np.uint8
    # lossy codec: frame identity via mean gray level, +-3
    for row, i in zip(frames, idx):
        assert abs(float(row.mean()) - (i * 5 + 20)) < 3.0, (i, row.mean())
    # duplicate indices give identical rows
    np.testing.assert_array_equal(frames[2], frames[3])


def test_video_dataset_protocol_and_probe(video_tree):
    root, ann = video_tree
    ds = VideoDataset(root, ann, dataset="Kin400", data_type="train")
    assert ds.num_videos() == 2
    assert ds.video_meta(0) == (NFRAMES, 0)
    assert ds.video_meta(1) == (25, 1)
    f = ds.read_frames(0, [0, 5])
    assert f.shape == (2, 128, 171, 3)


def test_video_dataset_nframes_probe(video_tree, tmp_path):
    """nframes = -1 rows are probed from the container."""
    root, _ = video_tree
    ann = tmp_path
    (ann / "train_list_label_nframe.txt").write_text("cls_b/v1.mp4  1  -1\n")
    ds = VideoDataset(root, str(ann), dataset="Kin400")
    nf, label = ds.video_meta(0)
    assert label == 1 and nf == 25


def test_video_dataset_feeds_loaders(video_tree):
    root, ann = video_tree
    ds = VideoDataset(root, ann, dataset="Kin400", data_type="train")
    pl = PretrainLoader(ds, batch_size=2, sample_duration=4, num_workers=2)
    batch = next(iter(pl.epoch(0)))
    assert batch["frames1"].shape == (2, 4, 128, 171, 3)
    assert batch["frames2"].shape == (2, 4, 128, 171, 3)
    fl = FinetuneLoader(ds, batch_size=2, sample_duration=4, pb_rate=2,
                        train=False, drop_last=False)
    fb = next(iter(fl.epoch(0)))
    assert fb["frames"].shape == (2, 4, 128, 171, 3)
    assert set(fb["labels"].tolist()) <= {0, 1}
