"""Host input-pipeline throughput: can the loader feed the chip?

Builds a synthetic CSTPack shard in /tmp (JPEG and RAW codecs), then measures
PretrainLoader clips/s with the native C++ reader — the number to compare
against the device step rate (bench.py). Run: python perf/bench_loader.py
"""

import io
import os
import tempfile
import time

import numpy as np


def build_shard(path, codec, n_videos=48, n_frames=48, hw=(128, 171)):
    from PIL import Image

    from cstp_tpu.data.packed import PackedWriter

    rng = np.random.default_rng(0)
    w = PackedWriter(path)
    for i in range(n_videos):
        frames = rng.integers(0, 255, (n_frames, hw[0], hw[1], 3)).astype(
            np.uint8)
        if codec == "raw":
            w.add_video_raw(f"v{i}", i % 5, frames)
        else:
            blobs = []
            for f in frames:
                buf = io.BytesIO()
                Image.fromarray(f).save(buf, format="JPEG", quality=87)
                blobs.append(buf.getvalue())
            w.add_video(f"v{i}", i % 5, blobs)
    w.close()


def bench(codec, echo=1, batch=16, duration=16, workers=4):
    from cstp_tpu.data.loader import PretrainLoader
    from cstp_tpu.train.loops import build_dataset
    from cstp_tpu.config import Config

    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, f"{codec}.cstpack")
        build_shard(path, codec)
        cfg = Config(data_backend="packed", lmdb_path=path,
                     n_workers=workers).finalize()
        ds = build_dataset(cfg, "train")
        loader = PretrainLoader(ds, batch, duration, num_workers=workers,
                                echo=echo)
        # warm one epoch, then time
        for _ in loader.epoch(0):
            pass
        n = 0
        t0 = time.perf_counter()
        for b in loader.epoch(1):
            n += b["frames1"].shape[0]
        dt = time.perf_counter() - t0
        kind = type(ds).__name__
        print(f"{codec:5s} echo={echo}  {n / dt:8.1f} clips/s host "
              f"({kind}, {workers} workers)", flush=True)
        return n / dt


if __name__ == "__main__":
    bench("jpeg")
    bench("raw")
    bench("raw", echo=4)
