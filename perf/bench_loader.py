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


def build_reference_lmdb(d, n_videos=48, n_frames=48, hw=(128, 171)):
    """Reference Kinetics layout: msgpack'd JPEG lists + __order__ map."""
    import io

    import msgpack
    from PIL import Image

    from cstp_tpu.data.lmdb_store import write_lmdb

    rng = np.random.default_rng(0)
    items, order, vlens = {}, {}, []
    names = [f"cls/v{i}" for i in range(n_videos)]  # __order__ keys carry
    # no media extension; the list files do (parse strips it)
    for i, name in enumerate(names):
        raws = []
        for _ in range(n_frames):
            buf = io.BytesIO()
            Image.fromarray(rng.integers(0, 255, (hw[0], hw[1], 3)).astype(
                np.uint8)).save(buf, format="JPEG", quality=87)
            raws.append(buf.getvalue())
        items[b"%09d" % i] = msgpack.dumps(raws)
        order[name] = i
        vlens.append(n_frames)
    items[b"__keys__"] = msgpack.dumps([b"%09d" % i for i in range(n_videos)])
    items[b"__len__"] = msgpack.dumps(n_videos)
    items[b"__order__"] = msgpack.dumps(order)
    items[b"__vlen__"] = msgpack.dumps(vlens)
    shard = os.path.join(d, "ref.lmdb")
    write_lmdb(shard, items)
    ann = os.path.join(d, "train_list_label_nframe.txt")
    with open(ann, "w") as f:
        for i, name in enumerate(names):
            f.write(f"{name}.mp4  {i % 5}  {n_frames}\n")
    return shard, d  # annotation_path is the labels DIRECTORY


def bench_lmdb(native=True, batch=16, duration=16, workers=4):
    """Reference-LMDB ingest: native libjpeg pool vs PIL decode."""
    from cstp_tpu.config import Config
    from cstp_tpu.data.loader import PretrainLoader
    from cstp_tpu.train.loops import build_dataset

    with tempfile.TemporaryDirectory() as d:
        shard, ann = build_reference_lmdb(d)
        cfg = Config(data_backend="lmdb", lmdb_path=shard,
                     annotation_path=ann, dataset="Kin400",
                     n_workers=workers).finalize()
        ds = build_dataset(cfg, "train")
        if not native:
            import cstp_tpu.data.native_reader as NR

            orig = NR.decode_jpeg_blobs
            NR.decode_jpeg_blobs = lambda *a, **k: None
        try:
            loader = PretrainLoader(ds, batch, duration, num_workers=workers)
            for _ in loader.epoch(0):
                pass
            n = 0
            t0 = time.perf_counter()
            for b in loader.epoch(1):
                n += b["frames1"].shape[0]
            dt = time.perf_counter() - t0
        finally:
            if not native:
                NR.decode_jpeg_blobs = orig
        label = "lmdb+native" if native else "lmdb+PIL"
        print(f"{label:12s} {n / dt:8.1f} clips/s host ({workers} workers)",
              flush=True)
        return n / dt


if __name__ == "__main__":
    bench("jpeg")
    bench("raw")
    bench("raw", echo=4)
    bench_lmdb(native=True)
    bench_lmdb(native=False)
