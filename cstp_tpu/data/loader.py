"""Host-side clip loaders + device prefetch.

Replaces the reference's torch DataLoader worker processes + CUDA-stream
prefetcher (``main_ft_mp.py:313-352``) with:

* per-epoch deterministic shuffling seeded by epoch (DistributedSampler
  ``set_epoch`` semantics, utils.py:94-118), sharded per host for multi-host;
* a thread pool for JPEG decode (PIL releases the GIL);
* a double-buffered background prefetcher that lands batches on the device
  mesh (sharded over 'data') while the previous step computes.

Loaders emit raw uint8 frames + host-side pretext labels; ALL augmentation
runs on-device inside the train step (SURVEY §3 hot-loop item (2)).
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Dict, Iterator, Optional

import jax
import numpy as np

from cstp_tpu.parallel import shard_batch
from cstp_tpu.pretext.sampling import (
    PACE,
    sample_clip_pair_host,
    strided_frame_indices,
    wraparound_frame_indices,
)


def _epoch_permutation(n: int, epoch: int, seed: int, shuffle: bool) -> np.ndarray:
    if not shuffle:
        return np.arange(n)
    rng = np.random.default_rng(seed * 1_000_003 + epoch)
    return rng.permutation(n)


class PretrainLoader:
    """Yields pretrain batches: two raw clips + temporal pretext labels.

    ``echo > 1`` enables data echoing (Choi et al., arXiv:1907.05550 — see
    PAPERS.md): each host-loaded batch is yielded ``echo`` times. Because ALL
    augmentation (overlap crop -> spa label, jitter/gray/blur/flip) runs
    on-device from the per-step RNG key, every echo trains on a genuinely
    different view pair — host decode bandwidth drops by the echo factor
    while augmentation diversity is preserved (the temporal/pb/rot draws are
    shared within an echo group).
    """

    def __init__(self, dataset, batch_size: int, sample_duration: int,
                 seed: int = 1, num_workers: int = 4, drop_last: bool = True,
                 process_index: int = 0, process_count: int = 1,
                 echo: int = 1):
        self.ds = dataset
        self.batch_size = batch_size
        self.sample_duration = sample_duration
        self.seed = seed
        self.num_workers = max(1, num_workers)
        self.drop_last = drop_last
        self.process_index = process_index
        self.process_count = process_count
        self.echo = max(1, echo)

    def __len__(self):
        n = self.ds.num_videos() // self.process_count
        batches = (n // self.batch_size if self.drop_last
                   else -(-n // self.batch_size))
        return batches * self.echo

    def _load_one(self, vid: int, rng: np.random.Generator):
        nframes, _ = self.ds.video_meta(vid)
        s = sample_clip_pair_host(rng, nframes, self.sample_duration)
        f1 = self.ds.read_frames(vid, s.indices_1)
        f2 = self.ds.read_frames(vid, s.indices_2)
        return f1, f2, s

    def _sample_batch(self, ids, epoch: int):
        return [
            sample_clip_pair_host(
                np.random.default_rng((self.seed, epoch, int(v))),
                self.ds.video_meta(int(v))[0],
                self.sample_duration,
            )
            for v in ids
        ]

    def epoch(self, epoch: int) -> Iterator[Dict[str, np.ndarray]]:
        perm = _epoch_permutation(self.ds.num_videos(), epoch, self.seed, True)
        perm = perm[self.process_index :: self.process_count]
        bs = self.batch_size
        batched = hasattr(self.ds, "read_clips")  # native reader fast path
        with ThreadPoolExecutor(self.num_workers) as pool:
            for start in range(0, len(perm) - (bs - 1 if self.drop_last else 0), bs):
                ids = perm[start : start + bs]
                if batched:
                    samples = self._sample_batch(ids, epoch)
                    vids = np.asarray(list(ids) * 2, np.int32)
                    idx = np.stack(
                        [s.indices_1 for s in samples]
                        + [s.indices_2 for s in samples]
                    )
                    frames = self.ds.read_clips(vids, idx)
                    f1, f2 = frames[: len(ids)], frames[len(ids) :]
                else:
                    rngs = [
                        np.random.default_rng((self.seed, epoch, int(v)))
                        for v in ids
                    ]
                    results = list(pool.map(self._load_one, ids, rngs))
                    f1 = np.stack([r[0] for r in results])
                    f2 = np.stack([r[1] for r in results])
                    samples = [r[2] for r in results]
                batch = {
                    "frames1": f1,
                    "frames2": f2,
                    "rot1": np.asarray([s.rot_label_1 for s in samples], np.int32),
                    "rot2": np.asarray([s.rot_label_2 for s in samples], np.int32),
                    "tem": np.asarray([s.tem_label for s in samples], np.int32),
                    "pb": np.asarray([s.pb_label for s in samples], np.int32),
                }
                for _ in range(self.echo):
                    yield batch


class FinetuneLoader:
    """Single-clip loader for finetune/val (reference UcfFineTune semantics,
    datasets.py:1003-1060): train clips at fixed ``pb_rate`` stride from a
    random start; val clips likewise (deterministic start here — fixing the
    reference's nondeterministic validation, datasets.py:1047)."""

    def __init__(self, dataset, batch_size: int, sample_duration: int,
                 pb_rate: int = 4, train: bool = True, seed: int = 1,
                 num_workers: int = 4, drop_last: Optional[bool] = None,
                 process_index: int = 0, process_count: int = 1):
        self.ds = dataset
        self.batch_size = batch_size
        self.sample_duration = sample_duration
        self.pb_rate = pb_rate
        self.train = train
        self.seed = seed
        self.num_workers = max(1, num_workers)
        self.drop_last = train if drop_last is None else drop_last
        self.process_index = process_index
        self.process_count = process_count

    def __len__(self):
        if self.drop_last:
            return (self.ds.num_videos() // self.process_count
                    ) // self.batch_size
        # non-drop_last: every host iterates the LARGEST shard's batch
        # count (see epoch()), so the length is host-independent
        max_shard = -(-self.ds.num_videos() // self.process_count)
        return -(-max_shard // self.batch_size)

    def _clip_indices(self, nframes: int, rng: Optional[np.random.Generator]):
        cr = (self.sample_duration - 1) * self.pb_rate
        if nframes - cr <= 0:
            return wraparound_frame_indices(nframes, self.sample_duration,
                                            self.pb_rate)
        if rng is None:  # deterministic center clip for validation
            start = (nframes - cr - 1) // 2
        else:
            start = int(rng.integers(0, nframes - cr))
        return strided_frame_indices(start, self.sample_duration, self.pb_rate)

    def _load_one(self, vid: int, epoch: int):
        nframes, label = self.ds.video_meta(vid)
        rng = (
            np.random.default_rng((self.seed, epoch, int(vid)))
            if self.train
            else None
        )
        idx = self._clip_indices(nframes, rng)
        return self.ds.read_frames(vid, idx), label

    def epoch(self, epoch: int) -> Iterator[Dict[str, np.ndarray]]:
        perm = _epoch_permutation(self.ds.num_videos(), epoch, self.seed,
                                  self.train)
        perm = perm[self.process_index :: self.process_count]
        bs = self.batch_size
        batched = hasattr(self.ds, "read_clips")  # native reader fast path
        if self.drop_last:
            stop = max(len(perm) - (bs - 1), 0)
        else:
            # every host must execute the SAME number of jitted eval steps:
            # the eval step is a global-mesh program, so a host whose shard
            # has one fewer tail batch would leave the others deadlocked in
            # a collective. Iterate to the LARGEST shard's batch count;
            # hosts past their own videos emit fully-masked pad batches.
            max_shard = -(-self.ds.num_videos() // self.process_count)
            stop = -(-max_shard // bs) * bs if max_shard else 0
        with ThreadPoolExecutor(self.num_workers) as pool:
            prev_frames = None
            for start in range(0, stop, bs):
                ids = perm[start : start + bs]
                if len(ids) == 0:
                    # shard exhausted (shorter than the widest host's):
                    # emit an all-padding batch so step counts line up
                    if prev_frames is None:
                        f0, _ = self._load_one(int(perm[0]) if len(perm)
                                               else 0, epoch)
                        prev_frames = f0[None]
                    frames = np.repeat(prev_frames[-1:], bs, axis=0)
                    labels = np.zeros((bs,), np.int32)
                    yield {"frames": frames, "labels": labels,
                           "mask": np.zeros((bs,), np.float32)}
                    continue
                if batched:
                    metas = [self.ds.video_meta(int(v)) for v in ids]
                    idx = np.stack([
                        self._clip_indices(
                            nf,
                            np.random.default_rng((self.seed, epoch, int(v)))
                            if self.train else None,
                        )
                        for (nf, _), v in zip(metas, ids)
                    ])
                    frames = self.ds.read_clips(np.asarray(ids, np.int32), idx)
                    labels = np.asarray([m[1] for m in metas], np.int32)
                else:
                    results = list(
                        pool.map(self._load_one, ids, [epoch] * len(ids))
                    )
                    frames = np.stack([r[0] for r in results])
                    labels = np.asarray([r[1] for r in results], np.int32)
                mask = np.ones((len(ids),), np.float32)
                if len(ids) < bs:
                    # pad-and-mask the tail batch so EVERY video is evaluated
                    # (the reference evaluates the full val set,
                    # main_ft_mp.py:247-292) while the jitted eval step keeps
                    # a single static batch shape; padded rows carry mask 0
                    # and contribute nothing to the masked metrics.
                    pad = bs - len(ids)
                    frames = np.concatenate(
                        [frames, np.repeat(frames[-1:], pad, axis=0)])
                    labels = np.concatenate(
                        [labels, np.repeat(labels[-1:], pad)])
                    mask = np.concatenate([mask, np.zeros((pad,), np.float32)])
                prev_frames = frames
                yield {"frames": frames, "labels": labels, "mask": mask}


def prefetch_to_device(iterator, mesh, depth: int = 2):
    """Background-thread prefetcher: host batches -> mesh-sharded device
    arrays, ``depth`` batches ahead (the jax.device_put analog of the
    reference CUDA-stream data_prefetcher, main_ft_mp.py:313-352)."""
    q: "queue.Queue" = queue.Queue(maxsize=depth)
    sentinel = object()
    err = []

    def worker():
        try:
            last_host = last_dev = None
            for batch in iterator:
                if batch is last_host:
                    # data echoing (PretrainLoader ``echo``): the loader
                    # yields the SAME batch object echo times — reuse the
                    # already-landed device arrays so echoing cuts host->
                    # device transfer (not just host decode) by the echo
                    # factor; on-device augmentation still draws fresh views
                    # from the per-step RNG key.
                    q.put(last_dev)
                    continue
                last_host, last_dev = batch, shard_batch(mesh, batch)
                q.put(last_dev)
        except Exception as e:  # surface loader errors on the main thread
            err.append(e)
        finally:
            q.put(sentinel)

    t = threading.Thread(target=worker, daemon=True)
    t.start()
    while True:
        item = q.get()
        if item is sentinel:
            if err:
                raise err[0]
            return
        yield item
