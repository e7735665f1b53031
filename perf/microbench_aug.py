"""Micro-benchmark of each augmentation stage on the real chip.

Times each op in isolation at bench shapes (B=32, T=16, 128x171 -> 112^2)
to locate the augment pipeline's hot spots. Run: python perf/microbench_aug.py
"""

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np

from cstp_tpu.augment import ops, pipeline
from cstp_tpu.pretext.boxes import sample_pair_boxes

B, T, H0, W0, S = 32, 16, 128, 171, 112


def bench(name, fn, *args, n=20):
    f = jax.jit(fn)
    o = f(*args)
    jax.block_until_ready(o)
    t0 = time.perf_counter()
    for _ in range(n):
        o = f(*args)
    jax.block_until_ready(o)
    dt = (time.perf_counter() - t0) / n
    print(f"{name:28s} {dt*1e3:8.2f} ms")
    return dt


def main():
    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(0)
    frames = jnp.asarray(rng.integers(0, 255, (B, T, H0, W0, 3)), jnp.uint8)
    clips = jnp.asarray(rng.uniform(0, 255, (B, T, S, S, 3)), jnp.float32)
    rot = jnp.asarray(rng.integers(0, 4, (B,)), jnp.int32)
    keys = jax.random.split(key, B)
    angles = jnp.asarray(rng.uniform(-10, 10, (B,)), jnp.float32)
    factors = jnp.asarray(rng.uniform(0.8, 1.2, (B, 4)), jnp.float32)
    sigmas = jnp.asarray(rng.uniform(0.1, 2.0, (B,)), jnp.float32)
    chans = jnp.asarray(rng.integers(0, 3, (B, T)), jnp.int32)

    def crop(f, k, r):
        box1, box2, spa = sample_pair_boxes(k, r, r, float(W0), float(H0))
        return ops.crop_resize_clip(f.astype(jnp.float32), box1, S)

    bench("full pipeline", functools.partial(
        pipeline.pretrain_augment_batch, sample_size=S),
        key, frames, frames, rot, rot)
    bench("crop_resize", jax.vmap(crop), frames, keys, rot)
    bench("rot90", jax.vmap(ops.rot90_clip), clips, rot)
    bench("rotate_small", jax.vmap(ops.rotate_small_clip), clips, angles)
    bench("color_jitter", jax.vmap(ops.color_jitter_clip), clips, factors)
    bench("hue only", jax.vmap(ops.adjust_hue), clips, factors[:, 3] * 0.1)
    bench("gray", jax.vmap(ops.random_gray_clip), clips, chans)
    bench("blur", jax.vmap(ops.gaussian_blur_clip), clips, sigmas)
    bench("hflip+norm", jax.vmap(lambda c: ops.tf_normalize(ops.hflip_clip(c))),
          clips)


if __name__ == "__main__":
    main()
