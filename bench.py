"""Pretrain throughput benchmark on real hardware.

Measures the FULL fused pretrain step — on-device CSTP augmentation
(overlap crop + rot90 + jitter/gray/blur/flip + normalize) + BYOL towers +
pretext heads + clipped SGD — at the reference's headline config:
R(2+1)D (layer_sizes 1,1,1,1), 16 frames x 112^2, bf16 compute.

Prints ONE JSON line:
  {"metric": "pretrain_clips_per_sec_per_chip", "value": N,
   "unit": "clips/s/chip", "vs_baseline": N/2000}

"clips" counts dataset samples (clip PAIRS — each sample pushes 2 clips
through 3 towers), matching the reference's per-sample batch accounting.
"""

import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    # persistent compile cache: the fused step takes minutes to compile via
    # the remote-compile tunnel; cache so repeated bench runs pay once.
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from cstp_tpu.config import Config
    from cstp_tpu.parallel import create_mesh, replicate, shard_batch
    from cstp_tpu.train.pretrain import create_pretrain_state, make_pretrain_step

    n_dev = len(jax.devices())
    per_chip_bs = 32
    cfg = Config(
        model_name="r21d",
        model_depth=1,
        sample_duration=16,
        sample_size=112,
        batch_size=per_chip_bs * n_dev,
        compute_dtype="bfloat16",
        mesh_shape=(n_dev, 1),
    ).finalize()

    mesh = create_mesh(cfg.mesh_shape, cfg.mesh_axes)
    model, state, tx = create_pretrain_state(cfg, jax.random.PRNGKey(0))
    state = replicate(mesh, state)
    step = make_pretrain_step(model, tx, cfg)

    rng = np.random.default_rng(0)
    b, t, h0, w0 = cfg.batch_size, cfg.sample_duration, 128, 171
    batch = shard_batch(mesh, {
        "frames1": rng.integers(0, 255, (b, t, h0, w0, 3)).astype(np.uint8),
        "frames2": rng.integers(0, 255, (b, t, h0, w0, 3)).astype(np.uint8),
        "rot1": rng.integers(0, 4, (b,)).astype(np.int32),
        "rot2": rng.integers(0, 4, (b,)).astype(np.int32),
        "tem": rng.integers(0, 5, (b,)).astype(np.int32),
        "pb": rng.integers(0, 4, (b,)).astype(np.int32),
    })
    lr = jnp.asarray(0.03, jnp.float32)
    key = jax.random.PRNGKey(1)

    # warmup / compile
    for i in range(3):
        state, metrics = step(state, jax.random.fold_in(key, i), batch, lr)
    jax.block_until_ready(metrics["loss"])

    n_steps = 10
    t0 = time.perf_counter()
    for i in range(n_steps):
        state, metrics = step(state, jax.random.fold_in(key, 100 + i), batch, lr)
    jax.block_until_ready(metrics["loss"])
    dt = time.perf_counter() - t0

    clips_per_sec = b * n_steps / dt
    per_chip = clips_per_sec / n_dev
    print(json.dumps({
        "metric": "pretrain_clips_per_sec_per_chip",
        "value": round(per_chip, 2),
        "unit": "clips/s/chip",
        "vs_baseline": round(per_chip / 2000.0, 4),
    }))


if __name__ == "__main__":
    main()
