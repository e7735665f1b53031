"""Measure TPU HBM tile padding for NDHWC channel widths.

TPU arrays are stored in tiled layouts whose minor dimension is padded to
the 128-lane register width (and the second-minor to the dtype sublane
count). For the r21d factorized-conv mid widths (83/144/230/288/460/921 —
models/layers.py r21d_intermediate_channels) that padding is physical HBM
footprint AND bandwidth. This probe measures, on the real chip:

  1. allocated bytes per logical byte for (8,16,56,56,C) bf16 tensors —
     ratio ~= ceil(C/128)*128/C when the minor dim is lane-padded;
  2. elementwise-chain time per logical byte at C=128 vs C=144 — if the
     padded lanes move, 144 costs ~256/144 = 1.78x per byte.

Motivated the ``--mid_round 128`` model variant (PERF.md).

FINDINGS (v5e via the dev tunnel, 2026-08-18): inconclusive-to-negative.
memory_stats() is unavailable on this backend (no footprint probe), and the
elementwise-chain timings are dominated by a ~0.8 ms fixed per-execution
overhead at these sizes, so the per-byte signal is buried: C=128/144/230/256
measured 0.865/0.908/0.910/1.060 ms/iter — nothing like the 2x cliff the
naive lane-padding model predicts between 128 and 144. The decisive
end-to-end test agreed: ``bench.py --mid-round 128`` is ~10% SLOWER than the
reference widths (see PERF.md "mid_round"), i.e. XLA:TPU's conv layouts do
not pay naive minor-dim padding on these activations, while the rounding's
extra FLOPs (230->256, 460->512) are real.
"""

import time

import jax
import jax.numpy as jnp

SHAPE = (8, 16, 56, 56)  # layer1-sized spatial block, b=8


def probe_footprint(dev):
    if dev.memory_stats() is None:   # tunneled/axon backend: not reported
        print("memory_stats() unavailable on this backend; skipping "
              "footprint probe (bandwidth probe below is the decisive one)")
        return
    print("C     logical_MB  allocated_MB  ratio")
    for c in (64, 83, 128, 144, 230, 256, 288):
        base = dev.memory_stats()["bytes_in_use"]
        x = jax.device_put(jnp.ones(SHAPE + (c,), jnp.bfloat16), dev)
        float(x[0, 0, 0, 0, 0])  # force materialization through the tunnel
        alloc = dev.memory_stats()["bytes_in_use"] - base
        logical = 1
        for s in SHAPE + (c,):
            logical *= s
        logical *= 2
        print(f"{c:4d}  {logical/2**20:9.1f}  {alloc/2**20:11.1f}  "
              f"{alloc/logical:5.2f}")
        del x


def probe_bandwidth(dev, iters=30, reps=3):
    @jax.jit
    def chain(x):
        for _ in range(iters):
            x = x * 1.000001
        return x

    # Warm the tunnel/dispatch path once so the first timed config doesn't
    # absorb one-time costs (observed: +175 ms on the first measurement).
    w = jax.device_put(jnp.ones(SHAPE + (64,), jnp.bfloat16), dev)
    float(chain(w)[0, 0, 0, 0, 0])
    del w

    print("\nC     ms/iter  ns_per_logical_KB   (min of %d reps)" % reps)
    for c in (128, 144, 230, 256):
        base = jnp.ones(SHAPE + (c,), jnp.bfloat16)
        chain(jax.device_put(base, dev)).block_until_ready()   # compile
        best = float("inf")
        for r in range(reps):
            # unique input per rep: the relay memoizes identical executions
            x = jax.device_put(base + jnp.bfloat16(r * 2**-7), dev)
            float(x[0, 0, 0, 0, 0])           # force the transfer NOW
            t0 = time.perf_counter()
            y = chain(x)
            float(y[0, 0, 0, 0, 0])           # chained fetch = real sync
            best = min(best, (time.perf_counter() - t0) / iters)
        logical = 2
        for s in SHAPE + (c,):
            logical *= s
        print(f"{c:4d}  {best*1e3:7.3f}  {best*1e9/(logical/1024):8.2f}")


if __name__ == "__main__":
    dev = jax.devices()[0]
    print("device:", dev)
    probe_footprint(dev)
    probe_bandwidth(dev)
