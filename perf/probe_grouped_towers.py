"""Premise probe for grouped-conv tower batching (VERDICT r4 #9).

The online and target towers run IDENTICAL conv topologies with different
weights on the same 2B views. A `feature_group_count=2` formulation
(channel-concat inputs, group-concat weights) would double every conv's
per-call N — aimed exactly at the N-dim lane padding the round-9 MFU
ladder identified as the per-shape gap (N=144 pads to 256 lanes = 56%
ceiling; temporal N=64 to 128 = 50%).

Before committing to the model rewrite, measure the premise on the two
hottest shapes: is ONE grouped conv actually faster than the TWO separate
convs it replaces?

  spatial : 2x [128,16,56,56,64]x(1,3,3)->144   vs  fg=2 concat [.,128]->288
  temporal: 2x [128,16,56,56,144]x(3,1,1)->64   vs  fg=2 concat [.,288]->128

Also measured: the same-shape DOUBLE-BATCH conv (one weight set, 2x batch)
— the upper bound a grouped kernel could reach if XLA coalesced the groups
perfectly (M doubles instead of N; no new lane padding).

Timing per the hardened mfu_ladder harness: pre-staged operands, bounded
sin-folded serial chain, scalar fetch.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT = "results/grouped_towers_probe.json"


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--b", type=int, default=128)
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from cstp_tpu.utils import profiling
    from cstp_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()
    profiling.apply_tpu_tuning()
    print(f"device: {jax.devices()[0]}", flush=True)

    def timed(fn, *ops):
        acc = jnp.float32(0)
        out = fn(*ops, acc)
        _ = float(out)
        acc = out
        accs = []
        t0 = time.perf_counter()
        for _ in range(args.iters):
            acc = fn(*ops, acc)
            accs.append(acc)
        _ = float(acc)
        dt = (time.perf_counter() - t0) / args.iters
        vals = [float(a) for a in accs]
        return dt, len(set(vals)) / max(1, len(vals))

    def conv(x, w, k, fg=1):
        pads = [(0, 0), (1, 1), (1, 1)] if k[0] == 1 else \
               [(1, 1), (0, 0), (0, 0)]
        return jax.lax.conv_general_dilated(
            x, w, (1, 1, 1), pads,
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
            feature_group_count=fg, preferred_element_type=jnp.bfloat16)

    b = args.b
    rows = []
    for (name, t, hw, cin, cout, k) in [
            ("spatial(1,3,3)", 16, 56, 64, 144, (1, 3, 3)),
            ("temporal(3,1,1)", 16, 56, 144, 64, (3, 1, 1))]:
        kt, kh, kw = k
        key = jax.random.PRNGKey(0)
        x1 = jax.random.normal(key, (b, t, hw, hw, cin), jnp.bfloat16)
        x2 = jax.random.normal(jax.random.PRNGKey(1), x1.shape, jnp.bfloat16)
        w1 = jax.random.normal(jax.random.PRNGKey(2),
                               (kt, kh, kw, cin, cout), jnp.bfloat16) * 0.05
        w2 = jax.random.normal(jax.random.PRNGKey(3), w1.shape,
                               jnp.bfloat16) * 0.05
        xg = jnp.concatenate([x1, x2], axis=-1)          # (., 2*cin)
        wg = jnp.concatenate([w1, w2], axis=-1)          # groups in Cout
        xb = jnp.concatenate([x1, x2], axis=0)           # double batch
        for v in (x1, x2, w1, w2, xg, wg, xb):
            v.block_until_ready()
        flops2 = 2 * 2 * b * t * hw * hw * kt * kh * kw * cin * cout

        @jax.jit
        def two(x1, x2, w1, w2, c, k=k):
            d = (c * 1e-3).astype(jnp.bfloat16)
            y1 = conv(x1 + d, w1, k)
            y2 = conv(x2 + d, w2, k)
            return jnp.sin((jnp.sum(y1.astype(jnp.float32))
                            + jnp.sum(y2.astype(jnp.float32))) * 1e-6)

        @jax.jit
        def grouped(xg, wg, c, k=k):
            y = conv(xg + (c * 1e-3).astype(jnp.bfloat16), wg, k, fg=2)
            return jnp.sin(jnp.sum(y.astype(jnp.float32)) * 1e-6)

        @jax.jit
        def dbatch(xb, w1, c, k=k):
            y = conv(xb + (c * 1e-3).astype(jnp.bfloat16), w1, k)
            return jnp.sin(jnp.sum(y.astype(jnp.float32)) * 1e-6)

        dt2, d2 = timed(two, x1, x2, w1, w2)
        dtg, dg = timed(grouped, xg, wg)
        dtb, db = timed(dbatch, xb, w1)
        row = {"shape": name, "b": b,
               "two_separate_ms": dt2 * 1e3,
               "grouped_fg2_ms": dtg * 1e3,
               "double_batch_ms": dtb * 1e3,
               "tflops_two": flops2 / dt2 / 1e12,
               "tflops_grouped": flops2 / dtg / 1e12,
               "tflops_double_batch": flops2 / dtb / 1e12,
               "grouped_speedup": dt2 / dtg,
               "double_batch_speedup": dt2 / dtb,
               "distinct": [d2, dg, db]}
        rows.append(row)
        print(f"{name}: two={dt2 * 1e3:.2f}ms grouped={dtg * 1e3:.2f}ms "
              f"dbatch={dtb * 1e3:.2f}ms  grouped_speedup={dt2 / dtg:.2f}x "
              f"dbatch_speedup={dt2 / dtb:.2f}x", flush=True)
        os.makedirs("results", exist_ok=True)
        with open(OUT, "w") as f:
            json.dump({"rows": rows}, f, indent=1)
        del x1, x2, w1, w2, xg, wg, xb
    print(f"wrote {OUT}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
