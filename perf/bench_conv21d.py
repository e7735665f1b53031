"""Standalone benchmark: Pallas-fused (2+1)D block vs the XLA chain.

Layer1 shapes of the flagship pretrain step (the trace's hot stage —
PERF.md round 3: ~50 layer1-shaped conv/BN-stat fusions at 30-60%
efficiency). Run on the real TPU (default env):

    python perf/bench_conv21d.py [--b 128] [--t 16] [--hw 56] [--cin 64]
                                 [--mid 144] [--cout 64] [--groups 2]

Timing follows PERF.md's tunneled-backend rules: pre-staged inputs, chained
data dependencies (output feeds the next iteration's scale), one scalar
fetch at the end.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--b", type=int, default=128)   # 2B concat views @ b=64
    ap.add_argument("--t", type=int, default=16)
    ap.add_argument("--hw", type=int, default=56)
    ap.add_argument("--cin", type=int, default=64)
    ap.add_argument("--mid", type=int, default=144)
    ap.add_argument("--cout", type=int, default=64)
    ap.add_argument("--groups", type=int, default=2)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--mode", default="both", choices=["fwd", "grad", "both"])
    ap.add_argument("--tiling", default="clip", choices=["taps9", "clip"],
                    help="kernel variant: taps9 = round-2 per-frame 9xK=Cin "
                         "matmuls + ring; clip = tap-stacked K=9*Cin im2col "
                         "+ whole-clip macro-tiles (VERDICT r2 #2)")
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from cstp_tpu.ops.pallas.conv21d import (
        fused_st_conv,
        reference_chain,
        reference_stats,
    )
    from cstp_tpu.utils import profiling
    from cstp_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()
    profiling.apply_tpu_tuning()

    b, t, hw = args.b, args.t, args.hw
    ks = jax.random.split(jax.random.PRNGKey(0), 5)
    x = jax.random.normal(ks[0], (b, t, hw, hw, args.cin), jnp.float32) * 0.5
    ws = jax.random.normal(ks[1], (3, 3, args.cin, args.mid),
                           jnp.float32) * 0.05
    wt = jax.random.normal(ks[2], (3, args.mid, args.cout),
                           jnp.float32) * 0.05
    scale = jax.random.normal(ks[3], (args.mid,), jnp.float32) * 0.3
    bias = jax.random.normal(ks[4], (args.mid,), jnp.float32) * 0.1
    for v in (x, ws, wt, scale, bias):
        v.block_until_ready()

    g = args.groups

    @jax.jit
    def xla_fwd(x_, ws_, wt_, s_, b_):
        gm, gv = reference_stats(x_, ws_, bn_groups=g)
        out = reference_chain(x_, ws_, wt_, s_, b_, gm, gv, bn_groups=g)
        return jnp.sum(out.astype(jnp.float32))

    tiling = args.tiling

    @jax.jit
    def fused_fwd(x_, ws_, wt_, s_, b_):
        out, _, _ = fused_st_conv(x_, ws_, wt_, s_, b_, g, 1e-5, False,
                                  tiling)
        return jnp.sum(out.astype(jnp.float32))

    @jax.jit
    def xla_grad(x_, ws_, wt_, s_, b_):
        return jax.grad(
            lambda *a: jnp.sum(
                reference_chain(a[0], a[1], a[2], a[3], a[4],
                                *reference_stats(a[0], a[1], bn_groups=g),
                                bn_groups=g).astype(jnp.float32) ** 2),
            argnums=(1,))(x_, ws_, wt_, s_, b_)[0].sum()

    @jax.jit
    def fused_grad(x_, ws_, wt_, s_, b_):
        return jax.grad(
            lambda *a: jnp.sum(
                fused_st_conv(a[0], a[1], a[2], a[3], a[4],
                              g)[0].astype(jnp.float32) ** 2),
            argnums=(1,))(x_, ws_, wt_, s_, b_)[0].sum()

    def timed(fn, name):
        # chain: perturb scale by the previous scalar so nothing memoizes;
        # force completion with SCALAR FETCHES (block_until_ready does not
        # reliably block through the tunneled backend — PERF.md notes)
        out = fn(x, ws, wt, scale, bias)  # compile + warm
        _ = float(out)
        acc = jnp.float32(0)
        t0 = time.perf_counter()
        for i in range(args.iters):
            out = fn(x, ws, wt, scale + acc * 1e-20, bias)
            acc = out * 1e-30
        _ = float(acc)  # forces the chain
        dt = (time.perf_counter() - t0) / args.iters
        print(f"{name:10s} {dt * 1e3:8.2f} ms")
        return dt

    print(f"shapes: x=({b},{t},{hw},{hw},{args.cin}) mid={args.mid} "
          f"cout={args.cout} groups={g} device={jax.devices()[0]}")
    results = {}
    if args.mode in ("fwd", "both"):
        results["xla_fwd"] = timed(xla_fwd, "xla fwd")
        results["fused_fwd"] = timed(fused_fwd, f"fused/{args.tiling}")
        print(f"fwd speedup: {results['xla_fwd'] / results['fused_fwd']:.3f}x")
        # kernel MXU utilization (VERDICT r2 #2): useful contraction FLOPs
        # of the fused forward = stats pass (1x spatial conv) + fwd pass
        # (1x spatial conv + temporal conv), vs v5e bf16 peak 197 TFLOP/s
        sp = 2 * b * t * hw * hw * (9 * args.cin) * args.mid
        tc = 2 * b * t * hw * hw * args.mid * args.cout * 3
        for name in ("xla_fwd", "fused_fwd"):
            flops = (sp + tc) if name == "xla_fwd" else (2 * sp + tc)
            tf = flops / results[name] / 1e12
            print(f"  {name}: {tf:.1f} TFLOP/s = {tf / 197 * 100:.1f}% "
                  f"of v5e bf16 peak ({flops / 1e9:.1f} GFLOP)")
    if args.mode in ("grad", "both"):
        results["xla_grad"] = timed(xla_grad, "xla grad")
        results["fused_grad"] = timed(fused_grad, "fused grad")
        print(f"grad speedup: "
              f"{results['xla_grad'] / results['fused_grad']:.3f}x")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
