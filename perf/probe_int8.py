"""Probe: does XLA:TPU lower int8 convolutions to the MXU's int8 path at a
useful rate on v5e (peak 394 TOPS int8 vs 197 TFLOP/s bf16)?

Measures layer1-shaped spatial convs (the step's hot shape) as:
  bf16 x bf16 -> bf16      (the production path)
  int8 x int8 -> int32     (candidate --quant int8 forward path)
  int8 conv + dequant epilogue (the realistic fused form)

Run on the real TPU:  python perf/probe_int8.py [--iters 20]
Timing per PERF.md tunneled-backend rules: pre-staged inputs, chained
dependencies, scalar fetch.
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--b", type=int, default=128)
    ap.add_argument("--t", type=int, default=16)
    ap.add_argument("--hw", type=int, default=56)
    ap.add_argument("--cin", type=int, default=64)
    ap.add_argument("--cout", type=int, default=144)
    ap.add_argument("--iters", type=int, default=20)
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from cstp_tpu.utils import profiling
    from cstp_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()
    profiling.apply_tpu_tuning()

    b, t, hw, cin, cout = args.b, args.t, args.hw, args.cin, args.cout
    k = jax.random.PRNGKey(0)
    xf = jax.random.normal(k, (b, t, hw, hw, cin), jnp.bfloat16)
    wf = (jax.random.normal(jax.random.PRNGKey(1), (1, 3, 3, cin, cout),
                            jnp.bfloat16) * 0.05)
    xi = jnp.clip(jnp.round(xf.astype(jnp.float32) * 50), -127, 127).astype(
        jnp.int8)
    wi = jnp.clip(jnp.round(wf.astype(jnp.float32) * 1000), -127, 127).astype(
        jnp.int8)
    for v in (xf, wf, xi, wi):
        v.block_until_ready()

    def conv(x, w, acc):
        return jax.lax.conv_general_dilated(
            x, w, (1, 1, 1), [(0, 0), (1, 1), (1, 1)],
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
            preferred_element_type=acc,
        )

    @jax.jit
    def f_bf16(x, w, c):
        return jnp.sum(conv(x + c.astype(x.dtype), w, jnp.bfloat16)
                       .astype(jnp.float32))

    @jax.jit
    def f_int8(x, w, c):
        # chain an int perturbation so the relay can't memoize
        return jnp.sum(conv(x + c.astype(jnp.int8), w, jnp.int32)
                       .astype(jnp.float32))

    @jax.jit
    def f_int8_dequant(x, w, c):
        out = conv(x + c.astype(jnp.int8), w, jnp.int32)
        deq = (out.astype(jnp.float32) * (1.0 / (50 * 1000))).astype(
            jnp.bfloat16)
        return jnp.sum(deq.astype(jnp.float32))

    flops = 2 * b * t * hw * hw * 9 * cin * cout

    def timed(fn, x, w, name):
        out = fn(x, w, jnp.zeros((), jnp.float32))
        _ = float(out)
        acc = jnp.float32(0)
        t0 = time.perf_counter()
        for _i in range(args.iters):
            out = fn(x, w, acc * 1e-30)
            acc = out * 1e-30
        _ = float(acc)
        dt = (time.perf_counter() - t0) / args.iters
        rate = flops / dt / 1e12
        print(f"{name:18s} {dt * 1e3:8.2f} ms   {rate:6.1f} T(FL)OP/s",
              flush=True)
        return dt

    print(f"x=({b},{t},{hw},{hw},{cin}) -> {cout}, "
          f"{flops / 1e9:.1f} GFLOP/conv, device={jax.devices()[0]}")
    tb = timed(f_bf16, xf, wf, "bf16")
    ti = timed(f_int8, xi, wi, "int8->int32")
    td = timed(f_int8_dequant, xi, wi, "int8+dequant")
    print(f"int8 speedup vs bf16: {tb / ti:.2f}x (dequant form {tb / td:.2f}x)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
