"""MFU decomposition: toolchain matmul ceiling vs per-shape conv efficiency
(VERDICT r4 #1).

The round-8 byte audit (PERF.md) established that the b=64 pretrain step is
COMPUTE-bound at ~41% MFU (259 ms vs ~106 ms bf16 compute SoL) — but 41% is
computed against the 197 TFLOP/s v5e paper peak, and nothing measured (a)
what fraction of that peak THIS toolchain reaches on any program, or (b)
XLA's per-shape conv efficiency at the step's exact shapes. This script
answers both:

  --extract  (CPU, no chip):  trace the EXACT b=64 train program
      (`split_pretrain_step`'s `train`, the program bench.py times) and walk
      its jaxpr for every `conv_general_dilated` equation — fwd, grad-input
      and grad-filter convs alike — recording operand shapes, strides,
      paddings, dilations, dimension numbers, group counts and per-eqn
      FLOPs. Writes results/step_conv_shapes.json. The FLOP total is
      cross-checked against the roofline's 21.0 TFLOP/step (PERF.md).

  --measure  (TPU): three ladders, dumped incrementally to
      results/mfu_ladder.json after every row (tunnel timeouts can't lose
      completed rows):
        1. dense bf16 matmul chains (4096^3 etc.) -> the TOOLCHAIN CEILING:
           the fraction of paper peak this chip+compiler reaches on the
           friendliest possible program;
        2. GEMM-equivalents of the hot conv contractions (same K/N, large M,
           incl. lane-aligned variants) -> how much of the gap is inherent
           to the contraction SHAPE (K/N lane padding) vs the conv kernel;
        3. the top step conv signatures replayed standalone-in-jit with the
           exact `conv_general_dilated` params -> per-shape XLA conv
           efficiency.

Timing follows the tunneled-backend rules (PERF.md): pre-staged operands,
serial data-dependence chained through every replay (the relay memoizes
identical executions), scalar fetch at the end.

Reference match: the compute side of
/root/reference/models/pace/r21d_byol.py:38-97 (the factorized conv stack
whose MFU is the whole game).
"""

from __future__ import annotations

import argparse
import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SHAPES_PATH = "results/step_conv_shapes.json"
OUT_PATH = "results/mfu_ladder.json"
PEAK_TFLOPS = 197.0  # v5e bf16 paper peak (utils/profiling.py)


# ---------------------------------------------------------------------------
# extraction (CPU)
# ---------------------------------------------------------------------------


def _walk_convs(jaxpr, out):
    import jax.extend.core as jex_core

    for eqn in jaxpr.eqns:
        if eqn.primitive.name == "conv_general_dilated":
            out.append(eqn)
        for v in eqn.params.values():
            for j in _subjaxprs(v):
                _walk_convs(j, out)


def _subjaxprs(v):
    import jax.extend.core as jex_core

    ClosedJaxpr = jex_core.ClosedJaxpr
    Jaxpr = jex_core.Jaxpr
    if isinstance(v, ClosedJaxpr):
        yield v.jaxpr
    elif isinstance(v, Jaxpr):
        yield v
    elif isinstance(v, (list, tuple)):
        for x in v:
            yield from _subjaxprs(x)


def _conv_flops(eqn) -> int:
    """2 * prod(out_shape) * (prod(rhs_spatial) * rhs_in_features).

    rhs_in_features is already divided by feature_group_count, and for
    batch-grouped (grad-filter) convs the contraction batch lives in the
    lhs batch dim which lands in rhs_in_features' position of the
    contraction — the formula holds for all three conv forms XLA's autodiff
    emits (validated against the roofline's 21.0 TFLOP/step total)."""
    dn = eqn.params["dimension_numbers"]
    rhs = eqn.invars[1].aval.shape
    out = eqn.outvars[0].aval.shape
    rhs_spatial = [rhs[i] for i in dn.rhs_spec[2:]]
    rhs_in = rhs[dn.rhs_spec[1]]
    return 2 * int(math.prod(out)) * int(math.prod(rhs_spatial)) * int(rhs_in)


def extract(args) -> int:
    import jax
    import numpy as np

    from cstp_tpu.config import Config
    from cstp_tpu.train import optim
    from cstp_tpu.train.pretrain import (
        TrainState,
        bn_groups_from_config,
        create_pretrain_model,
        split_pretrain_step,
    )

    cfg = Config(
        model_name="r21d", model_depth=1, sample_duration=16,
        sample_size=112, batch_size=args.batch, compute_dtype="bfloat16",
        mesh_shape=(1, 1),
    ).finalize()
    model = create_pretrain_model(cfg)
    t, s = cfg.sample_duration, cfg.sample_size
    bs = max(2, bn_groups_from_config(cfg))
    import jax.numpy as jnp

    var_sds = jax.eval_shape(
        lambda k, a, b: model.init(k, a, b, train=True),
        jax.random.PRNGKey(0),
        jax.ShapeDtypeStruct((bs, t, s, s, 3), jnp.bfloat16),
        jax.ShapeDtypeStruct((bs, t, s, s, 3), jnp.bfloat16))
    params = var_sds["params"]
    labels = optim.param_labels(params, frozen_prefixes=("target_net",))
    tx = optim.make_optimizer(
        cfg.optimizer, momentum=cfg.momentum, weight_decay=cfg.weight_decay,
        dampening=cfg.dampening, nesterov=cfg.nesterov,
        clip_grad_norm=cfg.clip_grad_value if cfg.clip_grad_norm else None,
        labels=labels)
    opt_sds = jax.eval_shape(tx.init, params)
    state_sds = TrainState(
        step=jax.ShapeDtypeStruct((), jnp.int32), params=params,
        batch_stats=var_sds.get("batch_stats", {}), opt_state=opt_sds)

    _, train = split_pretrain_step(model, tx, cfg)
    b = cfg.batch_size
    views_labels = (
        jax.ShapeDtypeStruct((b, t, s, s, 3), jnp.bfloat16),
        jax.ShapeDtypeStruct((b, t, s, s, 3), jnp.bfloat16),
        jax.ShapeDtypeStruct((b,), jnp.int32),
        jax.ShapeDtypeStruct((b,), jnp.int32),
        jax.ShapeDtypeStruct((b,), jnp.int32),
        jax.ShapeDtypeStruct((b,), jnp.int32),
        jax.ShapeDtypeStruct((b,), jnp.int32),
    )
    lr = jax.ShapeDtypeStruct((), jnp.float32)
    jaxpr = jax.make_jaxpr(train)(state_sds, views_labels, lr)

    convs = []
    _walk_convs(jaxpr.jaxpr, convs)
    sigs = {}
    for eqn in convs:
        p = eqn.params
        dn = p["dimension_numbers"]
        lhs = eqn.invars[0].aval
        rhs = eqn.invars[1].aval
        out = eqn.outvars[0].aval
        key = (tuple(lhs.shape), tuple(rhs.shape), str(lhs.dtype),
               str(rhs.dtype), tuple(p["window_strides"]),
               tuple(tuple(q) for q in p["padding"]),
               tuple(p["lhs_dilation"]), tuple(p["rhs_dilation"]),
               (tuple(dn.lhs_spec), tuple(dn.rhs_spec), tuple(dn.out_spec)),
               int(p["feature_group_count"]), int(p["batch_group_count"]),
               str(p.get("preferred_element_type") or out.dtype))
        if key not in sigs:
            sigs[key] = {
                "lhs_shape": list(lhs.shape), "rhs_shape": list(rhs.shape),
                "lhs_dtype": str(lhs.dtype), "rhs_dtype": str(rhs.dtype),
                "out_shape": list(out.shape), "out_dtype": str(out.dtype),
                "window_strides": list(p["window_strides"]),
                "padding": [list(q) for q in p["padding"]],
                "lhs_dilation": list(p["lhs_dilation"]),
                "rhs_dilation": list(p["rhs_dilation"]),
                "dimension_numbers": [list(dn.lhs_spec), list(dn.rhs_spec),
                                      list(dn.out_spec)],
                "feature_group_count": int(p["feature_group_count"]),
                "batch_group_count": int(p["batch_group_count"]),
                "preferred_element_type":
                    str(p.get("preferred_element_type") or out.dtype),
                "count": 0,
                "flops_each": _conv_flops(eqn),
            }
        sigs[key]["count"] += 1

    rows = sorted(sigs.values(),
                  key=lambda r: -r["flops_each"] * r["count"])
    total = sum(r["flops_each"] * r["count"] for r in rows)
    for r in rows:
        r["flops_total"] = r["flops_each"] * r["count"]
        r["step_share"] = r["flops_total"] / total
    print(f"{len(convs)} conv eqns, {len(rows)} unique signatures, "
          f"total {total / 1e12:.2f} TFLOP "
          f"(roofline cross-check: 21.0 TFLOP at b=64)")
    for r in rows[:15]:
        print(f"  x{r['count']:2d} {r['flops_total'] / 1e12:6.3f} TFLOP "
              f"({100 * r['step_share']:4.1f}%)  lhs={r['lhs_shape']} "
              f"rhs={r['rhs_shape']} str={r['window_strides']} "
              f"ld={r['lhs_dilation']} bg={r['batch_group_count']} "
              f"fg={r['feature_group_count']}")
    os.makedirs("results", exist_ok=True)
    with open(SHAPES_PATH, "w") as f:
        json.dump({"batch": args.batch, "total_flops": total,
                   "n_conv_eqns": len(convs), "signatures": rows}, f,
                  indent=1)
    print(f"wrote {SHAPES_PATH}")
    return 0


# ---------------------------------------------------------------------------
# measurement (TPU)
# ---------------------------------------------------------------------------


def _dump(out):
    os.makedirs("results", exist_ok=True)
    with open(OUT_PATH, "w") as f:
        json.dump(out, f, indent=1)


def _timed_chain(fn, iters, *operands):
    """Time `fn(*operands, acc)` with a serial scalar chain through every
    call so the tunnel relay can't memoize or overlap.

    `fn` must return a BOUNDED O(1) f32 scalar that is distinct call to
    call (the fns here fold their result through sin()). A first version
    of this harness chained `out * 1e-30` scalars that underflowed to f32
    zero after one call, making every timed call bit-identical — the
    memoizable case. Now the chain is verified: every per-call scalar is
    collected (device-side, forced only after the clock stops) and the
    function returns (s_per_call, distinct_fraction).
    """
    import jax.numpy as jnp

    acc = jnp.float32(0)
    out = fn(*operands, acc)  # compile + warm
    _ = float(out)
    acc = out
    accs = []
    t0 = time.perf_counter()
    for _i in range(iters):
        acc = fn(*operands, acc)
        accs.append(acc)
    _ = float(acc)
    dt = (time.perf_counter() - t0) / iters
    vals = [float(a) for a in accs]
    distinct = len(set(vals)) / max(1, len(vals))
    return dt, distinct


def _timed_fixed(fn, iters, *operands):
    """Memoization CONTROL: same compiled fn, every call bit-identical
    (acc fixed at 0). If the relay memoizes by content, this runs
    anomalously fast vs the chained timing."""
    import jax.numpy as jnp

    z = jnp.float32(0)
    out = fn(*operands, z)
    _ = float(out)
    outs = []
    t0 = time.perf_counter()
    for _i in range(iters):
        outs.append(fn(*operands, z))
    _ = float(outs[-1])
    return (time.perf_counter() - t0) / iters


def measure(args) -> int:
    import jax
    import jax.numpy as jnp

    from cstp_tpu.utils import profiling
    from cstp_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()
    profiling.apply_tpu_tuning()
    dev = str(jax.devices()[0])
    print(f"device: {dev}", flush=True)

    out = {"device": dev, "peak_tflops": PEAK_TFLOPS,
           "matmul_ceiling": [], "gemm_equivalents": [], "conv_ladder": []}

    # ---- ladder 1: dense matmul toolchain ceiling -------------------------
    # R serialized matmuls inside one jit call amortize dispatch latency.
    mm_sizes = [(4096, 4096, 4096, 16), (8192, 8192, 8192, 4),
                (2048, 2048, 2048, 32)]
    if args.smoke:
        mm_sizes = [(256, 256, 256, 2)]
    for (m, k, n, reps) in mm_sizes:
        key = jax.random.PRNGKey(0)
        a = jax.random.normal(key, (m, k), jnp.bfloat16)
        w = jax.random.normal(jax.random.PRNGKey(1), (k, n), jnp.bfloat16)
        a.block_until_ready(), w.block_until_ready()

        inv = 1.0 / math.sqrt(k)

        @jax.jit
        def f(a, w, c, reps=reps, inv=inv):
            # magnitude-stable serial chain: each rep renormalizes by
            # 1/sqrt(k) so entries stay ~N(0,1) for ANY rep count (no
            # overflow-to-inf / underflow-to-zero degenerate timings)
            s = (c * 1e-3).astype(jnp.bfloat16)
            y = a
            for _ in range(reps):
                y = ((y + s) @ w) * jnp.bfloat16(inv)   # serial dep
                s = y[0, 0] * 1e-3
            return jnp.sin(y[0, 0].astype(jnp.float32) * 1e3)

        dt, distinct = _timed_chain(f, args.iters, a, w)
        dt_fixed = _timed_fixed(f, args.iters, a, w)
        flops = 2 * m * k * n * reps
        tf = flops / dt / 1e12
        row = {"kind": "matmul", "mkn": [m, k, n], "reps": reps,
               "s_per_call": dt, "tflops": tf,
               "pct_peak": 100 * tf / PEAK_TFLOPS,
               "distinct_frac": distinct,
               "fixed_input_s_per_call": dt_fixed,
               "memo_speedup_on_identical_calls": dt / dt_fixed}
        out["matmul_ceiling"].append(row)
        print(f"matmul {m}x{k}x{n} x{reps}: {tf:7.1f} TFLOP/s "
              f"({row['pct_peak']:.1f}% of peak) distinct={distinct:.2f} "
              f"memo_ctl={dt / dt_fixed:.2f}x", flush=True)
        _dump(out)
        del a, w

    ceiling = max(r["tflops"] for r in out["matmul_ceiling"])
    out["toolchain_ceiling_tflops"] = ceiling

    # ---- ladder 2: GEMM-equivalents of the hot conv contractions ----------
    # layer1 spatial conv contracts K=3*3*64=576 -> N=144; its temporal
    # conv K=3*144=432 -> N=64. Lane-aligned variants isolate the pure
    # (8,128)-tiling penalty of N=144 (pads to 256 lanes) etc.
    M = 1 << 19
    if args.smoke:
        M = 1 << 10
    for (k, n, tag) in [(576, 144, "layer1 spatial K/N"),
                        (576, 128, "lane-aligned N"),
                        (576, 256, "lane-aligned N (padded target)"),
                        (432, 64, "layer1 temporal K/N"),
                        (512, 128, "aligned control"),
                        (2070, 230, "layer2 spatial K/N"),
                        (1152, 512, "layer4-ish aligned")]:
        a = jax.random.normal(jax.random.PRNGKey(2), (M, k), jnp.bfloat16)
        w = jax.random.normal(jax.random.PRNGKey(3), (k, n), jnp.bfloat16)
        a.block_until_ready(), w.block_until_ready()

        @jax.jit
        def g(a, w, c):
            y = (a + (c * 1e-3).astype(jnp.bfloat16)) @ w
            # sin-fold: bounded O(1), distinct per call (the 1e-3 input
            # shift moves the f32 sum by a macroscopic amount)
            return jnp.sin(jnp.sum(y.astype(jnp.float32)) * 1e-6)

        dt, distinct = _timed_chain(g, args.iters, a, w)
        flops = 2 * M * k * n
        tf = flops / dt / 1e12
        row = {"kind": "gemm", "m": M, "k": k, "n": n, "tag": tag,
               "s_per_call": dt, "tflops": tf,
               "pct_peak": 100 * tf / PEAK_TFLOPS,
               "pct_ceiling": 100 * tf / ceiling,
               "distinct_frac": distinct}
        out["gemm_equivalents"].append(row)
        print(f"gemm M=2^19 K={k:5d} N={n:4d} [{tag:28s}]: {tf:7.1f} "
              f"TFLOP/s ({row['pct_ceiling']:.1f}% of ceiling) "
              f"distinct={distinct:.2f}", flush=True)
        _dump(out)
        del a, w

    # ---- ladder 3: the step's conv signatures, replayed exactly -----------
    with open(SHAPES_PATH) as f:
        shapes = json.load(f)
    rows = (shapes["signatures"][-2:] if args.smoke
            else shapes["signatures"][:args.top])
    from jax import lax

    for i, r in enumerate(rows):
        lhs_sd = (tuple(r["lhs_shape"]), r["lhs_dtype"])
        dn = lax.ConvDimensionNumbers(
            tuple(r["dimension_numbers"][0]),
            tuple(r["dimension_numbers"][1]),
            tuple(r["dimension_numbers"][2]))
        a = jax.random.normal(jax.random.PRNGKey(4), tuple(r["lhs_shape"]),
                              jnp.dtype(r["lhs_dtype"]))
        w = (jax.random.normal(jax.random.PRNGKey(5), tuple(r["rhs_shape"]),
                               jnp.dtype(r["rhs_dtype"])) * 0.05)
        a.block_until_ready(), w.block_until_ready()
        pet = jnp.dtype(r["preferred_element_type"])

        @jax.jit
        def h(a, w, c, r=r, dn=dn, pet=pet):
            y = lax.conv_general_dilated(
                a + (c * 1e-3).astype(a.dtype), w,
                tuple(r["window_strides"]),
                [tuple(q) for q in r["padding"]],
                lhs_dilation=tuple(r["lhs_dilation"]),
                rhs_dilation=tuple(r["rhs_dilation"]),
                dimension_numbers=dn,
                feature_group_count=r["feature_group_count"],
                batch_group_count=r["batch_group_count"],
                preferred_element_type=pet)
            return jnp.sin(jnp.sum(y.astype(jnp.float32)) * 1e-6)

        try:
            dt, distinct = _timed_chain(h, args.iters, a, w)
            dt_fixed = _timed_fixed(h, args.iters, a, w)
        except Exception as e:  # OOM on a pathological replay: record, go on
            print(f"conv[{i}] FAILED: {e}", flush=True)
            out["conv_ladder"].append({**r, "error": str(e)[:200]})
            _dump(out)
            del a, w
            continue
        tf = r["flops_each"] / dt / 1e12
        row = {**r, "s_per_call": dt, "tflops": tf,
               "pct_peak": 100 * tf / PEAK_TFLOPS,
               "pct_ceiling": 100 * tf / ceiling,
               "distinct_frac": distinct,
               "fixed_input_s_per_call": dt_fixed,
               "memo_speedup_on_identical_calls": dt / dt_fixed}
        out["conv_ladder"].append(row)
        print(f"conv[{i}] x{r['count']} share={100 * r['step_share']:4.1f}% "
              f"lhs={r['lhs_shape']} rhs={r['rhs_shape']} "
              f"bg={r['batch_group_count']}: {tf:6.1f} TFLOP/s "
              f"({row['pct_ceiling']:.1f}% of ceiling) "
              f"distinct={distinct:.2f} memo_ctl={dt / dt_fixed:.2f}x",
              flush=True)
        _dump(out)
        del a, w

    # ---- synthesis --------------------------------------------------------
    good = [r for r in out["conv_ladder"] if "tflops" in r]
    if good:
        cov = sum(r["step_share"] for r in good)
        t_pred = sum(r["flops_total"] / (r["tflops"] * 1e12) for r in good)
        out["summary"] = {
            "ladder_step_share_covered": cov,
            "ladder_weighted_tflops":
                sum(r["flops_total"] for r in good) / t_pred / 1e12,
            "predicted_step_ms_at_ladder_rates":
                1e3 * t_pred / max(cov, 1e-9),
        }
        print(json.dumps(out["summary"], indent=1), flush=True)
    _dump(out)
    print(f"wrote {OUT_PATH}")
    return 0


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--extract", action="store_true")
    ap.add_argument("--measure", action="store_true")
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--top", type=int, default=14)
    ap.add_argument("--smoke", action="store_true",
                    help="tiny matmul/GEMM sizes + conv replay of the LAST "
                         "(smallest) signatures — CPU flow validation only")
    args = ap.parse_args(argv)
    if args.extract:
        return extract(args)
    if args.measure:
        return measure(args)
    print("pass --extract (CPU) or --measure (TPU)")
    return 2


if __name__ == "__main__":
    raise SystemExit(main())
