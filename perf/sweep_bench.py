"""Sweep bench.py over batch sizes / remat / TPU compiler flags.

Each configuration runs bench.py in a fresh subprocess (the tunneled TPU
backend caches compiled programs per-process; fresh processes also let env
compiler flags take effect). Prints one table row per config to stderr and
a JSON summary to stdout.

Usage:
    python perf/sweep_bench.py                 # default grid
    python perf/sweep_bench.py --quick         # 3 configs
"""

import argparse
import json
import os
import subprocess
import sys

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_one(name, bench_args, env_extra, steps):
    env = dict(os.environ)
    env.update(env_extra)
    cmd = [sys.executable, os.path.join(HERE, "bench.py"),
           "--steps", str(steps)] + bench_args
    try:
        out = subprocess.run(cmd, capture_output=True, text=True,
                             timeout=2400, env=env)
    except subprocess.TimeoutExpired:
        return {"name": name, "error": "timeout"}
    line = None
    for ln in out.stdout.splitlines():
        ln = ln.strip()
        if ln.startswith("{") and "clips" in ln:
            line = ln
    if line is None:
        tail = (out.stderr or out.stdout).strip().splitlines()[-6:]
        return {"name": name, "error": " | ".join(tail), "rc": out.returncode}
    d = json.loads(line)
    d["name"] = name
    return d


VMEM64 = "--xla_tpu_scoped_vmem_limit_kib=65536"


def flags_grid():
    """Round-5 grid: untried libtpu scheduler/fusion knobs layered on the
    measured vmem64m default (bench.py bakes vmem64m in; an explicit
    LIBTPU_INIT_ARGS here REPLACES it, so every entry re-includes it).
    Unknown-flag entries fail loudly per-config and are recorded as such."""

    def e(extra):
        return {"LIBTPU_INIT_ARGS": f"{VMEM64} {extra}"}

    b64 = ["--per-chip-bs", "64"]
    return [
        ("b64-control", b64, e("")),
        ("fusion-cost-model", b64,
         e("--xla_tpu_enable_experimental_fusion_cost_model=true")),
        ("aggr-loop-fusion-layout", b64,
         e("--xla_tpu_enable_aggressive_loop_fusion_layout_opt=true")),
        ("licm-inflate-2", b64, e("--xla_tpu_licm_size_inflation_ratio=2")),
        ("scavenge-vmem", b64, e("--xla_tpu_scavenge_vmem_for_fusions=true")),
        ("rwb-fusion-off", b64, e("--xla_tpu_rwb_fusion=false")),
        # the two flags that individually matched/edged the control, combined
        ("scavenge+aggrloop", b64,
         e("--xla_tpu_scavenge_vmem_for_fusions=true "
           "--xla_tpu_enable_aggressive_loop_fusion_layout_opt=true")),
        ("b64-control-2", b64, e("")),  # repeat control: run-to-run drift
        ("scavenge+aggrloop-2", b64,
         e("--xla_tpu_scavenge_vmem_for_fusions=true "
           "--xla_tpu_enable_aggressive_loop_fusion_layout_opt=true")),
        ("copy-bw-x2", b64,
         e("--xla_tpu_async_copy_bandwidth_scaling_factor=2.0")),
        ("copy-bw-x0.5", b64,
         e("--xla_tpu_async_copy_bandwidth_scaling_factor=0.5")),
        ("vmem80m", b64,
         {"LIBTPU_INIT_ARGS": "--xla_tpu_scoped_vmem_limit_kib=81920"}),
        # --grad_accum probes: b128/accum2 = recipe batch 128 on ONE chip
        # (microbatch 64); b64/accum2 isolates the scan overhead at the
        # round-3 sweet-spot microbatch shape's half size
        ("b128-accum2", ["--per-chip-bs", "128", "--grad-accum", "2"],
         e("")),
        ("b64-accum2", ["--per-chip-bs", "64", "--grad-accum", "2"], e("")),
    ]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--grid", default="default", choices=["default", "flags"])
    ap.add_argument("--only", default="",
                    help="comma-separated config names to run (resume a "
                         "partial sweep)")
    ap.add_argument("--steps", type=int, default=10)
    args = ap.parse_args()

    VM64 = {"LIBTPU_INIT_ARGS": VMEM64}
    grid = [
        ("b64-s2d-vmem64m", ["--per-chip-bs", "64", "--s2d-stem"], VM64),
        ("b64-vmem96m",
         ["--per-chip-bs", "64"],
         {"LIBTPU_INIT_ARGS": "--xla_tpu_scoped_vmem_limit_kib=98304"}),
        ("b64-vmem128m",
         ["--per-chip-bs", "64"],
         {"LIBTPU_INIT_ARGS": "--xla_tpu_scoped_vmem_limit_kib=131072"}),
    ]
    if args.grid == "flags":
        grid = flags_grid()
    elif not args.quick:
        grid += [
            # round-3 first sweep (results in PERF.md): b64 235.4,
            # b64-remat 204.6, b48 192.4, b64-vmem64m 247.2, b64-vmem32m
            # 243.2; b80/b96 compile-OOM, b96/b128-remat runtime-OOM
            ("b64-baseline", ["--per-chip-bs", "64"], {}),
            ("b64-s2d", ["--per-chip-bs", "64", "--s2d-stem"], {}),
            ("b96-remat-vmem64m",
             ["--per-chip-bs", "96", "--remat"], VM64),
        ]

    if args.only:
        keep = {s.strip() for s in args.only.split(",") if s.strip()}
        grid = [g for g in grid if g[0] in keep]

    results = []
    for name, bench_args, env_extra in grid:
        r = run_one(name, bench_args, env_extra, args.steps)
        results.append(r)
        if "value" in r:
            print(f"{name:18s} {r['value']:8.1f} clips/s/chip",
                  file=sys.stderr, flush=True)
        else:
            print(f"{name:18s} ERROR {r.get('error','')[:160]}",
                  file=sys.stderr, flush=True)
    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
