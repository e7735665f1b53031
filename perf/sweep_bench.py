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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--steps", type=int, default=10)
    args = ap.parse_args()

    VM64 = {"LIBTPU_INIT_ARGS": "--xla_tpu_scoped_vmem_limit_kib=65536"}
    grid = [
        ("b64-s2d-vmem64m", ["--per-chip-bs", "64", "--s2d-stem"], VM64),
        ("b64-vmem96m",
         ["--per-chip-bs", "64"],
         {"LIBTPU_INIT_ARGS": "--xla_tpu_scoped_vmem_limit_kib=98304"}),
        ("b64-vmem128m",
         ["--per-chip-bs", "64"],
         {"LIBTPU_INIT_ARGS": "--xla_tpu_scoped_vmem_limit_kib=131072"}),
    ]
    if not args.quick:
        grid += [
            # round-3 first sweep (results in PERF.md): b64 235.4,
            # b64-remat 204.6, b48 192.4, b64-vmem64m 247.2, b64-vmem32m
            # 243.2; b80/b96 compile-OOM, b96/b128-remat runtime-OOM
            ("b64-baseline", ["--per-chip-bs", "64"], {}),
            ("b64-s2d", ["--per-chip-bs", "64", "--s2d-stem"], {}),
            ("b96-remat-vmem64m",
             ["--per-chip-bs", "96", "--remat"], VM64),
        ]

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
