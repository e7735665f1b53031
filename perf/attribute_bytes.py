"""Byte-attribution audit of the compiled pretrain step (VERDICT r3 #2).

The round-3 roofline says the b=64 step accesses 124.7 GB against a
~152 ms memory speed-of-light, achieved ~259 ms (59% HBM util). This tool
attributes those bytes to NAMED tensors so the gap is attackable: it
compiles the real train program (same builder as bench.py), walks the
OPTIMIZED HLO's entry computation, and for every top-level instruction
(the materialization units — each fusion/conv/copy output is a physical
HBM buffer) accounts:

  * writes  = the instruction's output buffer bytes
  * reads   = the summed bytes of its operands' buffers

grouped by (dtype, shape) with a human label for the known model tensors
(layer1..layer4 mids, tower activations, params, …). The table's total is
cross-checked against XLA's own cost analysis ("bytes accessed") — the
number PERF.md's roofline uses.

Usage (real chip):
  python perf/attribute_bytes.py [--per-chip-bs 64] [--quant int8_store]
                                 [--top 40] [--json OUT.json]
"""

import argparse
import json
import re
import sys
from collections import defaultdict


def log(*a):
    print(*a, file=sys.stderr, flush=True)


_DTYPE_BYTES = {
    "pred": 1, "s8": 1, "u8": 1, "s16": 2, "u16": 2, "bf16": 2, "f16": 2,
    "s32": 4, "u32": 4, "f32": 4, "s64": 8, "u64": 8, "f64": 8, "c64": 8,
    "token": 0, "s4": 1, "u4": 1,
}

_SHAPE_RE = re.compile(r"(\w+)\[([\d,]*)\]")


def shape_bytes(type_str):
    """Total bytes of an HLO type string (handles tuples)."""
    total = 0
    shapes = []
    for m in _SHAPE_RE.finditer(type_str):
        dt, dims = m.group(1), m.group(2)
        if dt not in _DTYPE_BYTES:
            continue
        n = 1
        if dims:
            for d in dims.split(","):
                n *= int(d)
        total += n * _DTYPE_BYTES[dt]
        shapes.append((dt, dims))
    return total, shapes


_INSTR_RE = re.compile(
    r"^\s*(?:ROOT\s+)?%?([\w.\-]+)\s*=\s*(\([^)]*\)|\S+)\s+([\w\-]+)\(")
_OPERAND_RE = re.compile(r"%([\w.\-]+)")


def parse_entry_instructions(hlo_text):
    """Yield (name, type_str, opcode, operand_names) for each top-level
    instruction of the ENTRY computation."""
    lines = hlo_text.splitlines()
    in_entry = False
    depth = 0
    for ln in lines:
        if ln.startswith("ENTRY "):
            in_entry = True
            depth = ln.count("{") - ln.count("}")
            continue
        if not in_entry:
            continue
        depth += ln.count("{") - ln.count("}")
        if depth <= 0 and "}" in ln:
            break
        m = _INSTR_RE.match(ln)
        if not m:
            continue
        name, type_str, opcode = m.group(1), m.group(2), m.group(3)
        # operands live between the opcode's '(' and the first '),'
        rest = ln[m.end():]
        cut = rest.find(")")
        ops = _OPERAND_RE.findall(rest[:cut if cut >= 0 else None])
        yield name, type_str, opcode, ops


def label_for(dt, dims_str, b2, t):
    """Human label for known flagship shapes (B2 = 2*B concat batch)."""
    if not dims_str:
        return "scalar"
    dims = [int(d) for d in dims_str.split(",")]
    # parameter-like (no batch dim)
    chan = {64: "C64", 128: "C128", 144: "L1mid", 230: "L2mid",
            288: "L2mid*", 256: "C256", 460: "L3mid", 512: "C512",
            921: "L4mid", 45: "stem-mid"}
    if len(dims) == 5 and dims[0] in (b2, b2 // 2):
        c = dims[-1]
        nm = chan.get(c, f"C{c}")
        sz = "x".join(str(d) for d in dims[1:4])
        who = "2B" if dims[0] == b2 else "B"
        return f"act {who} {sz} {nm}"
    if len(dims) == 4 and dims[0] in (b2, b2 // 2):
        return f"act4d {dims}"
    if len(dims) == 2 and dims[0] in (b2, b2 // 2):
        return f"vec {dims[1]}"
    if len(dims) == 5 and dims[0] <= 7:  # conv kernels DHWIO
        return f"param {dims}"
    if len(dims) <= 2:
        return f"small {dims}"
    return f"other {dims}"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--per-chip-bs", type=int, default=64)
    ap.add_argument("--quant", default="",
                    choices=["", "int8", "int8_fixed", "int8_store"])
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--json", default=None)
    ap.add_argument("--dump-hlo", default=None,
                    help="also write the optimized HLO text here")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from cstp_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache("/root/repo/.jax_cache")

    from cstp_tpu.config import Config
    from cstp_tpu.parallel import create_mesh, shard_batch, shard_state
    from cstp_tpu.train.pretrain import (
        create_pretrain_state,
        split_pretrain_step,
    )
    from cstp_tpu.utils import profiling

    profiling.apply_tpu_tuning()
    n_dev = len(jax.devices())
    cfg = Config(model_name="r21d", model_depth=1, sample_duration=16,
                 sample_size=112, batch_size=args.per_chip_bs * n_dev,
                 compute_dtype="bfloat16", mesh_shape=(n_dev, 1),
                 quant=args.quant).finalize()
    mesh = create_mesh(cfg.mesh_shape, cfg.mesh_axes)
    model, state, tx = create_pretrain_state(cfg, jax.random.PRNGKey(0))
    state = shard_state(mesh, state)
    aug, train = split_pretrain_step(model, tx, cfg)
    rng = np.random.default_rng(0)
    b, t = cfg.batch_size, cfg.sample_duration
    batch = shard_batch(mesh, {
        "frames1": rng.integers(0, 255, (b, t, 128, 171, 3)).astype(np.uint8),
        "frames2": rng.integers(0, 255, (b, t, 128, 171, 3)).astype(np.uint8),
        "rot1": rng.integers(0, 4, (b,)).astype(np.int32),
        "rot2": rng.integers(0, 4, (b,)).astype(np.int32),
        "tem": rng.integers(0, 5, (b,)).astype(np.int32),
        "pb": rng.integers(0, 4, (b,)).astype(np.int32),
    })
    vl = aug(jax.random.PRNGKey(1), batch["frames1"], batch["frames2"],
             batch["rot1"], batch["rot2"])
    views_labels = (vl[0], vl[1], vl[2], batch["tem"], batch["pb"],
                    batch["rot1"], batch["rot2"])
    lr = jnp.asarray(0.03, jnp.float32)

    log("lower+compile train program ...")
    compiled = jax.jit(lambda s, v: train(s, v, lr)).lower(
        state, views_labels).compile()
    cost = compiled.cost_analysis()
    if isinstance(cost, (list, tuple)):
        cost = cost[0] if cost else {}
    cost_bytes = float((cost or {}).get("bytes accessed", 0.0))
    hlo = compiled.as_text()
    if args.dump_hlo:
        with open(args.dump_hlo, "w") as f:
            f.write(hlo)
        log(f"wrote HLO -> {args.dump_hlo} ({len(hlo)/1e6:.1f} MB)")

    # --- walk ENTRY: writes (output buffers) + reads (operand buffers) ---
    out_bytes = {}
    groups = defaultdict(lambda: {"writes": 0, "reads": 0, "n": 0,
                                  "ops": defaultdict(int)})
    b2 = 2 * b
    for name, type_str, opcode, ops in parse_entry_instructions(hlo):
        wbytes, shapes = shape_bytes(type_str)
        out_bytes[name] = wbytes
        if opcode in ("parameter", "constant", "tuple", "get-tuple-element",
                      "bitcast"):
            continue
        rbytes = sum(out_bytes.get(o, 0) for o in ops)
        for dt, dims in shapes or [("?", "")]:
            key = (dt, dims)
            g = groups[key]
            # attribute the full instruction read/write to each component
            # shape proportionally by size
            comp, _ = shape_bytes(f"{dt}[{dims}]")
            frac = comp / max(wbytes, 1)
            g["writes"] += comp
            g["reads"] += int(rbytes * frac)
            g["n"] += 1
            g["ops"][opcode] += 1

    rows = []
    for (dt, dims), g in groups.items():
        rows.append({
            "dtype": dt, "shape": dims,
            "label": label_for(dt, dims, b2, t),
            "writes_gb": g["writes"] / 1e9,
            "reads_gb": g["reads"] / 1e9,
            "total_gb": (g["writes"] + g["reads"]) / 1e9,
            "n": g["n"], "ops": dict(g["ops"]),
        })
    rows.sort(key=lambda r: -r["total_gb"])
    tot_w = sum(r["writes_gb"] for r in rows)
    tot_r = sum(r["reads_gb"] for r in rows)
    print(f"{'total GB':>9} {'write':>8} {'read':>8} {'n':>5}  "
          f"{'dtype':6} label / shape")
    for r in rows[:args.top]:
        print(f"{r['total_gb']:9.2f} {r['writes_gb']:8.2f} "
              f"{r['reads_gb']:8.2f} {r['n']:5}  {r['dtype']:6} "
              f"{r['label']}  [{r['shape']}]")
    shown = sum(r["total_gb"] for r in rows[:args.top])
    alltot = tot_w + tot_r
    print(f"-- top {args.top}: {shown:.1f} GB of {alltot:.1f} GB walked "
          f"({100*shown/max(alltot,1e-9):.1f}%)")
    print(f"-- HLO-walk total: writes {tot_w:.1f} + reads {tot_r:.1f} "
          f"= {alltot:.1f} GB; XLA cost analysis: {cost_bytes/1e9:.1f} GB")
    if args.json:
        with open(args.json, "w") as f:
            json.dump({"rows": rows, "cost_bytes_gb": cost_bytes / 1e9,
                       "walk_total_gb": alltot, "batch": b}, f, indent=1)
        log(f"wrote {args.json}")


if __name__ == "__main__":
    main()
