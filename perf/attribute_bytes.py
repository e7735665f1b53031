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
import os
import re
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


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
_COMP_RE = re.compile(r"^(?:ENTRY\s+)?%?([\w.\-]+)\s*\([^)]*\)\s*->")
_FUSION_CALLS_RE = re.compile(r"\bfusion\(.*?\bcalls=%([\w.\-]+)")
_OPNAME_RE = re.compile(r'op_name="([^"]+)"')


def parse_module_instructions(hlo_text):
    """Yield (name, type_str, opcode, operand_names, op_name) for every
    instruction in every REAL computation of the module — i.e. excluding
    fusion bodies, whose internals are register/VMEM values that never
    materialize as HBM buffers. While/conditional region bodies DO run
    their instructions and are kept. (Round-4 fix: the original entry-only
    walk missed everything XLA outlined out of ENTRY — on the b=64 train
    step that was 94% of the traffic.)"""
    # pass 1: names of fusion-body computations (referenced by `calls=` on
    # fusion instructions only — while/cond use body=/condition=/branches=)
    fused = set()
    for ln in hlo_text.splitlines():
        m = _FUSION_CALLS_RE.search(ln)
        if m:
            fused.add(m.group(1))
    # pass 2: walk instructions of every non-fusion-body computation
    comp = None
    for ln in hlo_text.splitlines():
        if not ln.strip() or ln.startswith(("HloModule", "//", "#")):
            continue
        # Computation headers: "ENTRY %main.718 (...) -> ... {" or
        # "%region_2.3 (...) -> f32[] {". The ENTRY header's parameter list
        # embeds layouts (braces) and entry_computation_layout text that can
        # contain '=', so detect it by prefix, not by brace heuristics.
        if ln.startswith("ENTRY ") and ln.rstrip().endswith("{"):
            comp = "ENTRY"
            continue
        if ln.rstrip().endswith("{") and "=" not in ln.split("{")[0]:
            m = _COMP_RE.match(ln.strip())
            if m:
                comp = m.group(1)
                continue
        if ln.strip() == "}":
            comp = None
            continue
        if comp is None or comp in fused:
            continue
        m = _INSTR_RE.match(ln)
        if not m:
            continue
        name, type_str, opcode = m.group(1), m.group(2), m.group(3)
        rest = ln[m.end():]
        cut = rest.find(")")
        ops = _OPERAND_RE.findall(rest[:cut if cut >= 0 else None])
        om = _OPNAME_RE.search(ln)
        yield name, type_str, opcode, ops, (om.group(1) if om else "")


def parse_entry_instructions(hlo_text):
    """Back-compat shim: module walk minus the op_name column."""
    for tup in parse_module_instructions(hlo_text):
        yield tup[:4]


# Opcodes whose "output" is an alias/view of existing buffers (or pure
# bookkeeping) — counting them as writes would double-count real traffic.
_NO_MATERIALIZE = {
    "parameter", "constant", "tuple", "get-tuple-element", "bitcast",
    "while", "conditional", "call", "copy-start", "custom-call-start",
    "after-all", "add-dependency", "domain",
}


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
                    choices=["", "int8", "int8_fixed", "int8_store",
                             "int8_store_fz"])
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--json", default=None)
    ap.add_argument("--dump-hlo", default=None,
                    help="also write the optimized HLO text here")
    ap.add_argument("--from-hlo", default=None,
                    help="re-analyze a previously dumped HLO text without "
                         "recompiling (compiles take ~15 min through the "
                         "tunnel); --cost-gb supplies the cost-analysis "
                         "total for the footer")
    ap.add_argument("--cost-gb", type=float, default=0.0)
    args = ap.parse_args()

    if args.from_hlo:
        with open(args.from_hlo) as f:
            hlo = f.read()
        analyze(hlo, args.cost_gb * 1e9, args)
        return

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

    analyze(hlo, cost_bytes, args)


def analyze(hlo, cost_bytes, args):
    b = args.per_chip_bs
    t = 16
    # --- module walk: writes (output buffers) + reads (operand buffers) ---
    out_bytes = {}
    vmem_bytes = 0
    groups = defaultdict(lambda: {"writes": 0, "reads": 0, "n": 0,
                                  "ops": defaultdict(int),
                                  "names": defaultdict(int)})
    b2 = 2 * b
    for name, type_str, opcode, ops, op_name in \
            parse_module_instructions(hlo):
        wbytes, shapes = shape_bytes(type_str)
        out_bytes[name] = wbytes
        if opcode in _NO_MATERIALIZE:
            continue
        # buffers layout-assigned to alternate memory (S(1) = VMEM/SRAM,
        # S(2) = SMEM) never touch HBM — track them separately. Only look
        # inside the TYPE token, not backend_config JSON.
        if (not type_str.startswith("(")
                and ("S(1)" in type_str or "S(2)" in type_str)):
            vmem_bytes += wbytes
            continue
        rbytes = sum(out_bytes.get(o, 0) for o in ops)
        # short layer path from metadata, e.g. ".../layer1/spatial_conv"
        short = "/".join(op_name.split("/")[-3:]) if op_name else ""
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
            if short:
                g["names"][short] += 1

    rows = []
    for (dt, dims), g in groups.items():
        top_names = sorted(g["names"].items(), key=lambda kv: -kv[1])[:3]
        rows.append({
            "dtype": dt, "shape": dims,
            "label": label_for(dt, dims, b2, t),
            "writes_gb": g["writes"] / 1e9,
            "reads_gb": g["reads"] / 1e9,
            "total_gb": (g["writes"] + g["reads"]) / 1e9,
            "n": g["n"], "ops": dict(g["ops"]),
            "top_op_names": [n for n, _ in top_names],
        })
    rows.sort(key=lambda r: -r["total_gb"])
    tot_w = sum(r["writes_gb"] for r in rows)
    tot_r = sum(r["reads_gb"] for r in rows)
    print(f"{'total GB':>9} {'write':>8} {'read':>8} {'n':>5}  "
          f"{'dtype':6} label / shape")
    for r in rows[:args.top]:
        nm = (" <- " + ", ".join(r["top_op_names"])
              if r["top_op_names"] else "")
        print(f"{r['total_gb']:9.2f} {r['writes_gb']:8.2f} "
              f"{r['reads_gb']:8.2f} {r['n']:5}  {r['dtype']:6} "
              f"{r['label']}  [{r['shape']}]{nm}")
    shown = sum(r["total_gb"] for r in rows[:args.top])
    alltot = tot_w + tot_r
    print(f"-- top {args.top}: {shown:.1f} GB of {alltot:.1f} GB walked "
          f"({100*shown/max(alltot,1e-9):.1f}%)")
    print(f"-- HLO-walk total: writes {tot_w:.1f} + reads {tot_r:.1f} "
          f"= {alltot:.1f} GB (+ {vmem_bytes/1e9:.2f} GB in VMEM/SMEM-"
          f"assigned buffers, excluded); XLA cost analysis: "
          f"{cost_bytes/1e9:.1f} GB")
    if args.json:
        with open(args.json, "w") as f:
            json.dump({"rows": rows, "cost_bytes_gb": cost_bytes / 1e9,
                       "walk_total_gb": alltot,
                       "vmem_gb": vmem_bytes / 1e9, "batch": b}, f,
                      indent=1)
        log(f"wrote {args.json}")


if __name__ == "__main__":
    main()
