"""Summarize a jax.profiler xprof trace: top HLO ops by self time.

Usage: python perf/analyze_trace.py /tmp/trace_dir [--tool hlo_stats] [--top 30]

Uses the xprof/tensorboard-profile pipeline installed in this image to turn
the raw .xplane.pb capture into per-op statistics (gviz-JSON) — the
per-kernel ground truth behind PERF.md.
"""

import argparse
import glob
import json
import os
import sys


def find_xspaces(trace_dir):
    return sorted(glob.glob(os.path.join(trace_dir, "**", "*.xplane.pb"),
                            recursive=True))


def _rows(data):
    cols = [c["id"] for c in data["cols"]]
    for r in data["rows"]:
        yield {k: (c or {}).get("v") for k, c in zip(cols, r["c"])}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("trace_dir")
    ap.add_argument("--tool", default="hlo_stats")
    ap.add_argument("--top", type=int, default=30)
    ap.add_argument("--by-category", action="store_true",
                    help="aggregate self time by op category (diffable)")
    args = ap.parse_args()

    paths = find_xspaces(args.trace_dir)
    if not paths:
        print(f"no .xplane.pb under {args.trace_dir}", file=sys.stderr)
        return 1
    from xprof.convert import raw_to_tool_data

    data, _ctype = raw_to_tool_data.xspace_to_tool_data(
        [paths[-1]], args.tool + "^", {})
    if isinstance(data, bytes):
        data = data.decode("utf-8", "replace")

    if args.tool == "hlo_stats":
        rows = list(_rows(json.loads(data)))
        rows.sort(key=lambda r: -(r.get("total_self_time") or 0))
        total = sum(r.get("total_self_time") or 0 for r in rows)
        if args.by_category:
            # coarse diffable summary: category x (fwd-ish dtype signature)
            from collections import defaultdict

            cats = defaultdict(float)
            for r in rows:
                t = r.get("total_self_time") or 0
                expr = str(r.get("hlo_op_expression")
                           or r.get("hlo_op_name"))
                sig = str(r.get("category"))
                for marker, tag in (("s8[", "+s8"),
                                    ("= (f32[], bf16[", "+obs"),):
                    if marker in expr:
                        sig += tag
                cats[sig] += t
            for sig, t in sorted(cats.items(), key=lambda kv: -kv[1]):
                print(f"{t:12.1f} {100*t/total:6.2f}  {sig}")
            print(f"-- {total/1e3:.2f} ms total device self time")
            return 0
        print(f"{'self us':>12} {'%':>6} {'n':>5}  {'category':22} op")
        shown = 0.0
        for r in rows[: args.top]:
            t = r.get("total_self_time") or 0
            shown += t
            cat = str(r.get("category"))[:22]
            name = str(r.get("hlo_op_expression") or r.get("hlo_op_name"))
            print(f"{t:12.1f} {100*t/total:6.2f} {r.get('occurrences', 0):5}"
                  f"  {cat:22} {name[:150]}")
        print(f"-- shown {100*shown/max(total,1e-9):.1f}% of "
              f"{total/1e3:.2f} ms total device self time")
    else:
        print(data[:20000])
    return 0


if __name__ == "__main__":
    sys.exit(main())
