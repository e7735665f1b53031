"""Interim analysis of the 300-step cross-framework parity run.

The torch legs (seeded, bit-deterministic) are complete at 300 steps in
results/long_horizon_parity_partial.json; the jax leg advances in
25-step checkpointed increments (tests/test_torch_parity.py, VERDICT r4
#6). This script compares the FIRST-N prefix of all three legs with the
same envelope math as the test (window-10 smoothed loss-trail drift vs
3x the intra-torch ulp-null; tail-40 pretext accuracies vs
max(3x intra, 0.10)), so a partially-complete jax leg still yields a
quantitative parity verdict at every checkpoint.

Usage: python perf/parity_interim.py [--write]
  --write  update results/long_horizon_parity.json with the prefix
           comparison (tagged "interim_steps") when the envelope passes.
"""

from __future__ import annotations

import argparse
import json
import os

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PARTIAL = os.path.join(ROOT, "results", "long_horizon_parity_partial.json")


def smooth(x, w=10):
    return np.convolve(np.asarray(x, np.float64), np.ones(w) / w, "valid")


def analyze(blob, n=None):
    t1, ulp, jx = blob["torch_t1"], blob["torch_ulp"], blob["jax"]
    n = n or min(t1["done_steps"], ulp["done_steps"], jx["done_steps"])
    sa, sb, sj = (smooth(t1["loss"][:n]), smooth(ulp["loss"][:n]),
                  smooth(jx["loss"][:n]))
    intra = float(np.max(np.abs(sa - sb) / (np.abs(sa) + 1e-6)))
    cross = float(np.max(np.abs(sa - sj) / (np.abs(sa) + 1e-6)))
    bound = max(3.0 * intra, 0.05)
    tail = slice(max(0, n - 40), n)
    accs = {}
    for k in ("acc_spa", "acc_tem", "acc_pb", "acc_rot"):
        fa = float(np.mean(t1[k][tail]))
        fb = float(np.mean(ulp[k][tail]))
        fj = float(np.mean(jx[k][tail]))
        a_intra = abs(fa - fb)
        accs[k] = {"torch": fa, "torch_alt": fb, "jax": fj,
                   "intra": a_intra, "bound": max(3.0 * a_intra, 0.10),
                   "pass": abs(fa - fj) <= max(3.0 * a_intra, 0.10)}
    return {"interim_steps": n, "smoothed_drift": {
        "intra_torch": intra, "cross": cross, "bound": bound,
        "window": 10, "pass": cross <= bound}, "final_accs_last40": accs}


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--write", action="store_true")
    args = ap.parse_args(argv)
    with open(PARTIAL) as f:
        blob = json.load(f)
    rep = analyze(blob)
    rep["config"] = blob.get("config", {})
    print(json.dumps(rep, indent=1))
    ok = rep["smoothed_drift"]["pass"] and all(
        a["pass"] for a in rep["final_accs_last40"].values())
    print("ENVELOPE:", "PASS" if ok else "FAIL",
          f"(at {rep['interim_steps']} of {rep['config'].get('steps')}"
          " steps)")
    if args.write:
        out_path = os.path.join(ROOT, "results",
                                "long_horizon_parity.json")
        with open(out_path) as f:
            out = json.load(f)
        out["prefix_300step_run"] = rep
        with open(out_path, "w") as f:
            json.dump(out, f, indent=1)
        print("wrote", out_path)
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
