"""Statistically meaningful int8_static serving accuracy gate (VERDICT r3 #4).

Round 3's gate was a 16-video top-1 equality — too thin to catch real
accuracy shifts. This script compares FLOAT vs --quant int8_static over the
FULL synthetic val/test/retrieval chain (>= 500 clips) on a finetuned
checkpoint, plus per-logit error distributions and calibration-batch
sensitivity:

  1. video-level test top-1 (reference test.py:78-97 protocol), all videos;
  2. retrieval R@{1,5,10,20,50} deltas (query=test gallery=train);
  3. per-window logit error vs float: correlation, MAE/max (normalized to
     the float logit std), window-top-1 agreement rate over >= 500 windows;
  4. all of the above at --calib_batches 1 / 8 / 64.

Writes results/int8_serving_gate.json and prints the docs/SERVING.md table.

Usage (TPU, after a learning-harness run):
  python perf/int8_serving_gate.py \
      --ckpt results/long_horizon/ft/UCF101/ft_all/save_8_max \
      [--n_classes 10] [--calib 1,8,64]
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", required=True, help="finetuned FLOAT checkpoint")
    ap.add_argument("--n_classes", type=int, default=10)
    ap.add_argument("--calib", default="1,8,64")
    ap.add_argument("--sample_duration", type=int, default=16)
    ap.add_argument("--sample_size", type=int, default=112)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--logit_videos", type=int, default=0,
                    help="videos for the logit-error pass (0 = all)")
    ap.add_argument("--out", default="results/int8_serving_gate.json")
    ap.add_argument("--skip_retrieval", action="store_true",
                    help="skip the R@k chains (the retrieval feature "
                         "extraction dominates wall time through the "
                         "tunneled dev chip; top-1 + the per-window logit "
                         "error distribution are the statistically "
                         "meaningful gates)")
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from cstp_tpu.ckpt import checkpoint as ckpt_lib
    from cstp_tpu.config import Config
    from cstp_tpu.serve.quantize import calibrate_checkpoint
    from cstp_tpu.train.finetune import (
        create_finetune_state,
        make_logits_step,
        pad_windows_to_bucket,
        sliding_window_indices,
    )
    from cstp_tpu.train.loops import build_dataset, run_retrieval, run_test
    from cstp_tpu.utils import profiling
    from cstp_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()
    profiling.apply_tpu_tuning()

    base = Config(
        model_name="r21d", model_depth=1,
        sample_duration=args.sample_duration, sample_size=args.sample_size,
        compute_dtype=args.dtype, n_classes=args.n_classes,
        n_finetune_classes=args.n_classes, data_backend="synthetic",
        synthetic_len=256, synthetic_learnable=1, pb_rate=2,
        task="test", t_ft_task="ft_all", test_md_path=args.ckpt,
        result_path="results/int8_gate_runs",
    ).finalize()

    def logits_for(cfg, md_path, max_videos):
        """Per-window logits over the test split: {video: (n_win, C)}."""
        cfg = dataclasses.replace(cfg, test_md_path=md_path).finalize()
        model, state, _ = create_finetune_state(
            cfg, jax.random.PRNGKey(cfg.manual_seed), args.n_classes)
        tree, _ = ckpt_lib.restore_checkpoint(
            md_path, {"params": state.params,
                      "batch_stats": state.batch_stats})
        state = state.replace(params=tree["params"],
                              batch_stats=tree["batch_stats"])
        ds = build_dataset(cfg, "test")
        fn = make_logits_step(model, cfg)
        n = ds.num_videos() if not max_videos else min(max_videos,
                                                      ds.num_videos())
        out, labels = [], []
        for i in range(n):
            nframes, label = ds.video_meta(i)
            win = sliding_window_indices(nframes, cfg.sample_duration,
                                         cfg.clip_stride)
            frames = np.stack([ds.read_frames(i, w) for w in win])
            padded, n_real = pad_windows_to_bucket(frames)
            lg = np.asarray(fn(state, jnp.asarray(padded)))[:n_real]
            out.append(lg.astype(np.float32))
            labels.append(label)
        return out, np.asarray(labels)

    report = {"ckpt": args.ckpt, "rows": []}

    def run_chain(tag, quant, md_path):
        cfg = dataclasses.replace(base, quant=quant,
                                  test_md_path=md_path).finalize()
        test = run_test(cfg)
        if args.skip_retrieval:
            retr = {}
        else:
            rcfg = dataclasses.replace(cfg, task="retrieval").finalize()
            retr = run_retrieval(rcfg)
        lg, labels = logits_for(cfg, md_path, args.logit_videos)
        row = {"tag": tag, "top1": test["accuracy"],
               "n_videos": test["n_videos"],
               "n_windows": int(sum(x.shape[0] for x in lg)),
               "recalls": {k: v for k, v in retr.items()
                           if k.startswith("R@")}}
        return row, lg

    def dump_partial():
        # compiles through the tunnel cost 10+ min per program — write the
        # report after EVERY chain so a timeout never loses finished rows
        os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
        with open(args.out, "w") as f:
            json.dump(report, f, indent=1)

    print("== float chain ==", flush=True)
    frow, flg = run_chain("float", "", args.ckpt)
    report["rows"].append(frow)
    dump_partial()
    fcat = np.concatenate(flg, axis=0)
    fstd = float(fcat.std())

    for nb in [int(x) for x in args.calib.split(",")]:
        print(f"== int8_static calib_batches={nb} ==", flush=True)
        qpath = f"{args.ckpt}_int8_c{nb}"
        calib_cfg = dataclasses.replace(base, quant="").finalize()
        calibrate_checkpoint(calib_cfg, args.ckpt, qpath, n_batches=nb,
                             batch_size=8, data_type="train")
        row, qlg = run_chain(f"int8_static(c{nb})", "int8_static", qpath)
        qcat = np.concatenate(qlg, axis=0)
        err = np.abs(qcat - fcat)
        row["logit_err"] = {
            "corr": float(np.corrcoef(qcat.ravel(), fcat.ravel())[0, 1]),
            "mae_over_std": float(err.mean() / fstd),
            "p99_over_std": float(np.percentile(err, 99) / fstd),
            "max_over_std": float(err.max() / fstd),
            "win_top1_agree": float(
                (qcat.argmax(1) == fcat.argmax(1)).mean()),
        }
        row["top1_delta"] = row["top1"] - frow["top1"]
        row["recall_delta"] = {
            k: row["recalls"][k] - frow["recalls"][k]
            for k in row["recalls"]}
        report["rows"].append(row)
        dump_partial()

    dump_partial()
    print(f"\nwrote {args.out}\n")

    # docs/SERVING.md table
    ks = list(frow["recalls"].keys())
    hdr = ("| config | top-1 | Δtop-1 | " + " | ".join(ks)
           + " | logit corr | MAE/σ | p99/σ | win-top1 agree | windows |")
    print(hdr)
    print("|" + "---|" * (len(ks) + 7))
    for r in report["rows"]:
        rec = " | ".join(f"{r['recalls'][k]:.3f}" for k in ks)
        if "logit_err" in r:
            le = r["logit_err"]
            extra = (f"{le['corr']:.5f} | {le['mae_over_std']:.4f} | "
                     f"{le['p99_over_std']:.4f} | "
                     f"{le['win_top1_agree']:.4f}")
            d = f"{r['top1_delta']:+.4f}"
        else:
            extra, d = "— | — | — | —", "—"
        print(f"| {r['tag']} | {r['top1']:.4f} | {d} | {rec} | {extra} | "
              f"{r['n_windows']} |")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
