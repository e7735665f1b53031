"""int8_static serving gate — the two legs round 4 dropped (VERDICT r4 #3):
retrieval R@{1,5,10,20,50} deltas and calibration-batch sensitivity at
calib_batches in {1, 8, 64}, over the full synthetic test/train chain on a
finetuned (learning-harness) checkpoint.

COMPILE-FRUGAL redesign of perf/int8_serving_gate.py: the tunneled dev chip
pays minutes per program and the persistent cache does not serialize axon
executables, so the stock script's per-chain model rebuilds (~16 programs)
are unaffordable. This version compiles exactly FIVE programs:

  1. one int8_calib observe program, run ONCE over 64 train batches with
     act_scale snapshots taken after batch 1, 8 and 64 (running-max
     calibration is prefix-monotone, so the three snapshot trees are
     byte-identical to three separate 1/8/64-batch calibrations on the
     same stream);
  2. one float logits program + 3. one float features program;
  4. one int8_static logits program + 5. one int8_static features program —
     reused across all three calib points by swapping ONLY the weights
     (batch_stats act_scales), which never recompiles.

Every window batch is padded to ONE bucket (16) so per-video length
variation cannot trigger extra compiles; padding is sliced off the results.
top-1 is computed from the per-window logits exactly as run_test does
(mean logits -> argmax; reference test.py:78-97) and R@k via
train/finetune.py retrieval_recalls on per-video mean features exactly as
run_retrieval does (paper Table-4 protocol).

Writes --out incrementally after every chain.

Usage (TPU, after perf/long_horizon.py):
  python perf/int8_gate_full.py \
      --ckpt results/long_horizon/ft/UCF101/ft_all/save_N_max
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BUCKET = 16


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", required=True, help="finetuned FLOAT checkpoint")
    ap.add_argument("--n_classes", type=int, default=10)
    ap.add_argument("--calib", default="1,8,64")
    ap.add_argument("--sample_duration", type=int, default=16)
    ap.add_argument("--sample_size", type=int, default=112)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--out", default="results/int8_serving_gate_full.json")
    ap.add_argument("--synthetic_len", type=int, default=256)
    ap.add_argument("--resume", action="store_true",
                    help="reuse completed rows from --out and the float "
                         "logit cache (--out + '.float_logits.npz') — "
                         "chains already present are skipped, so a killed "
                         "run only repays the programs it still needs")
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from cstp_tpu.augment.pipeline import eval_augment_batch
    from cstp_tpu.ckpt import checkpoint as ckpt_lib
    from cstp_tpu.config import Config
    from cstp_tpu.train.finetune import (
        create_classify_model,
        create_finetune_state,
        make_features_step,
        make_logits_step,
        retrieval_recalls,
        sliding_window_indices,
    )
    from cstp_tpu.train.loops import build_dataset
    from cstp_tpu.parallel.mesh import honor_platform_env
    from cstp_tpu.utils import profiling
    from cstp_tpu.utils.cache import enable_persistent_cache

    honor_platform_env()  # JAX_PLATFORMS=cpu smoke runs must win over axon
    enable_persistent_cache()
    profiling.apply_tpu_tuning()

    calib_points = [int(x) for x in args.calib.split(",")]
    base = Config(
        model_name="r21d", model_depth=1,
        sample_duration=args.sample_duration, sample_size=args.sample_size,
        compute_dtype=args.dtype, n_classes=args.n_classes,
        n_finetune_classes=args.n_classes, data_backend="synthetic",
        synthetic_len=args.synthetic_len, synthetic_learnable=1, pb_rate=2,
        task="test", t_ft_task="ft_all", test_md_path=args.ckpt,
        result_path="results/int8_gate_runs",
    ).finalize()

    # ---- checkpoint ------------------------------------------------------
    fstate_model, fstate, _ = create_finetune_state(
        base, jax.random.PRNGKey(base.manual_seed), args.n_classes)
    tree, _ = ckpt_lib.restore_checkpoint(
        args.ckpt, {"params": fstate.params,
                    "batch_stats": fstate.batch_stats})
    params = tree["params"]
    float_bstats = tree["batch_stats"]

    # ---- datasets --------------------------------------------------------
    test_ds = build_dataset(base, "test")
    train_ds = build_dataset(base, "train")

    def pad16(frames):
        n = frames.shape[0]
        b = -(-n // BUCKET) * BUCKET
        if b != n:
            frames = np.concatenate(
                [frames, np.repeat(frames[-1:], b - n, axis=0)], axis=0)
        return frames, n

    def video_windows(ds, i, max_windows=0):
        nframes, label = ds.video_meta(i)
        win = sliding_window_indices(nframes, base.sample_duration,
                                     base.clip_stride,
                                     max_windows=max_windows)
        return np.stack([ds.read_frames(i, w) for w in win]), label

    # ---- 1. single-pass calibration with prefix snapshots ----------------
    print("== calibration pass (one program, snapshots at "
          f"{calib_points}) ==", flush=True)
    calib_model = create_classify_model(
        dataclasses.replace(base, quant="int8_calib").finalize(),
        args.n_classes)

    # the calib/int8 models carry act_scale batch_stats the FLOAT checkpoint
    # lacks — build the full tree abstractly (eval_shape: no compile) and
    # merge the checkpoint's values over it, leaving act_scales at zero
    var_sds = jax.eval_shape(
        lambda k, a: calib_model.init(k, a, train=False),
        jax.random.PRNGKey(0),
        jax.ShapeDtypeStruct(
            (2, base.sample_duration, base.sample_size, base.sample_size, 3),
            jnp.dtype(base.compute_dtype)))

    def merge(sds, src):
        if isinstance(sds, dict):
            return {k: merge(v, src.get(k) if isinstance(src, dict) else None)
                    for k, v in sds.items()}
        if src is not None:
            return np.asarray(src)
        return np.zeros(sds.shape, sds.dtype)

    float_bstats = merge(var_sds["batch_stats"], float_bstats)

    @jax.jit
    def observe(bstats, frames):
        x = eval_augment_batch(frames, sample_size=base.sample_size,
                               norm_method=base.norm_method).astype(
            jnp.dtype(base.compute_dtype))
        _, mut = calib_model.apply({"params": params, "batch_stats": bstats},
                                   x, train=False, mutable=["batch_stats"])
        return mut["batch_stats"]

    rng = np.random.default_rng(0)
    bstats_c = jax.device_put(float_bstats)
    snapshots = {}
    cb = 8  # calibration batch size (matches serve/quantize.py default)
    for b_i in range(max(calib_points)):
        vid = int(rng.integers(0, train_ds.num_videos()))
        frames, _ = video_windows(train_ds, vid, max_windows=cb)
        frames, _n = pad16(frames)
        bstats_c = observe(bstats_c, jnp.asarray(frames[:cb]))
        if (b_i + 1) in calib_points:
            snapshots[b_i + 1] = jax.device_get(bstats_c)
            print(f"  snapshot at {b_i + 1} batches", flush=True)

    # ---- 2-5. logits + features programs, float and int8 ----------------
    report = {"ckpt": args.ckpt, "protocol": {
        "top1": "mean window logits argmax (test.py:78-97)",
        "recalls": "R@k cosine, query=test gallery=train (paper Table-4)",
        "calib": f"single-stream prefix snapshots at {calib_points}, "
                 f"batch {cb}"},
        "rows": []}
    cache = args.out + ".float_logits.npz"
    if args.resume and os.path.exists(args.out):
        with open(args.out) as f:
            report["rows"] = [r for r in json.load(f).get("rows", [])]
        print(f"resume: {[r['tag'] for r in report['rows']]} present",
              flush=True)

    def find_row(tag):
        return next((r for r in report["rows"] if r["tag"] == tag), None)

    def dump():
        os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
        with open(args.out, "w") as f:
            json.dump(report, f, indent=1)

    def chain(tag, model, bstats):
        st = fstate.replace(params=params, batch_stats=bstats)
        logits_fn = make_logits_step(model, base)
        feats_fn = make_features_step(model, base)

        lg, labels = [], []
        for i in range(test_ds.num_videos()):
            frames, label = video_windows(test_ds, i)
            frames, n = pad16(frames)
            lg.append(np.asarray(
                logits_fn(st, jnp.asarray(frames)))[:n].astype(np.float32))
            labels.append(label)
        labels = np.asarray(labels)
        pred = np.asarray([x.mean(0).argmax() for x in lg])
        top1 = float(np.mean(pred == labels))

        def split_feats(ds):
            F, L = [], []
            for i in range(ds.num_videos()):
                frames, label = video_windows(
                    ds, i, max_windows=base.retrieval_clips)
                frames, n = pad16(frames)
                f = np.asarray(feats_fn(st, jnp.asarray(frames)))[:n]
                v = f.mean(0)
                F.append(v / (np.linalg.norm(v) + 1e-12))
                L.append(label)
            return np.stack(F).astype(np.float32), np.asarray(L)

        qf, ql = split_feats(test_ds)
        gf, gl = split_feats(train_ds)
        recalls = retrieval_recalls(qf, ql, gf, gl)
        row = {"tag": tag, "top1": top1, "n_videos": len(labels),
               "n_windows": int(sum(x.shape[0] for x in lg)),
               "recalls": {k: float(v) for k, v in recalls.items()
                           if k.startswith("R@")}}
        return row, lg

    frow = find_row("float") if args.resume else None
    if frow is not None and os.path.exists(cache):
        fcat = np.load(cache)["logits"]
        print("== float chain: resumed from cache ==", flush=True)
    else:
        print("== float chain ==", flush=True)
        frow, flg = chain("float", fstate_model, float_bstats)
        report["rows"] = [r for r in report["rows"] if r["tag"] != "float"]
        report["rows"].insert(0, frow)
        fcat = np.concatenate(flg, axis=0)
        np.savez_compressed(cache, logits=fcat)
        dump()
        print(json.dumps(frow, indent=1), flush=True)
    fstd = float(fcat.std())

    q_model = create_classify_model(
        dataclasses.replace(base, quant="int8_static").finalize(),
        args.n_classes)
    for nb in calib_points:
        if args.resume and find_row(f"int8_static(c{nb})") is not None:
            print(f"== int8_static chain (calib {nb}): resumed ==",
                  flush=True)
            continue
        print(f"== int8_static chain (calib {nb}) ==", flush=True)
        row, qlg = chain(f"int8_static(c{nb})", q_model, snapshots[nb])
        qcat = np.concatenate(qlg, axis=0)
        err = np.abs(qcat - fcat)
        row["logit_err"] = {
            "corr": float(np.corrcoef(qcat.ravel(), fcat.ravel())[0, 1]),
            "mae_over_std": float(err.mean() / fstd),
            "p99_over_std": float(np.percentile(err, 99) / fstd),
            "max_over_std": float(err.max() / fstd),
            "win_top1_agree": float((qcat.argmax(1) == fcat.argmax(1)).mean()),
        }
        row["top1_delta"] = row["top1"] - frow["top1"]
        row["recall_delta"] = {k: row["recalls"][k] - frow["recalls"][k]
                               for k in row["recalls"]}
        report["rows"].append(row)
        dump()
        print(json.dumps(row, indent=1), flush=True)

    # docs/SERVING.md table
    ks = list(frow["recalls"].keys())
    print("\n| config | top-1 | Δtop-1 | " + " | ".join(ks)
          + " | logit corr | MAE/σ | win-top1 agree | windows |")
    print("|" + "---|" * (len(ks) + 6))
    for r in report["rows"]:
        rec = " | ".join(f"{r['recalls'][k]:.3f}" for k in ks)
        if "logit_err" in r:
            le = r["logit_err"]
            extra = (f"{le['corr']:.5f} | {le['mae_over_std']:.4f} | "
                     f"{le['win_top1_agree']:.4f}")
            d = f"{r['top1_delta']:+.4f}"
        else:
            extra, d = "— | — | —", "—"
        print(f"| {r['tag']} | {r['top1']:.4f} | {d} | {rec} | {extra} | "
              f"{r['n_windows']} |")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
