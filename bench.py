"""Pretrain throughput benchmark on real hardware.

Measures the FULL fused pretrain step — on-device CSTP augmentation
(overlap crop + rot90 + jitter/gray/blur/flip + normalize) + BYOL towers +
pretext heads + clipped SGD — at the reference's headline config:
R(2+1)D (layer_sizes 1,1,1,1), 16 frames x 112^2, bf16 compute.

Prints ONE JSON line on stdout:
  {"metric": "pretrain_clips_per_sec_per_chip", "value": N,
   "unit": "samples/s/chip", "vs_baseline": N/2000, ...}

The headline `value` counts dataset SAMPLES (pretrain: clip PAIRS — each
sample pushes 2 clips through 3 towers), matching the reference's
per-sample batch accounting; `clips_per_sec_per_chip` reports the 2x
individual-clip rate. The default pretrain run also appends the serving-
path numbers (`eval_*`/`serve_*` float + int8_static fields) so the
serving win/regressions are visible in the driver artifact (VERDICT r3
#5); disable with --serving-metrics off.

Diagnostics (opt-in, stderr only):
  --breakdown     time the augment and train programs separately
  --cost          XLA cost analysis + roofline/MFU summary (see PERF.md)
  --profile-dir D capture an xprof trace of the timed steps into D
  --per-chip-bs N / --steps N  sweep knobs
"""

import argparse
import json
import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def _fill_act_scales(tree, value=0.05):
    """Set every act_scale leaf to a nonzero constant: bench has no
    calibrated checkpoint, and the static-quantize cost is identical for
    any nonzero scalar (one fused divide) — only timing matters here. Real
    serving calibrates (serve/quantize.py); uncalibrated int8_static on the
    REAL restore paths is refused (ops/quant.py check_int8_calibrated)."""
    import jax.numpy as jnp

    out = {}
    for k, v in tree.items():
        if k == "act_scale":
            out[k] = jnp.full_like(v, value)
        elif isinstance(v, dict):
            out[k] = _fill_act_scales(v, value)
        else:
            out[k] = v
    return out


def _measure_serving(n_dev, per_chip_bs=64, steps=8, warmup=2):
    """eval (live jit) and serve (AOT artifact) clips/s/chip, float and
    int8_static, at the bench flagship config — the VERDICT r3 #5 fields.
    Same measurement discipline as the standalone modes: one DISTINCT
    pre-staged batch per step (tunnel memoization) and a scalar-sum chain
    (block_until_ready is unreliable through the relay)."""
    import time

    import jax
    import jax.numpy as jnp
    import numpy as np

    from cstp_tpu.config import Config
    from cstp_tpu.parallel import create_mesh, shard_batch, shard_state
    from cstp_tpu.serve import ServingModel, export_serving_artifact
    from cstp_tpu.train.finetune import create_finetune_state, make_eval_step

    rng = np.random.default_rng(7)
    fields = {}
    for quant in ("", "int8_static"):
        cfg = Config(
            model_name="r21d", model_depth=1, sample_duration=16,
            sample_size=112, batch_size=per_chip_bs * n_dev,
            compute_dtype="bfloat16", mesh_shape=(n_dev, 1), task="test",
            quant=quant,
        ).finalize()
        mesh = create_mesh(cfg.mesh_shape, cfg.mesh_axes)
        model, state, _ = create_finetune_state(
            cfg, jax.random.PRNGKey(0), cfg.n_finetune_classes)
        if quant:
            state = state.replace(
                batch_stats=_fill_act_scales(state.batch_stats))
        state = shard_state(mesh, state)
        b, t, h0, w0 = cfg.batch_size, cfg.sample_duration, 128, 171
        batches = [shard_batch(mesh, {
            "frames": rng.integers(0, 255, (b, t, h0, w0, 3)).astype(np.uint8),
            "labels": np.zeros((b,), np.int32),
        }) for _ in range(steps + warmup)]
        for bt in batches:
            _ = np.asarray(bt["frames"][0, 0, 0, 0, 0])
        tag = "_int8_static" if quant else ""

        estep = make_eval_step(model, cfg)
        tot = jnp.zeros((), jnp.float32)
        for i in range(warmup):
            tot = tot + estep(state, batches[steps + i])["loss_sum"]
        _ = float(tot)
        t0 = time.perf_counter()
        for i in range(steps):
            tot = tot + estep(state, batches[i])["loss_sum"]
        _ = float(tot)
        fields[f"eval{tag}_clips_per_sec_per_chip"] = round(
            b * steps / (time.perf_counter() - t0) / n_dev, 2)

        plat = jax.devices()[0].platform
        canonical = plat in ("cpu", "tpu", "cuda", "rocm")
        art = export_serving_artifact(
            model, state.params, state.batch_stats,
            num_classes=cfg.n_finetune_classes, sample_size=cfg.sample_size,
            sample_duration=cfg.sample_duration, input_hw=(h0, w0),
            platforms=(plat if canonical else "tpu",),
            check_platform=canonical)
        call = ServingModel.load(art)._exported.call
        tot = jnp.zeros((), jnp.float32)
        for i in range(warmup):
            tot = tot + call(batches[steps + i]["frames"]).sum()
        _ = float(tot)
        t0 = time.perf_counter()
        for i in range(steps):
            tot = tot + call(batches[i]["frames"]).sum()
        _ = float(tot)
        fields[f"serve{tag}_clips_per_sec_per_chip"] = round(
            b * steps / (time.perf_counter() - t0) / n_dev, 2)
        del batches, state, model, call, art
    return fields


def main():
    ap = argparse.ArgumentParser()
    # 64 is the measured sweet spot on v5e-16GB: 167 clips/s at 32,
    # 236 at 64; 128 OOMs (needs 17.1G of 15.75G HBM) — PERF.md sweep
    ap.add_argument("--per-chip-bs", type=int, default=64)
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--warmup", type=int, default=3)
    ap.add_argument("--profile-dir", default=None)
    ap.add_argument("--breakdown", action="store_true")
    ap.add_argument("--cost", action="store_true")
    ap.add_argument("--remat", action="store_true",
                    help="remat residual stages (fits larger --per-chip-bs)")
    ap.add_argument("--grad-accum", type=int, default=1,
                    help="microbatch accumulation (fits larger effective "
                         "--per-chip-bs; one optimizer update per step)")
    ap.add_argument("--remat-policy", default="", choices=["", "bnrelu"],
                    help="selective remat: recompute only BN/ReLU in bwd")
    ap.add_argument("--concat-views", type=int, default=1)
    ap.add_argument("--s2d-stem", action="store_true",
                    help="exact space-to-depth stem rewrite (r21d)")
    ap.add_argument("--fused-conv", type=int, default=0, nargs="?", const=1,
                    help="Pallas-fused (2+1)D stride-1 blocks (r21d): "
                         "1 = both towers, 2 = EMA target tower only "
                         "(forward-only, no recompute VJP)")
    ap.add_argument("--t-fold", type=int, default=0,
                    help="T-folded spatial convs + folded BN/ReLU (r21d)")
    ap.add_argument("--quant", default="",
                    choices=["", "int8", "int8_fixed", "int8_static",
                             "int8_store", "int8_store_fz"],
                    help="quantized forward tower convs (ops/quant.py); "
                         "int8_store = s8 STORAGE chain w/ BN folded into "
                         "the dequant epilogue (VERDICT r3 #1)")
    ap.add_argument("--quant-scope", default="all", choices=["all", "target"])
    ap.add_argument("--mid-round", type=int, default=1,
                    help="round r21d factorized mid widths to multiples of N "
                         "(128 = lane width); TPU model variant")
    ap.add_argument("--model", default="r21d",
                    help="backbone family (r21d|c3d|r3d|s3d|i3d)")
    ap.add_argument("--depth", type=int, default=1)
    ap.add_argument("--mode", default="pretrain",
                    choices=["pretrain", "ft", "eval", "serve"],
                    help="ft = supervised finetune step (1 tower + CE); "
                         "eval = inference/serving path (deterministic "
                         "scale+center-crop + eval-mode forward — the "
                         "video-level test step, train/finetune.py "
                         "make_eval_step); serve = the SAME computation "
                         "through the AOT serving artifact (jax.export, "
                         "cstp_tpu/serve) — measures deployment-path "
                         "overhead vs live jit (single chip)")
    ap.add_argument("--e2e", action="store_true",
                    help="sustained loader->prefetch->step throughput: "
                         "drives PretrainLoader over a RAW CSTPack shard "
                         "instead of pre-staged batches (VERDICT r1 #7)")
    ap.add_argument("--e2e-workers", type=int, default=8)
    ap.add_argument("--e2e-videos", type=int, default=128)
    ap.add_argument("--e2e-echo", type=int, default=1,
                    help="data-echoing factor (--data_echo): each host batch "
                         "is stepped N times; on-device augmentation draws "
                         "fresh views per step, and the prefetcher reuses "
                         "the landed device arrays so H2D drops by N too")
    ap.add_argument("--serving-metrics", default="auto",
                    choices=["auto", "on", "off"],
                    help="append eval/serve float+int8_static fields to the "
                         "JSON line (auto = on for the default pretrain "
                         "config, off for sweeps/diagnostics)")
    args = ap.parse_args()
    if args.e2e and args.mode != "pretrain":
        ap.error("--e2e supports --mode pretrain only")

    import jax
    import jax.numpy as jnp

    # persistent compile cache: the fused step takes minutes to compile via
    # the remote-compile tunnel; cache so repeated bench runs pay once.
    # Machine-feature-scoped (utils/cache.py) so a cache written on a
    # different host misses instead of loading mismatched AOT code.
    from cstp_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache("/root/repo/.jax_cache")

    from cstp_tpu.config import Config
    from cstp_tpu.parallel import create_mesh, shard_batch, shard_state
    from cstp_tpu.train.pretrain import create_pretrain_state, make_pretrain_step
    from cstp_tpu.utils import profiling

    # measured-default compiler tuning (PERF.md round 3); an externally-set
    # LIBTPU_INIT_ARGS vmem flag (e.g. from perf/sweep_bench.py) wins
    profiling.apply_tpu_tuning()

    n_dev = len(jax.devices())
    per_chip_bs = args.per_chip_bs
    cfg = Config(
        model_name=args.model,
        model_depth=args.depth,
        sample_duration=16,
        sample_size=112,
        batch_size=per_chip_bs * n_dev,
        compute_dtype="bfloat16",
        mesh_shape=(n_dev, 1),
        # task must match the mode from the FIRST finalize(): eval/serve
        # are eval-mode paths and finalize() rejects eval-only --quant
        # modes on training tasks (VERDICT r4 #8)
        task={"pretrain": "loss_com", "ft": "ft_all"}.get(args.mode, "test"),
        remat=args.remat,
        remat_policy=args.remat_policy,
        concat_views=args.concat_views,
        s2d_stem=args.s2d_stem,
        fused_conv=int(args.fused_conv),
        mid_round=args.mid_round,
        t_fold=args.t_fold,
        quant=args.quant,
        quant_scope=args.quant_scope,
        grad_accum=args.grad_accum,
    ).finalize()

    mesh = create_mesh(cfg.mesh_shape, cfg.mesh_axes)
    rng = np.random.default_rng(0)
    b, t, h0, w0 = cfg.batch_size, cfg.sample_duration, 128, 171
    if args.mode in ("ft", "eval", "serve"):
        import dataclasses

        from cstp_tpu.train.finetune import (
            create_finetune_state,
            make_eval_step,
            make_finetune_step,
        )

        # eval/serve are eval-mode paths — task "test" (finalize() rejects
        # eval-only --quant modes on training tasks, VERDICT r4 #8)
        cfg = dataclasses.replace(
            cfg, task="ft_all" if args.mode == "ft" else "test").finalize()
        model, state, tx = create_finetune_state(
            cfg, jax.random.PRNGKey(0), cfg.n_finetune_classes)
        if args.quant == "int8_static":
            # init-state bench has no calibrated checkpoint: fill the
            # act_scale sites so the quantized program runs non-degenerate
            # numerics (same as _measure_serving)
            state = state.replace(
                batch_stats=_fill_act_scales(state.batch_stats))
        state = shard_state(mesh, state)
        if args.mode == "serve":
            # the deployment path: export the fused augment+forward+weights
            # as a StableHLO artifact and time the DESERIALIZED program.
            # Lower for the live backend's platform; the tunneled dev
            # backend may report a non-canonical name, so map to 'tpu' and
            # drop the call-time platform check in that case.
            from cstp_tpu.serve import ServingModel, export_serving_artifact

            plat = jax.devices()[0].platform
            canonical = plat in ("cpu", "tpu", "cuda", "rocm")
            art = export_serving_artifact(
                model, state.params, state.batch_stats,
                num_classes=cfg.n_finetune_classes,
                sample_size=cfg.sample_size,
                sample_duration=cfg.sample_duration, input_hw=(h0, w0),
                platforms=(plat if canonical else "tpu",),
                check_platform=canonical,
            )
            log(f"serve: artifact {len(art)/1e6:.1f} MB "
                f"(platform {'native ' + plat if canonical else 'tpu, check off'})")
            served = ServingModel.load(art)
            step = served
        else:
            step = (make_eval_step(model, cfg) if args.mode == "eval"
                    else make_finetune_step(model, tx, cfg))

        def make_batch():
            return shard_batch(mesh, {
                "frames": rng.integers(0, 255, (b, t, h0, w0, 3)).astype(
                    np.uint8),
                "labels": rng.integers(0, cfg.n_finetune_classes, (b,)).astype(
                    np.int32),
            })
    else:
        model, state, tx = create_pretrain_state(cfg, jax.random.PRNGKey(0))
        state = shard_state(mesh, state)
        step = make_pretrain_step(model, tx, cfg)

        def make_batch():
            return shard_batch(mesh, {
                "frames1": rng.integers(0, 255, (b, t, h0, w0, 3)).astype(np.uint8),
                "frames2": rng.integers(0, 255, (b, t, h0, w0, 3)).astype(np.uint8),
                "rot1": rng.integers(0, 4, (b,)).astype(np.int32),
                "rot2": rng.integers(0, 4, (b,)).astype(np.int32),
                "tem": rng.integers(0, 5, (b,)).astype(np.int32),
                "pb": rng.integers(0, 4, (b,)).astype(np.int32),
            })

    lr = jnp.asarray(0.03, jnp.float32)
    key = jax.random.PRNGKey(1)
    n_steps = args.steps
    # pre-stage per-step RNG keys and a small batch rotation on device and
    # FORCE the transfers: per-step eager ops / lazy H2D through the dev
    # tunnel otherwise leak ~25% into the timed loop (PERF.md measurement
    # notes). Real training overlaps H2D via the loader prefetcher.
    keys = list(jax.device_put(np.asarray(
        jax.random.split(key, n_steps + args.warmup))))
    # eval mode: the state never changes between steps, so the tunnel relay
    # would memoize repeated executions — stage one DISTINCT batch per step
    n_batches = (0 if args.e2e
                 else n_steps + args.warmup
                 if args.mode in ("eval", "serve") else 3)
    batches = [make_batch() for _ in range(n_batches)]
    fkey = "frames1" if args.mode == "pretrain" else "frames"
    for bt in batches:
        _ = np.asarray(bt[fkey][0, 0, 0, 0, 0])
    _ = np.asarray(keys[0])

    if args.e2e:
        # Integrated sustained throughput: host decode (native CSTPack
        # reader) -> PretrainLoader batching -> background prefetch+H2D ->
        # fused device step, all overlapping — the number that answers "can
        # the input pipeline actually feed the chip at the device-only rate"
        # (the reference's data_time meter concern, main_byol.py:29-32).
        import shutil
        import tempfile

        from cstp_tpu.data.loader import PretrainLoader, prefetch_to_device
        from cstp_tpu.data.packed import PackedWriter
        from cstp_tpu.train.loops import build_dataset

        tmpd = tempfile.mkdtemp(prefix="cstp_e2e_")
        try:
            shard = tmpd + "/e2e.cstpack"
            wtr = PackedWriter(shard)
            for i in range(args.e2e_videos):
                wtr.add_video_raw(
                    f"v{i}", i % 5,
                    rng.integers(0, 255, (48, h0, w0, 3)).astype(np.uint8))
            wtr.close()
            dcfg = Config(data_backend="packed", lmdb_path=shard,
                          n_workers=args.e2e_workers).finalize()
            ds = build_dataset(dcfg, "train")
            loader = PretrainLoader(ds, b, cfg.sample_duration,
                                    num_workers=args.e2e_workers,
                                    echo=args.e2e_echo)

            def host_iter(n_batches):
                # bounded: the prefetch worker must exit on its own (a live
                # daemon thread holding device buffers at interpreter exit
                # aborts the runtime)
                ep = got = 0
                while got < n_batches:
                    for bt in loader.epoch(ep):
                        yield bt
                        got += 1
                        if got == n_batches:
                            return
                    ep += 1

            it = prefetch_to_device(
                host_iter(args.warmup + n_steps), mesh, depth=3)
            for i in range(args.warmup):
                state, metrics = step(state, keys[n_steps + i], next(it), lr)
            _ = float(metrics["loss"])
            with profiling.trace(args.profile_dir):
                t0 = time.perf_counter()
                for i in range(n_steps):
                    state, metrics = step(state, keys[i], next(it), lr)
                _ = float(metrics["loss"])
                dt = time.perf_counter() - t0
        finally:
            shutil.rmtree(tmpd, ignore_errors=True)
    elif args.mode == "serve":
        # time the deserialized StableHLO program on pre-staged device
        # batches; scalar-sum chain forces completion (tunnel memoization /
        # unreliable block_until_ready — same discipline as eval mode).
        # _exported.call directly: ServingModel.predict's np.asarray would
        # add a full logits D2H fetch per step to the timed loop.
        call = step._exported.call
        tot = jnp.zeros((), jnp.float32)
        for i in range(args.warmup):
            tot = tot + call(batches[n_steps + i]["frames"]).sum()
        _ = float(tot)
        with profiling.trace(args.profile_dir):
            t0 = time.perf_counter()
            for i in range(n_steps):
                tot = tot + call(batches[i]["frames"]).sum()
            _ = float(tot)
            dt = time.perf_counter() - t0
    elif args.mode == "eval":
        tot = jnp.zeros((), jnp.float32)  # scalar chain = real sync at fetch
        for i in range(args.warmup):
            tot = tot + step(state, batches[n_steps + i])["loss_sum"]
        _ = float(tot)
        with profiling.trace(args.profile_dir):
            t0 = time.perf_counter()
            for i in range(n_steps):
                tot = tot + step(state, batches[i])["loss_sum"]
            _ = float(tot)
            dt = time.perf_counter() - t0
    else:
        for i in range(args.warmup):
            state, metrics = step(state, keys[n_steps + i],
                                  batches[i % len(batches)], lr)
        _ = float(metrics["loss"])  # force completion (block_until_ready can
        # lie through the tunnel relay; a scalar fetch cannot)

        with profiling.trace(args.profile_dir):
            t0 = time.perf_counter()
            for i in range(n_steps):
                state, metrics = step(state, keys[i],
                                      batches[i % len(batches)], lr)
            _ = float(metrics["loss"])
            dt = time.perf_counter() - t0

    clips_per_sec = b * n_steps / dt
    per_chip = clips_per_sec / n_dev
    step_s = dt / n_steps

    if (args.breakdown or args.cost) and args.mode != "pretrain":
        log("note: --breakdown/--cost only apply to --mode pretrain "
            "(the ft step is a single fused program with no augment/train "
            "split to report); ignoring.")
    if (args.breakdown or args.cost) and args.mode == "pretrain":
        from cstp_tpu.train.pretrain import split_pretrain_step
        aug, train = split_pretrain_step(model, tx, cfg)
        bt = make_batch()
        vl = aug(jax.random.fold_in(key, 0), bt["frames1"], bt["frames2"],
                 bt["rot1"], bt["rot2"])
        views_labels = (vl[0], vl[1], vl[2], bt["tem"], bt["pb"],
                        bt["rot1"], bt["rot2"])
        if args.breakdown:
            # aug timing: vary only the key (pre-staged) so nothing is
            # memoized and no eager RPCs land inside the loop
            o = None
            t0 = time.perf_counter()
            for i in range(n_steps):
                o = aug(keys[i], bt["frames1"], bt["frames2"], bt["rot1"],
                        bt["rot2"])
            _ = np.asarray(o[2][0])
            aug_s = (time.perf_counter() - t0) / n_steps
            # train timing: chain state
            st, m = state, None
            t0 = time.perf_counter()
            for i in range(n_steps):
                st, m = train(st, views_labels, lr)
            _ = float(m["loss"])
            train_s = (time.perf_counter() - t0) / n_steps
            log(f"breakdown: step={step_s*1e3:.1f}ms  augment={aug_s*1e3:.1f}ms"
                f"  train={train_s*1e3:.1f}ms  (b={b}, {n_dev} chip(s))")
        if args.cost:
            train_cost = profiling.compiled_cost(
                lambda s, v: train(s, v, lr), state, views_labels)
            aug_cost = profiling.compiled_cost(
                lambda r, f1, f2, r1, r2: aug(r, f1, f2, r1, r2),
                jax.random.fold_in(key, 0), bt["frames1"], bt["frames2"],
                bt["rot1"], bt["rot2"])
            log("train cost:", json.dumps(profiling.summarize(
                train_cost, step_s), default=str, indent=2))
            log("aug cost:", json.dumps(profiling.summarize(
                aug_cost, step_s), default=str, indent=2))

    serving_on = (args.serving_metrics == "on"
                  or (args.serving_metrics == "auto"
                      and args.mode == "pretrain" and not args.e2e
                      and not args.breakdown and not args.cost
                      and args.model == "r21d" and args.depth == 1
                      and not args.quant))
    extra = {}
    if serving_on:
        # free the pretrain program's device buffers before building the
        # eval/serve states (b=64 pretrain + staged batches + eval batches
        # would not co-reside in 16 G HBM)
        if args.mode == "pretrain" and not args.e2e:
            del state, batches, step
        try:
            extra = _measure_serving(n_dev, per_chip_bs=args.per_chip_bs)
        except Exception as e:  # diagnostics must not kill the headline
            log(f"serving-metrics failed: {type(e).__name__}: {e}")

    mode_name = {"ft": "finetune", "eval": "eval",
                 "serve": "serve"}.get(args.mode, "pretrain")
    # Dual accounting (VERDICT r2 #4): the headline `value` counts dataset
    # SAMPLES/s/chip (pretrain: clip PAIRS — each sample pushes 2 clips
    # through 3 tower passes), matching the reference's batch accounting —
    # so `unit` says samples/s/chip (ADVICE r3: value+unit must agree).
    # `clips_per_sec_per_chip` counts individual clips: 2x samples for the
    # two-view pretrain step, == samples for the one-clip ft/eval/serve
    # steps. See BASELINE.md "Metric accounting".
    clips_factor = 2 if args.mode == "pretrain" else 1
    print(json.dumps({
        "metric": f"{mode_name}"
                  f"{'_e2e' if args.e2e else ''}"
                  "_samples_per_sec_per_chip",
        "value": round(per_chip, 2),
        "unit": "samples/s/chip",
        "vs_baseline": round(per_chip / 2000.0, 4),
        "samples_per_sec_per_chip": round(per_chip, 2),
        "clips_per_sec_per_chip": round(per_chip * clips_factor, 2),
        **extra,
    }))


if __name__ == "__main__":
    main()
