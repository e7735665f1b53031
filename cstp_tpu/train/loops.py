"""Host-side epoch loops: pretrain / finetune / video-level test.

These are the runtime equivalents of reference ``main_byol.py:21-140``
(train_BYOL), ``main_ft_mp.py:179-310`` (train/validation) and
``test.py:23-98``, built on the jitted steps. Device work is dispatched
asynchronously; metric scalars are fetched at epoch end.
"""

from __future__ import annotations

import os
import time
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from cstp_tpu import ckpt as ckpt_lib
from cstp_tpu.config import Config
from cstp_tpu.data.loader import (
    FinetuneLoader,
    PretrainLoader,
    prefetch_to_device,
)
from cstp_tpu.parallel import create_mesh, shard_state
from cstp_tpu.train import optim
from cstp_tpu.train.finetune import (
    RETRIEVAL_TOPK,
    create_finetune_state,
    make_eval_step,
    make_features_step,
    make_finetune_step,
    make_logits_step,
    pad_windows_to_bucket,
    retrieval_recalls,
    sliding_window_indices,
)
from cstp_tpu.train.meters import AverageMeter, Logger, StepTimer
from cstp_tpu.train.pretrain import create_pretrain_state, make_pretrain_step
from cstp_tpu.utils import profiling
from cstp_tpu.utils.preemption import PreemptionGuard
from cstp_tpu.utils.tb import maybe_tb_writer


# Reference dataset CLASS names (selected by ``globals()[opts.dataset]``
# reflection, main_byol.py:202-205) -> (data_backend, dataset family).
# Lets the reference's canonical invocations (script/r2p1d/kin400/*.sh:
# ``--dataset Kin400RepreLMDB`` / ``--dataset UcfFineTune``) run unchanged.
REFERENCE_DATASET_ALIASES = {
    # frame-dir readers (datasets.py:22,103,295,418,812,951,1100)
    "UcfBYOLOnline": ("framedir", "UCF101"),
    "UcfBYOLOnlineSelfTrans": ("framedir", "UCF101"),
    "UcfRepre": ("framedir", "UCF101"),
    "UcfRepreBYOL": ("framedir", "UCF101"),
    "UcfRepreBYOLSpPre": ("framedir", "UCF101"),
    "UcfFineTune": ("framedir", "UCF101"),
    "UcfTempTrans": ("framedir", "UCF101"),
    "UCFFTOnline": ("framedir", "UCF101"),
    # LMDB readers (datasets.py:501,649,1263,1411)
    "UCF101RepreLMDB": ("lmdb", "UCF101"),
    "UcfFineTuneLMDB": ("lmdb", "UCF101"),
    "Kin400RepreLMDB": ("lmdb", "Kin400"),
    "Kin400FTOfflineLMDB": ("lmdb", "Kin400"),
    # Kinetics frame-dir / direct-video readers (datasets.py:1574,1724,1825)
    "KINFTOffline": ("framedir", "Kin400"),
    "KINFTOnlineDecord": ("video", "Kin400"),
    "KINFTOnline": ("video", "Kin400"),
}


def resolve_dataset_alias(config: Config) -> Config:
    """If ``--dataset`` is a reference dataset class name, derive the backend
    and dataset family from it (overriding ``--data_backend``)."""
    alias = REFERENCE_DATASET_ALIASES.get(config.dataset)
    if alias is None:
        return config
    backend, family = alias
    import dataclasses

    return dataclasses.replace(config, data_backend=backend, dataset=family)


def build_dataset(config: Config, data_type: str):
    config = resolve_dataset_alias(config)
    if config.data_backend == "synthetic":
        from cstp_tpu.data.synthetic import SyntheticVideoDataset

        return SyntheticVideoDataset(
            n_videos=config.synthetic_len, n_classes=config.n_classes,
            ingest_hw=(128, 171),
            learnable=bool(config.synthetic_learnable),
        )
    if config.data_backend == "framedir":
        from cstp_tpu.data.framedir import FrameDirDataset

        return FrameDirDataset(
            config.frame_dir, config.annotation_path, config.split,
            data_type=data_type,
        )
    if config.data_backend == "lmdb":
        from cstp_tpu.data.lmdb_dataset import LMDBVideoDataset

        return LMDBVideoDataset(
            config.lmdb_path, config.annotation_path, dataset=config.dataset,
            data_type=data_type, split=config.split,
        )
    if config.data_backend == "video":
        from cstp_tpu.data.video import VideoDataset

        return VideoDataset(
            config.frame_dir, config.annotation_path, dataset=config.dataset,
            data_type=data_type, split=config.split,
        )
    if config.data_backend == "packed":
        path = config.lmdb_path
        if data_type != "train":
            alt = path.replace("train", "val" if data_type == "val" else "test")
            if os.path.exists(alt):
                path = alt
        try:  # native C++ reader (libjpeg + thread pool), python fallback
            from cstp_tpu.data.native_reader import NativePackedDataset

            return NativePackedDataset(path, n_threads=config.n_workers)
        except Exception:
            from cstp_tpu.data.packed import PackedDataset

            return PackedDataset(path)
    raise ValueError(f"unknown data_backend {config.data_backend!r}")


def _log_dir(config: Config) -> str:
    # reference layout: result_path/dataset/task (main_byol.py:177). On
    # resume, keep writing where the original run did (logger append mode,
    # utils.py:33-35) — the checkpoint's parent directory.
    if config.task == "resume" and config.resume_md_path:
        return os.path.dirname(os.path.abspath(config.resume_md_path))
    d = os.path.join(config.result_path, config.dataset, config.task)
    os.makedirs(d, exist_ok=True)
    _dump_config(config, d)
    return d


def _dump_config(config: Config, log_dir: str) -> None:
    """Reproducibility record: the fully-resolved flag surface as JSON in
    the run dir (the reference keeps no record of a run's flags; recovering
    them from shell history is a known failure mode of its script-driven
    configs, script/r2p1d/*)."""
    if jax.process_index() != 0:
        return
    import dataclasses
    import json

    try:
        d = dataclasses.asdict(config)
        with open(os.path.join(log_dir, "config.json"), "w") as f:
            json.dump(d, f, indent=1, sort_keys=True, default=str)
    except OSError:
        pass  # read-only result dir: the record is best-effort


def run_pretrain(config: Config, max_steps_per_epoch: int = 0) -> Dict:
    """Pretrain driver (reference main_byol.py main_worker + train_BYOL)."""
    assert config.task in ("loss_com", "r_byol", "resume")
    profiling.apply_tpu_tuning(config.tpu_vmem_limit_kib)
    if config.steps_per_epoch and not max_steps_per_epoch:
        max_steps_per_epoch = config.steps_per_epoch
    mesh = create_mesh(config.mesh_shape, config.mesh_axes)
    dataset = build_dataset(config, "train")
    per_host_batch = config.batch_size // jax.process_count()
    loader = PretrainLoader(
        dataset, per_host_batch, config.sample_duration,
        seed=config.manual_seed, num_workers=config.n_workers,
        process_index=jax.process_index(), process_count=jax.process_count(),
        echo=config.data_echo,
    )
    rng = jax.random.PRNGKey(config.manual_seed)
    model, state, tx = create_pretrain_state(config, rng)
    if config.tf_i3d_ckpt:
        # kinetics-i3d Sonnet checkpoint into BOTH towers (the reference
        # loads the TF weights into the I3D base that seeds online+target)
        from cstp_tpu.models.i3d_tf_import import load_tf_i3d

        params, stats = state.params, state.batch_stats
        for tower in ("online_net", "target_net"):
            params, stats = load_tf_i3d(params, stats, config.tf_i3d_ckpt,
                                        backbone_path=(tower,))
        state = state.replace(params=params, batch_stats=stats)
    step_fn = make_pretrain_step(model, tx, config)

    log_dir = _log_dir(config)
    begin_epoch = 1
    resume_from = None
    if config.task == "resume":
        resume_from = config.resume_md_path
    elif config.auto_resume:
        # preemption recovery (the reference has none — SURVEY §5): pick up
        # the newest save_{E} in the run directory, if any
        resume_from = ckpt_lib.latest_checkpoint(log_dir)
    if resume_from:
        begin_epoch = ckpt_lib.epoch_from_name(resume_from)
        tree, meta = ckpt_lib.restore_checkpoint(
            resume_from,
            {"params": state.params, "batch_stats": state.batch_stats,
             "opt_state": state.opt_state, "step": state.step},
        )
        assert meta["arch"] == config.arch, (meta["arch"], config.arch)
        state = state.replace(
            params=tree["params"], batch_stats=tree["batch_stats"],
            opt_state=tree["opt_state"], step=jnp.asarray(tree["step"]),
        )
    state = shard_state(mesh, state, zero_opt=bool(config.shard_opt_state))

    logger = Logger(
        os.path.join(
            log_dir,
            f"{config.dataset}_train_clip{config.sample_duration}"
            f"model{config.model_name}{config.model_depth}.log",
        ),
        ["epoch", "loss", "loss_byol", "loss_pred_spa", "loss_pred_tem",
         "loss_pred_pb", "loss_pred_rot", "acc", "lr"],
        overlay=resume_from is None,
    )
    lr_fn = optim.cosine_warmup_restarts(
        config.learning_rate, config.n_epochs, 0.5 * config.n_epochs,
        min_lr=1e-5, gamma=0.5,
    )
    tb = maybe_tb_writer(config.tb_dir, "pretrain")
    key = jax.random.PRNGKey(config.manual_seed + 17)
    history = []
    n_batches = len(loader)
    tracing = False
    # SIGTERM -> finish the current step, save save_{epoch}, stop; resume
    # redoes the interrupted epoch (same filename->epoch semantics as the
    # reference's resume, main_byol.py:215)
    guard = PreemptionGuard(enabled=bool(config.graceful_preempt))
    global_step = 0
    preempted = False
    for epoch in range(begin_epoch, config.n_epochs + 1):
        lr = jnp.asarray(lr_fn(epoch - 1), jnp.float32)
        timer = StepTimer()
        step_meters = {
            k: AverageMeter()
            for k in ("loss", "loss_byol", "loss_pred_spa", "loss_pred_tem",
                      "loss_pred_pb", "loss_pred_rot")
        }
        epoch_metrics = []
        it = prefetch_to_device(loader.epoch(epoch), mesh,
                                depth=config.prefetch_depth)
        for i, batch in enumerate(it):
            timer.data_tick()
            # opt-in profiler capture of a few steady-state steps
            # (SURVEY §5 rebuild requirement; reference has none)
            if (config.profile_dir and epoch == begin_epoch and i == 2
                    and jax.process_index() == 0):
                jax.profiler.start_trace(config.profile_dir)
                tracing = True
            key, sub = jax.random.split(key)
            state, metrics = step_fn(state, sub, batch, lr)
            epoch_metrics.append(metrics)
            timer.batch_tick()
            if tracing and i + 1 >= 2 + config.profile_steps:
                jax.block_until_ready(metrics["loss"])
                jax.profiler.stop_trace()
                tracing = False
            if (config.log_every and (i + 1) % config.log_every == 0
                    and jax.process_index() == 0):
                # reference per-step console line (main_byol.py:93-117);
                # fetching here syncs, so log_every trades visibility
                # against dispatch pipelining
                m = jax.device_get(metrics)
                for k, meter in step_meters.items():
                    meter.update(float(m[k]))
                if tb:  # already-fetched scalars — no extra device sync
                    tb.add_scalars(
                        {k: float(m[k]) for k in step_meters},
                        (epoch - 1) * n_batches + i + 1, prefix="step/")
                lt, lb = step_meters["loss"], step_meters["loss_byol"]
                print(
                    f"Epoch: [{epoch}][{i + 1}/{n_batches}]\t"
                    f"Time {timer.batch_time.val:.3f} ({timer.batch_time.avg:.3f})\t"
                    f"Data {timer.data_time.val:.3f} ({timer.data_time.avg:.3f})\t"
                    f"Loss_byol {lb.val:.4f} ({lb.avg:.4f})\t"
                    f"Loss_pred_spa {step_meters['loss_pred_spa'].val:.4f}\t"
                    f"Loss_pred_tem {step_meters['loss_pred_tem'].val:.4f}\t"
                    f"Loss_pred_pb {step_meters['loss_pred_pb'].val:.4f}\t"
                    f"Loss_pred_rot {step_meters['loss_pred_rot'].val:.4f}\t"
                    f"Loss_total {lt.val:.4f} ({lt.avg:.4f})\t"
                    f"Lr {float(lr):.4}",
                    flush=True,
                )
            global_step += 1
            if guard.requested(global_step):
                preempted = True
                break
            if max_steps_per_epoch and i + 1 >= max_steps_per_epoch:
                break
        if tracing:  # short epoch: close the trace cleanly
            jax.profiler.stop_trace()
            tracing = False
        fetched = jax.device_get(epoch_metrics)
        avg = {
            k: float(np.mean([m[k] for m in fetched])) for k in fetched[0]
        } if fetched else {}
        row = {
            "epoch": epoch,
            "loss": avg.get("loss"),
            "loss_byol": avg.get("loss_byol"),
            "loss_pred_spa": avg.get("loss_pred_spa"),
            "loss_pred_tem": avg.get("loss_pred_tem"),
            "loss_pred_pb": avg.get("loss_pred_pb"),
            "loss_pred_rot": avg.get("loss_pred_rot"),
            "acc": avg.get("acc_pretext"),
            "lr": float(f"{float(lr):.5f}"),
        }
        # a preempted epoch's means cover only the completed steps: keep the
        # partial row in the in-memory history (callers/tests see it) but NOT
        # in the CSV/TB — resume redoes this epoch and appends its full-epoch
        # row, and the append-mode Logger would otherwise leave a duplicate,
        # biased row for the same epoch (the finetune loop already discards
        # partial-epoch stats the same way)
        if jax.process_index() == 0 and not preempted:
            logger.log(row)
            if tb:
                tb.add_scalars({k: v for k, v in row.items() if k != "epoch"},
                               epoch, prefix="epoch/")
                tb.flush()
        history.append(row)
        if preempted:
            if jax.process_index() == 0:
                ckpt_lib.save_checkpoint(
                    os.path.join(log_dir, ckpt_lib.ckpt_name(epoch)),
                    {"params": state.params, "batch_stats": state.batch_stats,
                     "opt_state": state.opt_state, "step": state.step},
                    meta={"arch": config.arch, "epoch": epoch,
                          "preempted": True},
                )
                print(f"Preempted at epoch {epoch} step {global_step}: "
                      f"checkpoint saved; relaunch with --auto_resume "
                      f"(or --task resume) to continue", flush=True)
            break
        if jax.process_index() == 0 and epoch % config.ckpt_every_epochs == 0:
            ckpt_lib.save_checkpoint(
                os.path.join(log_dir, ckpt_lib.ckpt_name(epoch)),
                {"params": state.params, "batch_stats": state.batch_stats,
                 "opt_state": state.opt_state, "step": state.step},
                meta={"arch": config.arch, "epoch": epoch + 1},
            )
    guard.close()
    if tb:
        tb.close()
    logger.close()
    return {"history": history, "state": state, "model": model,
            "preempted": preempted}


def run_finetune(config: Config, max_steps_per_epoch: int = 0) -> Dict:
    """Finetune driver (reference main_ft_mp.py): per-epoch train + val,
    ReduceLROnPlateau on val loss, best-val-only checkpoint retention."""
    assert config.task in ("ft_fc", "ft_all", "scratch", "resume")
    profiling.apply_tpu_tuning(config.tpu_vmem_limit_kib)
    if config.steps_per_epoch and not max_steps_per_epoch:
        max_steps_per_epoch = config.steps_per_epoch
    mesh = create_mesh(config.mesh_shape, config.mesh_axes)
    train_ds = build_dataset(config, "train")
    val_ds = build_dataset(config, "val")
    per_host_batch = config.batch_size // jax.process_count()
    train_loader = FinetuneLoader(
        train_ds, per_host_batch, config.sample_duration, config.clip_stride,
        train=True, seed=config.manual_seed, num_workers=config.n_workers,
        process_index=jax.process_index(), process_count=jax.process_count(),
    )
    # drop_last=False + pad-and-mask tail batch: every val video counts,
    # like the reference's full-set validation (main_ft_mp.py:247-292)
    val_loader = FinetuneLoader(
        val_ds, per_host_batch, config.sample_duration, config.clip_stride,
        train=False, seed=config.manual_seed, num_workers=config.n_workers,
        drop_last=False,
        process_index=jax.process_index(), process_count=jax.process_count(),
    )
    rng = jax.random.PRNGKey(config.manual_seed)
    num_classes = config.n_finetune_classes or config.n_classes
    model, state, tx = create_finetune_state(config, rng, num_classes)
    if config.tf_i3d_ckpt:
        from cstp_tpu.models.i3d_tf_import import load_tf_i3d

        params, stats = load_tf_i3d(state.params, state.batch_stats,
                                    config.tf_i3d_ckpt,
                                    backbone_path=("online_net",))
        state = state.replace(params=params, batch_stats=stats)

    # load pretrained backbone (partial, by-name; models/model.py:131-134).
    # A reference torch ``save_{E}.pth`` file is accepted directly and
    # name-translated (models/torch_import.py).
    if config.task in ("ft_fc", "ft_all") and config.pretrained_path:
        target = {"params": state.params, "batch_stats": state.batch_stats}
        if os.path.isfile(config.pretrained_path):
            from cstp_tpu.ckpt.checkpoint import _merge_by_name
            from cstp_tpu.models.torch_import import load_torch_checkpoint

            converted, meta = load_torch_checkpoint(
                config.pretrained_path, config.model_name)
            tree = _merge_by_name(target, converted)
        else:
            tree, meta = ckpt_lib.restore_checkpoint(
                config.pretrained_path, target)
        arch = str(meta.get("arch", config.arch))
        assert config.arch in arch or arch in config.arch, (arch, config.arch)
        state = state.replace(params=tree["params"],
                              batch_stats=tree["batch_stats"])

    plateau = optim.ReduceLROnPlateau(lr=config.learning_rate,
                                      patience=config.lr_patience)
    best = {"acc": -1.0, "path": None, "epoch": 0}
    begin_epoch = 1
    if config.task == "resume":
        # restore params/opt/plateau/best from save_{E}_max — the path the
        # reference accepts but never implements (main_ft_mp.py:295-310
        # saves; no ft restore exists). Caller must pass the same
        # --ft_begin_index as the original run (reference semantics:
        # models/model.py:123-128 only overwrites it for ft_fc/ft_all).
        assert config.resume_md_path, "finetune resume needs --resume_md_path"
        tree, meta = ckpt_lib.restore_checkpoint(
            config.resume_md_path,
            {"params": state.params, "batch_stats": state.batch_stats,
             "opt_state": state.opt_state, "step": state.step},
        )
        assert config.arch in str(meta.get("arch", config.arch))
        state = state.replace(
            params=tree["params"], batch_stats=tree["batch_stats"],
            opt_state=tree["opt_state"], step=jnp.asarray(tree["step"]),
        )
        if "plateau" in meta:
            plateau = optim.ReduceLROnPlateau.from_state_dict(meta["plateau"])
        ep = ckpt_lib.epoch_from_name(config.resume_md_path)
        best = {"acc": float(meta.get("best_acc", -1.0)),
                "path": config.resume_md_path, "epoch": ep}
        begin_epoch = int(meta.get("epoch", ep + 1))
    state = shard_state(mesh, state, zero_opt=bool(config.shard_opt_state))

    step_fn = make_finetune_step(model, tx, config)
    eval_fn = make_eval_step(model, config)
    log_dir = _log_dir(config)
    stem = (f"{config.dataset}_clip{config.sample_duration}"
            f"model{config.model_name}{config.model_depth}.log")
    overlay = config.task != "resume"
    train_logger = Logger(os.path.join(log_dir, "train_" + stem),
                          ["epoch", "loss", "acc", "lr"], overlay=overlay)
    val_logger = Logger(os.path.join(log_dir, "val_" + stem),
                        ["epoch", "loss", "acc"], overlay=overlay)
    tb = maybe_tb_writer(config.tb_dir, "finetune")
    key = jax.random.PRNGKey(config.manual_seed + 23)
    history = []
    n_batches = len(train_loader)
    guard = PreemptionGuard(enabled=bool(config.graceful_preempt))
    global_step = 0
    preempted = False
    for epoch in range(begin_epoch, config.n_epochs + 1):
        lr = jnp.asarray(plateau.lr, jnp.float32)
        train_ms = []
        timer = StepTimer()
        loss_m, acc_m = AverageMeter(), AverageMeter()
        it = prefetch_to_device(train_loader.epoch(epoch), mesh,
                                depth=config.prefetch_depth)
        for i, batch in enumerate(it):
            timer.data_tick()
            key, sub = jax.random.split(key)
            state, metrics = step_fn(state, sub, batch, lr)
            train_ms.append(metrics)
            timer.batch_tick()
            if (config.log_every and (i + 1) % config.log_every == 0
                    and jax.process_index() == 0):
                # reference per-step line incl. the ETA-days estimate
                # (main_ft_mp.py:218-234)
                m = jax.device_get(metrics)
                loss_m.update(float(m["loss"]))
                acc_m.update(float(m["acc"]))
                left_d = (timer.batch_time.avg
                          * ((config.n_epochs - epoch) * n_batches
                             + n_batches - i - 1)) / 3600 / 24
                print(
                    f"Epoch: [{epoch}][{i + 1}/{n_batches}]\t"
                    f"Time {timer.batch_time.val:.3f} ({timer.batch_time.avg:.3f})\t"
                    f"Data {timer.data_time.val:.3f} ({timer.data_time.avg:.3f})\t"
                    f"Loss {loss_m.val:.4f} ({loss_m.avg:.4f})\t"
                    f"Acc {acc_m.val:.3f} ({acc_m.avg:.3f})\t"
                    f"Lr {plateau.lr:.6f}\t"
                    f"Left {left_d:.1f}d",
                    flush=True,
                )
            global_step += 1
            if guard.requested(global_step):
                preempted = True
                break
            if max_steps_per_epoch and i + 1 >= max_steps_per_epoch:
                break
        val_ms = []
        if not preempted:
            it = prefetch_to_device(val_loader.epoch(epoch), mesh,
                                    depth=config.prefetch_depth)
            for i, batch in enumerate(it):
                val_ms.append(eval_fn(state, batch))
                global_step += 1
                if guard.requested(global_step):
                    preempted = True
                    break
                if max_steps_per_epoch and i + 1 >= max_steps_per_epoch:
                    break
        train_ms = jax.device_get(train_ms)
        val_ms = jax.device_get(val_ms)
        t_loss = float(np.mean([m["loss"] for m in train_ms])) if train_ms else 0.0
        t_acc = float(np.mean([m["acc"] for m in train_ms])) if train_ms else 0.0
        # sum-form aggregation: padded mask-0 rows contribute nothing and
        # every real video contributes exactly once
        v_count = float(np.sum([m["count"] for m in val_ms])) if val_ms else 0.0
        v_loss = (float(np.sum([m["loss_sum"] for m in val_ms])) / v_count
                  if v_count else 0.0)
        v_acc = (float(np.sum([m["correct"] for m in val_ms])) / v_count
                 if v_count else 0.0)
        if preempted:
            # save a RESUMABLE (non-best) checkpoint; meta epoch = this epoch
            # so --task resume redoes the interrupted epoch with the restored
            # plateau/optimizer state. Partial val stats are discarded —
            # best-checkpoint selection only ever sees full-set numbers.
            if jax.process_index() == 0:
                ckpt_lib.save_checkpoint(
                    os.path.join(log_dir, ckpt_lib.ckpt_name(epoch)),
                    {"params": state.params, "batch_stats": state.batch_stats,
                     "opt_state": state.opt_state, "step": state.step},
                    meta={"arch": config.arch, "epoch": epoch,
                          "plateau": plateau.state_dict(),
                          "best_acc": best["acc"], "preempted": True},
                )
                print(f"Preempted at epoch {epoch} step {global_step}: "
                      f"checkpoint saved; relaunch with --task resume "
                      f"--resume_md_path .../{ckpt_lib.ckpt_name(epoch)} to "
                      f"continue", flush=True)
            break
        # plateau stepped on GLOBAL val loss on every host — fixing the
        # reference rank-0-only LR desync (main_ft_mp.py:291-292)
        plateau.step(v_loss)
        if jax.process_index() == 0:
            train_logger.log({"epoch": epoch, "loss": t_loss, "acc": t_acc,
                              "lr": float(f"{plateau.lr:.5f}")})
            val_logger.log({"epoch": epoch, "loss": v_loss, "acc": v_acc})
            if tb:
                tb.add_scalars({"loss": t_loss, "acc": t_acc,
                                "lr": plateau.lr}, epoch, prefix="train/")
                tb.add_scalars({"loss": v_loss, "acc": v_acc}, epoch,
                               prefix="val/")
                tb.flush()
            if v_acc > best["acc"]:  # best-only retention (main_ft_mp.py:295-310)
                if best["path"]:
                    ckpt_lib.delete_checkpoint(best["path"])
                path = os.path.join(log_dir, ckpt_lib.ckpt_name(epoch, best=True))
                ckpt_lib.save_checkpoint(
                    path,
                    {"params": state.params, "batch_stats": state.batch_stats,
                     "opt_state": state.opt_state, "step": state.step},
                    meta={"arch": config.arch, "epoch": epoch + 1,
                          "plateau": plateau.state_dict(),
                          "best_acc": v_acc},
                )
                best = {"acc": v_acc, "path": path, "epoch": epoch}
        history.append({"epoch": epoch, "train_loss": t_loss, "train_acc": t_acc,
                        "val_loss": v_loss, "val_acc": v_acc, "lr": plateau.lr})
    guard.close()
    if tb:
        tb.close()
    train_logger.close()
    val_logger.close()
    return {"history": history, "state": state, "model": model, "best": best,
            "preempted": preempted}


def run_test(config: Config, max_videos: int = 0) -> Dict:
    """Video-level sliding-window test (reference test.py:23-98):
    per video, mean of per-window logits -> top-1/top-5."""
    profiling.apply_tpu_tuning(config.tpu_vmem_limit_kib)
    mesh = create_mesh(config.mesh_shape, config.mesh_axes)
    dataset = build_dataset(config, "test")
    rng = jax.random.PRNGKey(config.manual_seed)
    num_classes = config.n_finetune_classes or config.n_classes
    model, state, _ = create_finetune_state(config, rng, num_classes)

    md_path = config.test_md_path
    if not md_path:
        md_path = ckpt_lib.find_best_checkpoint(
            os.path.join(config.result_path, config.dataset, config.t_ft_task)
        )
    tree, meta = ckpt_lib.restore_checkpoint(
        md_path,
        {"params": state.params, "batch_stats": state.batch_stats},
    )
    assert config.arch == str(meta.get("arch", config.arch))
    if config.quant == "int8_static":
        from cstp_tpu.ops.quant import check_int8_calibrated

        check_int8_calibrated(tree["batch_stats"], "test")
    state = state.replace(params=tree["params"],
                          batch_stats=tree["batch_stats"])
    state = shard_state(mesh, state, zero_opt=bool(config.shard_opt_state))
    logits_fn = make_logits_step(model, config)

    result_dir = os.path.join(config.result_path, config.dataset)
    os.makedirs(result_dir, exist_ok=True)
    report = os.path.join(
        result_dir,
        f"test_{config.model_name}{config.model_depth}_{config.dataset}_"
        f"{config.split}_{config.modality}_{config.sample_duration}_plusone.txt",
    )
    n = dataset.num_videos()
    if max_videos:
        n = min(n, max_videos)
    # human-readable class names when annotation_path ships classInd.txt
    # (reference datasets.py:201-203; id = file order)
    from cstp_tpu.data.labels import read_class_names

    names = read_class_names(config.annotation_path)

    def nm(c):
        return (f" ({names[c]})" if names and 0 <= c < len(names) else "")

    correct = 0
    lines = []
    for i in range(n):
        nframes, label = dataset.video_meta(i)
        windows = sliding_window_indices(nframes, config.sample_duration,
                                         config.clip_stride)
        frames = np.stack([dataset.read_frames(i, w) for w in windows])
        # pad to a window-count bucket: one compile per bucket, not per
        # distinct video length
        padded, n_real = pad_windows_to_bucket(frames)
        logits = np.asarray(logits_fn(state, jnp.asarray(padded)))[:n_real]
        mean_logits = logits.mean(axis=0)
        pred5 = np.argsort(-mean_logits)[:5]
        correct += int(pred5[0] == label)
        acc = correct / (i + 1)
        lines.append(
            f"Video[{i}]:\ttop5 = {pred5}\ttop1 = {pred5[0]}{nm(pred5[0])}"
            f"\tgt = {label}{nm(label)}\tacc = {acc}"
        )
    acc = correct / max(n, 1)
    with open(report, "w+") as f:
        f.write(str(config.to_json()) + "\n")
        f.write("\n".join(lines) + "\n")
        f.write("Video accuracy = " + str(acc) + "\n")
    return {"accuracy": acc, "report": report, "n_videos": n}


def _extract_video_features(dataset, config: Config, state, feats_fn,
                            max_videos: int = 0):
    """Per-video retrieval descriptor: mean of L2-normalized sliding-window
    backbone features (<= config.retrieval_clips windows), renormalized."""
    n = dataset.num_videos()
    if max_videos:
        n = min(n, max_videos)
    feats, labels = [], np.zeros(n, np.int64)
    for i in range(n):
        nframes, label = dataset.video_meta(i)
        windows = sliding_window_indices(nframes, config.sample_duration,
                                         config.clip_stride,
                                         max_windows=config.retrieval_clips)
        frames = np.stack([dataset.read_frames(i, w) for w in windows])
        padded, n_real = pad_windows_to_bucket(frames)
        f = np.asarray(feats_fn(state, jnp.asarray(padded)))[:n_real]
        v = f.mean(axis=0)
        feats.append(v / (np.linalg.norm(v) + 1e-12))
        labels[i] = label
    return np.stack(feats).astype(np.float32), labels


def run_retrieval(config: Config, max_videos: int = 0) -> Dict:
    """Nearest-neighbor video retrieval (task ``retrieval``): the CSTP
    paper's R@{1,5,10,20,50} protocol — test-split clips query the
    train-split gallery by cosine similarity of backbone features; a query
    counts at k if any of its k nearest train videos shares its class.
    The reference repo publishes these numbers but ships no script.

    Checkpoint resolution: ``--pretrained_path`` (a pretrain/BYOL
    checkpoint, partial by-name load — the usual protocol evaluates the
    self-supervised features directly; reference ``save_{E}.pth`` files are
    name-translated) else ``--test_md_path`` else the auto-discovered
    ``*_max`` finetune checkpoint (test.py:50-55 semantics)."""
    profiling.apply_tpu_tuning(config.tpu_vmem_limit_kib)
    create_mesh(config.mesh_shape, config.mesh_axes)
    rng = jax.random.PRNGKey(config.manual_seed)
    num_classes = config.n_finetune_classes or config.n_classes
    model, state, _ = create_finetune_state(config, rng, num_classes)

    target = {"params": state.params, "batch_stats": state.batch_stats}
    if config.pretrained_path:
        if os.path.isfile(config.pretrained_path):
            from cstp_tpu.ckpt.checkpoint import _merge_by_name
            from cstp_tpu.models.torch_import import load_torch_checkpoint

            converted, _ = load_torch_checkpoint(
                config.pretrained_path, config.model_name)
            tree = _merge_by_name(target, converted)
        else:
            tree, _ = ckpt_lib.restore_checkpoint(config.pretrained_path,
                                                  target)
    else:
        md_path = config.test_md_path or ckpt_lib.find_best_checkpoint(
            os.path.join(config.result_path, config.dataset,
                         config.t_ft_task or "ft_all"))
        tree, meta = ckpt_lib.restore_checkpoint(md_path, target)
        assert config.arch == str(meta.get("arch", config.arch))
    if config.quant == "int8_static":
        from cstp_tpu.ops.quant import check_int8_calibrated

        check_int8_calibrated(tree["batch_stats"], "retrieval")
    state = state.replace(params=tree["params"],
                          batch_stats=tree["batch_stats"])

    feats_fn = make_features_step(model, config)
    gallery_ds = build_dataset(config, "train")
    query_ds = build_dataset(config, "test")
    g_feats, g_labels = _extract_video_features(gallery_ds, config, state,
                                                feats_fn, max_videos)
    q_feats, q_labels = _extract_video_features(query_ds, config, state,
                                                feats_fn, max_videos)
    recalls, hit1 = retrieval_recalls(q_feats, q_labels, g_feats, g_labels,
                                      RETRIEVAL_TOPK, return_per_query=True)

    result_dir = os.path.join(config.result_path, config.dataset)
    os.makedirs(result_dir, exist_ok=True)
    report = os.path.join(
        result_dir,
        f"retrieval_{config.model_name}{config.model_depth}_{config.dataset}_"
        f"{config.split}_{config.sample_duration}.txt",
    )
    with open(report, "w+") as f:
        f.write(str(config.to_json()) + "\n")
        f.write(f"gallery = {len(g_labels)} train videos, "
                f"queries = {len(q_labels)} test videos\n")
        for k, v in recalls.items():
            f.write(f"{k} = {v}\n")
        # per-class R@1 with human-readable names when annotation_path
        # ships classInd.txt (reference datasets.py:201-203)
        from cstp_tpu.data.labels import read_class_names

        names = read_class_names(config.annotation_path)
        if names:
            for c in sorted(set(int(x) for x in q_labels)):
                mask = q_labels == c
                nm = names[c] if 0 <= c < len(names) else "?"
                f.write(f"R@1[{c} {nm}] = {hit1[mask].mean():.4f} "
                        f"(n={int(mask.sum())})\n")
    return {**recalls, "report": report,
            "n_gallery": len(g_labels), "n_queries": len(q_labels)}
