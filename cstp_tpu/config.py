"""Config/flag system.

Reproduces the reference flag surface (``opts.py:4-245`` in the reference
repo) as a typed dataclass with argparse round-tripping, plus TPU-specific
knobs the reference has no equivalent for (mesh shape, dtype policy).

Unlike the reference — which mutates the argparse namespace at runtime
(``utils.py:98`` divides batch_size in place, ``main_byol.py:187``
synthesizes ``arch``) — ``Config`` is immutable after ``finalize()``.
"""

from __future__ import annotations

import argparse
import dataclasses
import json
from dataclasses import dataclass, field
from typing import List, Optional, Tuple


@dataclass
class Config:
    # ---- datasets (reference opts.py:7-46) ----
    frame_dir: str = "dataset/UCF101/"
    annotation_path: str = "dataset/UCF101_labels"
    dataset: str = "UCF101"
    split: str = "1"
    modality: str = "RGB"
    input_channels: int = 3
    n_classes: int = 101
    n_finetune_classes: int = 101

    # ---- model (opts.py:49-104) ----
    model_name: str = "r21d_byol"
    model_depth: int = 1
    resnet_shortcut: str = "B"
    ft_begin_index: int = 0
    sample_size: int = 112
    sample_duration: int = 16
    batch_size: int = 32          # GLOBAL batch (reference divides by world_size)
    n_workers: int = 4
    pretrained_path: str = ""
    test_md_path: str = ""
    resume_md_path: str = ""

    # ---- optimizer (opts.py:107-146) ----
    learning_rate: float = 3e-4
    momentum: float = 0.9
    # reference --dampening defaults 0.9 but is never passed to SGD
    # (main_byol.py:229-232); effective torch default is 0. Here the flag is
    # real, so the default matches the reference's EFFECTIVE behavior.
    dampening: float = 0.0
    weight_decay: float = 1e-4
    nesterov: bool = False
    # 2x lr on biases (reference models/pace/params_settings.py:7-28 —
    # defined but unused by the reference mains; real here when enabled)
    double_bias_lr: bool = False
    optimizer: str = "sgd"
    lr_patience: int = 10
    n_epochs: int = 400

    # ---- logging / misc (opts.py:149-242) ----
    result_path: str = "results"
    manual_seed: int = 1
    task: str = "loss_com"        # loss_com/r_byol/ft_fc/ft_all/scratch/test/resume
    temperature: float = 0.5
    lr_decay: float = 1e-4
    sync_bn: int = 1
    clip_grad_norm: int = 1
    clip_grad_value: float = 18.0  # reference hard-codes 18 (main_byol.py:89)
    pb_rate: int = 4
    # SlowFast knobs (reference opts.py:176-184, orphaned flags of the
    # deleted train_slowfast.py — rebuilt here; docs/SLOWFAST.md):
    # tau = slow-pathway temporal stride over raw frames; alpha = fast/slow
    # frame-rate ratio (the loader stride for slowfast models is tau//alpha
    # and the model subsamples the slow pathway as fast[::alpha]).
    tau: int = 8
    alpha: int = 4
    # transform_mode/input_size/output_feat are accepted for reference CLI
    # compatibility but are vestigial THERE too (never read on live paths;
    # orphans of the deleted contrastive-era train.py — SURVEY §2.5)
    transform_mode: str = "img"
    input_size: int = 320
    output_feat: int = 128
    norm_method: str = "tf"
    loss_weight: Tuple[float, ...] = (0.1, 1.0, 1.0, 1.0, 1.0)
    t_ft_task: str = ""
    sc_type: str = "B"
    lmdb_path: str = ""
    steps_per_epoch: int = 0       # 0 = derive from dataset length
    cls_bn: bool = True
    legacy_pace: int = 0           # bare 'r21d' ft: CE over the 512-d pace
    # Projector output, the reference's live dispatch (models/model.py:41-43)
    i3d_conv_head: int = 0         # i3d ft: the reference's internal
    # AvgPool(2,7,7)+conv(7,1,1) classifier (i3d_byol.py:295-306) instead of
    # the generic L2norm/BN/linear head — requires sample_size 224

    # ---- TPU-native knobs (no reference equivalent) ----
    mesh_shape: Tuple[int, ...] = (-1, 1)   # (data, model); -1 = all remaining
    mesh_axes: Tuple[str, ...] = ("data", "model")
    compute_dtype: str = "bfloat16"         # conv/matmul compute dtype
    param_dtype: str = "float32"
    byol_momentum: float = 0.996            # EMA m (r21d_byol.py:263)
    prefetch_depth: int = 2
    log_every: int = 1                      # per-step console print period (0=off)
    profile_dir: str = ""                   # capture an xprof trace here
    profile_steps: int = 5                  # steps to trace (first epoch)
    tb_dir: str = ""                        # TensorBoard scalars here (rank 0;
                                            # dependency-free event writer,
                                            # utils/tb.py) — CSVs stay the
                                            # parity format
    ckpt_every_epochs: int = 100            # reference: epoch % 100 (main_byol.py:132)
    device_augment: bool = True             # fused on-device aug vs host PIL path
    ntxent_weight: float = 0.0              # >0 adds NT-Xent(temperature) with
                                            # global in-batch negatives
    s2d_stem: bool = False                  # s3d space-to-depth stem
                                            # (ref s3d_g.py:280-287)
    pallas_augment: str = "auto"            # fused aug kernel: auto|on|off
    tpu_vmem_limit_kib: int = 65536         # scoped-vmem compiler budget
                                            # (+5% measured, PERF.md round 3;
                                            # 0 = leave libtpu default)
    shard_opt_state: int = 0                # ZeRO-1: shard optimizer state
                                            # over 'data' (arXiv:2004.13336)
    shard_spatial: int = 0                  # spatial partitioning: shard
                                            # activation H over 'model' (the
                                            # SP analog for video CNNs; conv
                                            # halo exchange via GSPMD) — for
                                            # long-clip/224² configs whose
                                            # per-sample activations exceed
                                            # one chip (parallel/mesh.py)
    ema_ref_batch: int = 0                  # >0: scale byol_momentum for the
                                            # actual global batch as m**(B/ref)
                                            # ("How to Scale Your EMA",
                                            # arXiv:2307.13813) — e.g. 128 =
                                            # the reference Kinetics batch
    remat: bool = False                     # rematerialize residual stages
    remat_policy: str = ""                  # '' | 'bnrelu' selective remat:
    # recompute only tagged BN/ReLU activations in backward (r21d)
                                            # (activation HBM -> recompute;
                                            # enables larger per-chip batch)
    concat_views: int = 1                   # 1: towers run both views as one
                                            # 2B call (grouped per-view BN);
                                            # 0: reference per-view calls
    tf_i3d_ckpt: str = ""                   # kinetics-i3d TF ckpt to import
                                            # (ref i3d_byol.py:428-586)
    data_echo: int = 1                      # data echoing factor (each host
                                            # batch trains N steps; on-device
                                            # aug makes echoes distinct —
                                            # arXiv:1907.05550)
    grad_accum: int = 1                     # microbatch gradient accumulation:
                                            # each step scans N microbatches
                                            # (per-microbatch BN stats = the
                                            # reference's per-GPU/per-call
                                            # semantics), averages grads, and
                                            # applies ONE optimizer update —
                                            # reproduces the reference's
                                            # 128-global-batch recipe on fewer
                                            # chips without the activation HBM
    auto_resume: bool = False               # restart from the newest ckpt in
                                            # the run dir (preemption-safe
                                            # launches; ref has no recovery)
    graceful_preempt: int = 1               # SIGTERM -> finish the current
                                            # step, save save_{E}, stop (0=off;
                                            # multi-host stops all hosts at the
                                            # same step via the jax
                                            # coordination service —
                                            # utils/preemption.py)
    data_backend: str = "framedir"          # framedir | packed | lmdb | video | synthetic
    synthetic_len: int = 256                # synthetic dataset size
    synthetic_learnable: int = 0            # 1 = class-conditional content
                                            # (long-horizon learning runs)
    fused_conv: int = 0                     # Pallas-fused (2+1)D stride-1
                                            # blocks (ops/pallas/conv21d.py)
    retrieval_clips: int = 10               # task 'retrieval': max sliding
                                            # windows averaged per video
                                            # (CSTP paper's nearest-neighbor
                                            # video-retrieval protocol; the
                                            # reference repo ships no script
                                            # for it)
    mid_round: int = 1                      # round r21d factorized mid
    t_fold: int = 0                         # T-folded spatial convs + folded
                                            # BN/ReLU (r21d; PERF.md r3 combo)
    quant: str = ""                         # '' | int8 | int8_fixed:
                                            # quantized fwd convs; int8_store:
                                            # s8 STORAGE chain (BN folded into
                                            # dequant epilogue, s8 residuals);
                                            # int8_static/int8_calib:
                                            # eval/serve only (ops/quant.py)
    quant_scope: str = "all"                # 'all' | 'target': which towers
                                            # quantize (pretrain only)
                                            # channels to multiples of N
                                            # (128 = TPU lane width) — an
                                            # explicit TPU model variant;
                                            # changes parameter shapes (see
                                            # layers.r21d_intermediate_channels)

    # Bare model names that dispatch to LEGACY contrastive variants in the
    # reference (models/model.py:41-43 -> models/pace/{r21d,c3d,r3d}.py,
    # s3d_g.py) — deliberately not rebuilt (PARITY.md "Known deviations").
    _LEGACY_BARE_NAMES = ("r21d", "c3d", "r3d", "s3d")

    def warn_if_legacy_model_name(self) -> None:
        """Loud CLI-time warning when a bare legacy name is used: in the
        reference, bare 'r21d'/'c3d'/'s3d'/'r3d' select the LEGACY pace
        contrastive variants (models/model.py:41-43), which this framework
        deliberately does not rebuild. Called from ``parse_opts`` (the
        migration surface) — programmatic Config construction is this
        repo's own idiom and stays silent."""
        if self.model_name in self._LEGACY_BARE_NAMES:
            import warnings

            warnings.warn(
                f"--model_name {self.model_name!r}: in the reference this "
                "bare name selects the LEGACY pace contrastive variant "
                f"(models/pace/{'s3d_g' if self.model_name == 's3d' else self.model_name}.py), which this framework "
                "deliberately does not rebuild by default (see PARITY.md "
                f"'Known deviations'). Building the {self.model_name}_byol-"
                "family model instead; its 10x-scaled BYOL loss is "
                "expressible as --loss_weight 10 1 1 1 1. The reference's "
                "live bare-'r21d' finetune behavior (CE over a 512-d "
                "Projector output, models/model.py:41-43) is available with "
                "--legacy_pace 1.",
                stacklevel=2,
            )

    # tasks whose driver step TRAINS (vs test/retrieval, which are
    # eval-mode forwards); used by the finalize() quant-mode guards
    _TRAIN_TASKS = ("loss_com", "r_byol", "ft_fc", "ft_all", "scratch",
                    "resume")

    def finalize(self) -> "Config":
        """Validate and derive fields; returns self for chaining.

        Flag-COMBINATION validation is centralized here (VERDICT r4 #8):
        with 81 flags and several documented-negative interactions, an
        invalid combo must die at parse time with a message naming both
        flags — not after a 15-minute tunnel compile. The step-construction
        guards (`train/pretrain.py _check_trainable_quant`,
        `ops/quant.py check_int8_calibrated`, `serve/quantize.py`) stay as
        defense in depth for programmatically-built configs that skip
        finalize. Platform-dependent checks (``--pallas_augment on`` off
        TPU) remain runtime-only — the backend is unknown at parse time.
        """
        assert self.task in (
            "loss_com", "r_byol", "ft_fc", "ft_all", "scratch", "test",
            "resume", "retrieval",
        ), f"unknown task {self.task}"
        assert self.optimizer in ("sgd", "adam", "adamw")
        if isinstance(self.loss_weight, (int, float)):
            self.loss_weight = (float(self.loss_weight),) * 5
        self.loss_weight = tuple(float(w) for w in self.loss_weight)
        assert len(self.loss_weight) == 5, "loss_weight must be 5 floats"
        assert self.grad_accum >= 1, "--grad_accum must be >= 1"

        if (self.quant in ("int8_static", "int8_calib")
                and self.task in self._TRAIN_TASKS):
            raise ValueError(
                f"--quant {self.quant} is an eval/serve/calibration mode "
                f"and --train_task/--t_ft_task {self.task} drives a "
                "TRAINING step: int8_static would quantize against "
                "zero-initialized act_scale stats (every activation clips "
                "to ~0) and int8_calib mutates batch_stats the train step "
                "does not declare. Use --quant '' / int8 / int8_fixed for "
                "training (train/pretrain.py _check_trainable_quant).")
        if self.quant in ("int8_store", "int8_store_fz"):
            if not self.model_name.startswith("r21d"):
                raise ValueError(
                    f"--quant {self.quant} is implemented for the r21d "
                    f"factorized chain only; --model_name {self.model_name} "
                    "would silently degrade it to dynamic per-tensor int8. "
                    "Use --quant int8/int8_fixed for other families.")
            for flag in ("s2d_stem", "t_fold", "fused_conv"):
                if getattr(self, flag):
                    raise ValueError(
                        f"--quant {self.quant} and --{flag} rewrite the "
                        "same factorized (2+1)D chain and are exclusive "
                        "(models/layers.py SpatioTemporalConv).")
        if self.fused_conv and self.quant:
            raise ValueError(
                "--fused_conv with --quant {0}: the Pallas-fused stride-1 "
                "blocks always run FLOAT, so only the stem/downsample convs "
                "would quantize — a silent partial quantization (the "
                "failure class ADVICE r3/r4 guards exist to prevent). "
                "Drop one of the two flags.".format(self.quant))
        if self.fused_conv and self.t_fold:
            raise ValueError(
                "--fused_conv and --t_fold are conflicting rewrites of the "
                "factorized conv chain: the fused kernel needs the 5-D "
                "NDHWC activation the fold collapses. Pick one.")
        if self.shard_spatial:
            axes = tuple(self.mesh_axes)
            if "model" not in axes:
                raise ValueError(
                    "--shard_spatial 1 needs a 'model' mesh axis "
                    f"(--mesh_axes {axes} has none) — it would silently "
                    "be a no-op.")
            m = tuple(self.mesh_shape)[axes.index("model")]
            if m != -1 and m <= 1:
                raise ValueError(
                    f"--shard_spatial 1 with --mesh_shape {self.mesh_shape}"
                    ": the 'model' axis has size 1, so spatial "
                    "partitioning would silently be a no-op. Use e.g. "
                    "--mesh_shape -1 2.")
        if self.batch_size % self.grad_accum:
            raise ValueError(
                f"--batch_size {self.batch_size} is not divisible by "
                f"--grad_accum {self.grad_accum} (train/pretrain.py "
                "_microbatches needs equal microbatches).")
        return self

    @property
    def arch(self) -> str:
        # reference synthesizes '{model_name}-{model_depth}' (main_byol.py:187)
        return f"{self.model_name}-{self.model_depth}"

    @property
    def clip_stride(self) -> int:
        """Finetune/test frame-sampling stride: ``pb_rate`` normally; for
        slowfast models the FAST pathway's stride ``tau // alpha`` (the
        slow pathway's stride-tau frames are the model-side subsample
        fast[::alpha] — models/slowfast.py)."""
        if self.model_name.startswith("slowfast"):
            return max(1, self.tau // self.alpha)
        return self.pb_rate

    def to_json(self) -> str:
        return json.dumps(dataclasses.asdict(self), indent=2, default=str)

    @classmethod
    def from_json(cls, s: str) -> "Config":
        d = json.loads(s)
        known = {f.name for f in dataclasses.fields(cls)}
        d = {k: v for k, v in d.items() if k in known}
        for k in ("loss_weight", "mesh_shape", "mesh_axes"):
            if k in d and isinstance(d[k], list):
                d[k] = tuple(d[k])
        return cls(**d).finalize()


def _add_args(parser: argparse.ArgumentParser) -> None:
    """Flag surface mirroring reference opts.py names exactly."""
    c = Config()
    parser.add_argument("--frame_dir", default=c.frame_dir, type=str)
    parser.add_argument("--annotation_path", default=c.annotation_path, type=str)
    parser.add_argument("--dataset", default=c.dataset, type=str)
    parser.add_argument("--split", default=c.split, type=str)
    parser.add_argument("--modality", default=c.modality, type=str)
    parser.add_argument("--input_channels", default=c.input_channels, type=int)
    parser.add_argument("--n_classes", default=c.n_classes, type=int)
    parser.add_argument("--n_finetune_classes", default=c.n_finetune_classes, type=int)
    parser.add_argument("--model_name", default=c.model_name, type=str)
    parser.add_argument("--model_depth", default=c.model_depth, type=int)
    parser.add_argument("--resnet_shortcut", default=c.resnet_shortcut, type=str)
    parser.add_argument("--ft_begin_index", default=c.ft_begin_index, type=int)
    parser.add_argument("--sample_size", default=c.sample_size, type=int)
    parser.add_argument("--sample_duration", default=c.sample_duration, type=int)
    parser.add_argument("--batch_size", default=c.batch_size, type=int)
    parser.add_argument("--n_workers", default=c.n_workers, type=int)
    parser.add_argument("--pretrained_path", default=c.pretrained_path, type=str)
    parser.add_argument("--test_md_path", default=c.test_md_path, type=str)
    parser.add_argument("--resume_md_path", default=c.resume_md_path, type=str)
    parser.add_argument("--learning_rate", default=c.learning_rate, type=float)
    parser.add_argument("--momentum", default=c.momentum, type=float)
    parser.add_argument("--dampening", default=c.dampening, type=float)
    parser.add_argument("--weight_decay", default=c.weight_decay, type=float)
    parser.add_argument("--nesterov", action="store_true")
    parser.add_argument("--double_bias_lr", action="store_true")
    parser.add_argument("--remat", action="store_true")
    parser.add_argument("--remat_policy", default=c.remat_policy,
                        choices=["", "bnrelu"])
    parser.add_argument("--concat_views", default=c.concat_views, type=int)
    parser.add_argument("--optimizer", default=c.optimizer, type=str)
    parser.add_argument("--lr_patience", default=c.lr_patience, type=int)
    parser.add_argument("--n_epochs", default=c.n_epochs, type=int)
    parser.add_argument("--result_path", default=c.result_path, type=str)
    parser.add_argument("--manual_seed", default=c.manual_seed, type=int)
    parser.add_argument("--task", default=c.task, type=str)
    parser.add_argument("--temperature", default=c.temperature, type=float)
    parser.add_argument("--lr_decay", default=c.lr_decay, type=float)
    parser.add_argument("--sync_bn", default=c.sync_bn, type=int)
    parser.add_argument("--clip_grad_norm", default=c.clip_grad_norm, type=int)
    parser.add_argument("--pb_rate", default=c.pb_rate, type=int)
    parser.add_argument("--tau", default=c.tau, type=int,
                        help="slowfast: slow-path temporal stride")
    parser.add_argument("--alpha", default=c.alpha, type=int,
                        help="slowfast: fast/slow frame-rate ratio")
    parser.add_argument("--transform_mode", default=c.transform_mode, type=str)
    parser.add_argument("--input_size", default=c.input_size, type=int)
    parser.add_argument("--output_feat", default=c.output_feat, type=int)
    parser.add_argument("--norm_method", default=c.norm_method, type=str)
    parser.add_argument("--loss_weight", default=list(c.loss_weight), nargs="+", type=float)
    parser.add_argument("--t_ft_task", default=c.t_ft_task, type=str)
    parser.add_argument("--sc_type", default=c.sc_type, type=str)
    parser.add_argument("--lmdb_path", default=c.lmdb_path, type=str)
    parser.add_argument("--steps_per_epoch", default=c.steps_per_epoch, type=int)
    # TPU-native
    parser.add_argument("--mesh_shape", default=list(c.mesh_shape), nargs="+", type=int)
    parser.add_argument("--compute_dtype", default=c.compute_dtype, type=str)
    parser.add_argument("--byol_momentum", default=c.byol_momentum, type=float)
    parser.add_argument("--data_backend", default=c.data_backend, type=str)
    parser.add_argument("--synthetic_len", default=c.synthetic_len, type=int)
    parser.add_argument("--synthetic_learnable", default=c.synthetic_learnable,
                        type=int)
    parser.add_argument("--fused_conv", default=c.fused_conv, type=int)
    parser.add_argument("--mid_round", default=c.mid_round, type=int)
    parser.add_argument("--t_fold", default=c.t_fold, type=int)
    parser.add_argument("--quant", default=c.quant,
                        choices=["", "int8", "int8_fixed", "int8_static",
                                 "int8_calib", "int8_store", "int8_store_fz"])
    parser.add_argument("--quant_scope", default=c.quant_scope,
                        choices=["all", "target"])
    parser.add_argument("--legacy_pace", default=c.legacy_pace, type=int)
    parser.add_argument("--i3d_conv_head", default=c.i3d_conv_head, type=int)
    parser.add_argument("--ckpt_every_epochs", default=c.ckpt_every_epochs, type=int)
    parser.add_argument("--log_every", default=c.log_every, type=int)
    parser.add_argument("--profile_dir", default=c.profile_dir, type=str)
    parser.add_argument("--tb_dir", default=c.tb_dir, type=str)
    parser.add_argument("--profile_steps", default=c.profile_steps, type=int)
    parser.add_argument("--ntxent_weight", default=c.ntxent_weight, type=float)
    parser.add_argument("--s2d_stem", action="store_true")
    parser.add_argument("--pallas_augment", default=c.pallas_augment,
                        choices=["auto", "on", "off"])
    parser.add_argument("--tpu_vmem_limit_kib", default=c.tpu_vmem_limit_kib,
                        type=int)
    parser.add_argument("--ema_ref_batch", default=c.ema_ref_batch, type=int)
    parser.add_argument("--shard_opt_state", default=c.shard_opt_state,
                        type=int)
    parser.add_argument("--shard_spatial", default=c.shard_spatial, type=int)
    parser.add_argument("--tf_i3d_ckpt", default=c.tf_i3d_ckpt, type=str)
    parser.add_argument("--data_echo", default=c.data_echo, type=int)
    parser.add_argument("--grad_accum", default=c.grad_accum, type=int)
    parser.add_argument("--auto_resume", action="store_true")
    parser.add_argument("--graceful_preempt", default=c.graceful_preempt,
                        type=int)
    parser.add_argument("--retrieval_clips", default=c.retrieval_clips,
                        type=int)


def parse_opts(argv: Optional[List[str]] = None) -> Config:
    """Reference-parity entry: ``parse_opts()`` -> Config (opts.py:4)."""
    parser = argparse.ArgumentParser(description="cstp_tpu")
    _add_args(parser)
    ns = parser.parse_args(argv)
    d = vars(ns)
    d["loss_weight"] = tuple(d["loss_weight"])
    d["mesh_shape"] = tuple(d["mesh_shape"])
    known = {f.name for f in dataclasses.fields(Config)}
    d = {k: v for k, v in d.items() if k in known}
    cfg = Config(**d).finalize()
    cfg.warn_if_legacy_model_name()
    return cfg
