"""Pretraining engine: state creation + the fused jitted train step.

One XLA program per step does what the reference spreads over DataLoader
worker processes, CUDA streams, DDP hooks, and the train loop
(``main_byol.py:21-140``):

  uint8 frames ──(on-device CSTP augmentation: overlap crop + rot90 +
  jitter/gray/blur/flip + tf-norm, emitting the spa label)──►
  EMA target update ──► online x2 / predictor / target x2 forwards ──►
  7-term weighted loss ──► global-norm clip 18 ──► SGD(momentum) update.

The batch arrives sharded over the mesh 'data' axis; params are replicated.
XLA inserts the gradient all-reduce (DDP equivalent) and the global-batch BN
reductions over ICI. Metric scalars are global means — the reference's
explicit ``reduce_mean`` all-reduce (main_byol.py:22-26) is implicit here.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct

from cstp_tpu.augment.pipeline import (
    pretrain_augment_batch,
    pretrain_augment_batch_fused,
)
from cstp_tpu.config import Config
from cstp_tpu.ssl.byol import CSTPPretrain, cross_entropy, ema_update
from cstp_tpu.train import optim


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any


def data_shard_count(config: Config) -> int:
    """Size of the mesh 'data' axis implied by ``--mesh_shape`` (resolving
    a -1 entry against the live device count)."""
    shape = list(config.mesh_shape)
    n = jax.device_count()
    known = 1
    for s in shape:
        if s != -1:
            known *= s
    shape = [n // known if s == -1 else s for s in shape]
    return shape[list(config.mesh_axes).index("data")]


def bn_groups_from_config(config: Config) -> int:
    """--sync_bn 0 -> per-replica BN stats: one group per data shard
    (the reference's *effective* per-GPU behavior; its SyncBN never
    actually syncs — models/model.py:86-100). --sync_bn 1 -> 1 group =
    global-batch stats."""
    if config.sync_bn:
        return 1
    return data_shard_count(config)


def effective_byol_momentum(config: Config) -> float:
    """BYOL target-EMA momentum, optionally batch-scaled: with
    ``--ema_ref_batch R`` the momentum becomes ``m ** (B / R)`` so the EMA
    timescale (in samples seen) is preserved when the global batch differs
    from the reference recipe's ("How to Scale Your EMA", arXiv:2307.13813
    scaling rule; reference fixes m=0.996 at B=128, main_byol.py headline
    config)."""
    m = config.byol_momentum
    if config.ema_ref_batch > 0:
        m = float(m ** (config.batch_size / config.ema_ref_batch))
    return m


def create_pretrain_model(config: Config) -> CSTPPretrain:
    return CSTPPretrain(
        backbone=config.model_name,
        depth=config.model_depth,
        dtype=jnp.dtype(config.compute_dtype),
        bn_groups=bn_groups_from_config(config),
        shortcut=config.resnet_shortcut,
        s2d_stem=config.s2d_stem,
        remat=config.remat,
        remat_policy=config.remat_policy,
        concat_views=bool(config.concat_views),
        alpha=config.alpha,
        fused_conv=int(config.fused_conv),
        mid_round=config.mid_round,
        t_fold=bool(config.t_fold),
        quant=config.quant,
        quant_scope=config.quant_scope,
    )


def create_pretrain_state(
    config: Config, rng: jax.Array
) -> Tuple[CSTPPretrain, TrainState, optax.GradientTransformation]:
    model = create_pretrain_model(config)
    t, s = config.sample_duration, config.sample_size
    # init batch must be divisible by the per-replica BN group count
    # (--sync_bn 0 on an N-way data mesh needs >= N samples per view)
    bs = max(2, bn_groups_from_config(config))
    dummy = jnp.zeros((bs, t, s, s, 3), jnp.dtype(config.compute_dtype))
    variables = model.init(rng, dummy, dummy, train=True)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    # Like the reference, online and target towers start from DIFFERENT
    # random inits (torch builds them independently; r21d_byol.py:268-269) —
    # EMA pulls target toward online over training.
    labels = optim.param_labels(params, frozen_prefixes=("target_net",))
    tx = optim.make_optimizer(
        config.optimizer,
        momentum=config.momentum,
        weight_decay=config.weight_decay,
        dampening=config.dampening,
        nesterov=config.nesterov,
        clip_grad_norm=(config.clip_grad_value if config.clip_grad_norm else None),
        labels=labels,
    )
    state = TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=batch_stats,
        opt_state=tx.init(params),
    )
    return model, state, tx


def split_pretrain_step(model: CSTPPretrain, tx, config: Config):
    """The two compiled programs behind :func:`make_pretrain_step`, exposed
    separately for benchmarking/profiling: ``(augment, train)``."""
    return _build_pretrain_programs(model, tx, config)


def _check_trainable_quant(config: Config, context: str) -> None:
    """Reject eval-only --quant modes on the TRAINING steps (ADVICE r3):
    ``int8_static`` would quantize with the zero-initialized act_scale
    batch_stats (every activation clips to ~0) and ``int8_calib`` mutates
    batch_stats in ways the jitted train step does not declare. Both are
    serving/calibration modes; training uses '' / int8 / int8_fixed."""
    if config.quant in ("int8_static", "int8_calib"):
        raise ValueError(
            f"--quant {config.quant} is an eval/serve/calibration mode and "
            f"cannot drive the {context} TRAINING step (see "
            "serve/quantize.py). Use --quant '' (float), int8, or "
            "int8_fixed for training.")
    if (config.quant in ("int8_store", "int8_store_fz")
            and not config.model_name.startswith("r21d")):
        # the s8 STORAGE chain lives in SpatioTemporalConv (the factorized
        # r21d block); on other families Conv3d's startswith('int8') match
        # would silently degrade it to dynamic per-tensor int8
        raise ValueError(
            f"--quant {config.quant} is implemented for the r21d factorized "
            f"chain only; got model '{config.model_name}'. Use --quant int8/"
            "int8_fixed for other families.")


def make_pretrain_step(model: CSTPPretrain, tx, config: Config):
    """Returns step(state, rng, batch, lr) -> (state, metrics).

    ``batch`` dict (leading dim sharded over 'data'):
      frames1, frames2: (B, T, H0, W0, 3) uint8 host-decoded clips
      rot1, rot2:       (B,) int32 rotation labels
      tem, pb:          (B,) int32 temporal-overlap / playback labels
    The spa label is produced by the on-device crop sampler.

    Two XLA programs per step, NOT one: jitting augmentation and train
    together was measured 14x SLOWER end-to-end on v5e (3.2 s/step vs
    230 ms — the merged program's schedule degrades catastrophically),
    while the extra dispatch costs only a few ms. Keep them split;
    ``split_pretrain_step`` exposes them for profiling.
    """
    _check_trainable_quant(config, "pretrain")
    augment, train = _build_pretrain_programs(model, tx, config)

    bootstrap = None
    if config.quant in ("int8_store", "int8_store_fz"):
        # --quant int8_store uses DELAYED activation scales (previous-step
        # running absmax in batch_stats). Seed them with one FLOAT
        # observation pass on the first batch ('int8_store_calib' — same
        # param tree, convs in float, scales observed exactly) so step 0
        # never quantizes against the zero-initialized scales. Idempotent
        # on resume (running-max observation).
        import dataclasses as _dc

        calib_model = create_pretrain_model(
            _dc.replace(config, quant="int8_store_calib"))

        @jax.jit
        def bootstrap(params, batch_stats, v1, v2):
            _, mut = calib_model.apply(
                {"params": params, "batch_stats": batch_stats},
                v1, v2, train=True, mutable=["batch_stats"])
            return mut["batch_stats"]

    pending = {"bootstrap": bootstrap is not None}

    def step(state: TrainState, rng: jax.Array, batch: Dict[str, jnp.ndarray],
             lr: jnp.ndarray):
        v1, v2, spa = augment(rng, batch["frames1"], batch["frames2"],
                              batch["rot1"], batch["rot2"])
        if pending["bootstrap"]:
            state = state.replace(batch_stats=bootstrap(
                state.params, state.batch_stats, v1, v2))
            pending["bootstrap"] = False
        views_labels = (v1, v2, spa, batch["tem"], batch["pb"],
                        batch["rot1"], batch["rot2"])
        return train(state, views_labels, lr)

    return step


def _microbatches(tree, accum: int, n_data_shards: int):
    """Split every leaf (B, ...) -> (accum, B//accum, ...) so each microbatch
    is a CONTIGUOUS per-device slice of the 'data'-sharded batch (global
    mapping (D, accum, B/(D*accum)) with the accum axis moved out front) —
    the split lowers to pure local reshapes under GSPMD, no cross-device
    communication. Contiguity also keeps grouped per-replica BN semantics:
    group g of a microbatch is exactly device g's slice of it."""

    def split(x):
        b, d = x.shape[0], n_data_shards
        if b % (d * accum):
            raise ValueError(
                f"batch {b} not divisible by data_shards*grad_accum "
                f"({d}*{accum})")
        y = x.reshape((d, accum, b // (d * accum)) + x.shape[1:])
        y = jnp.moveaxis(y, 1, 0)
        return y.reshape((accum, b // accum) + x.shape[1:])

    return jax.tree_util.tree_map(split, tree)


def _build_pretrain_programs(model: CSTPPretrain, tx, config: Config):
    # task 'r_byol' = pure BYOL regression (reference r21d_byol.py:383-392 —
    # vestigial there: main_byol's loss mix would crash on its return shape;
    # here it is a WORKING task realized as loss weights (1,0,0,0,0), with
    # the pretext heads still logged as metrics)
    w = (config.loss_weight if config.task != "r_byol"
         else (1.0, 0.0, 0.0, 0.0, 0.0))
    momentum = effective_byol_momentum(config)
    sample_size = config.sample_size

    ntxent_w = config.ntxent_weight
    # --shard_spatial: constrain the views' H dim over 'model' so the whole
    # conv stack runs spatially partitioned (parallel/mesh.py)
    from cstp_tpu.parallel import spatial_constraint_fn

    sp = spatial_constraint_fn(config)

    def loss_fn(params, batch_stats, views_labels):
        v1, v2, spa, tem, pb, rot1, rot2 = views_labels
        v1, v2 = sp(v1), sp(v2)
        if ntxent_w:
            (byol, logits, (emb1, emb2)), mutated = model.apply(
                {"params": params, "batch_stats": batch_stats},
                v1, v2, train=True, with_proj=True, mutable=["batch_stats"],
            )
        else:
            (byol, logits), mutated = model.apply(
                {"params": params, "batch_stats": batch_stats},
                v1, v2, train=True, mutable=["batch_stats"],
            )
        p_spa, p_tem, p_pb1, p_pb2, p_rot1, p_rot2 = logits
        l_spa = cross_entropy(p_spa, spa)
        l_tem = cross_entropy(p_tem, tem)
        l_pb1 = cross_entropy(p_pb1, pb)
        l_pb2 = cross_entropy(p_pb2, pb)
        l_rot1 = cross_entropy(p_rot1, rot1)
        l_rot2 = cross_entropy(p_rot2, rot2)
        # weighted mix (main_byol.py:70-73)
        total = (
            w[0] * byol + w[1] * l_spa + w[2] * l_tem
            + w[3] * (l_pb1 + l_pb2) + w[4] * (l_rot1 + l_rot2)
        )
        if ntxent_w:
            # optional contrastive term with GLOBAL in-batch negatives:
            # the (2B,2B) similarity over the 'data'-sharded batch lowers
            # to an all-gather over ICI (north-star cross-replica option;
            # the reference constructs-but-never-calls NTXentLoss,
            # main_byol.py:191-197)
            from cstp_tpu.ssl.ntxent import ntxent_loss

            total = total + ntxent_w * ntxent_loss(
                emb1, emb2, temperature=config.temperature
            )
        # mean top-1 over the six pretext predictions — logged into the
        # epoch CSV 'acc' column the reference always leaves None
        # (main_byol.py:127)
        hits = [
            jnp.argmax(p, -1) == y
            for p, y in ((p_spa, spa), (p_tem, tem), (p_pb1, pb), (p_pb2, pb),
                         (p_rot1, rot1), (p_rot2, rot2))
        ]
        acc = jnp.mean(jnp.stack(hits).astype(jnp.float32))

        def _acc(*hs):
            return jnp.mean(jnp.stack(hs).astype(jnp.float32))

        metrics = {
            "loss": total,
            "loss_byol": byol,
            "loss_pred_spa": l_spa,
            "loss_pred_tem": l_tem,
            "loss_pred_pb": 0.5 * (l_pb1 + l_pb2),
            "loss_pred_rot": 0.5 * (l_rot1 + l_rot2),
            "acc_pretext": acc,
            # per-head accuracies (long-horizon learning evidence; chance =
            # 1/n_spa, 1/n_tem, 1/n_pb, 1/n_rot per the family spec)
            "acc_spa": _acc(hits[0]),
            "acc_tem": _acc(hits[1]),
            "acc_pb": _acc(hits[2], hits[3]),
            "acc_rot": _acc(hits[4], hits[5]),
        }
        return total, (metrics, mutated["batch_stats"])

    dtype = jnp.dtype(config.compute_dtype)

    # 'auto' currently resolves to OFF: xprof shows the XLA pipeline costs
    # only ~16 ms/step on-device (8% of the step) and this toolchain's
    # Mosaic lowering of the kernel's batched band-matmul einsums is slower
    # than XLA (PERF.md "fused augmentation kernel" section). '--pallas_augment
    # on' keeps the kernel reachable for toolchains where Mosaic handles it.
    use_fused = config.pallas_augment == "on"

    # NOTE: the uint8 frame buffers are NOT donated — no output matches
    # their shape/dtype, so donation would only emit a warning (BENCH_r01).
    @jax.jit
    def augment(rng, frames1, frames2, rot1, rot2):
        if use_fused:
            # ONE Pallas kernel for the whole crop/rot/jitter/blur chain
            # (ops/pallas/augment.py) — randomness sampled in XLA with the
            # same key structure as the unfused path
            return pretrain_augment_batch_fused(
                rng, frames1, frames2, rot1, rot2, sample_size=sample_size,
                norm_method=config.norm_method, out_dtype=dtype,
            )
        v1, v2, spa = pretrain_augment_batch(
            rng, frames1, frames2, rot1, rot2, sample_size=sample_size,
            norm_method=config.norm_method,
        )
        return v1.astype(dtype), v2.astype(dtype), spa

    accum = config.grad_accum
    n_data = data_shard_count(config)

    @functools.partial(jax.jit, donate_argnums=(0,))
    def train(state: TrainState, views_labels, lr: jnp.ndarray):
        # EMA of target BEFORE the forward pass — reference updates the
        # target inside forward, pre-target-encode (r21d_byol.py:363-366).
        # With --grad_accum the EMA still moves ONCE per optimizer step.
        params = dict(state.params)
        params["target_net"] = ema_update(
            state.params["target_net"], state.params["online_net"], momentum
        )

        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
        if accum == 1:
            (_, (metrics, new_stats)), grads = grad_fn(
                params, state.batch_stats, views_labels
            )
        else:
            # Microbatch accumulation: scan bounds the live activation set
            # to one microbatch, so effective per-chip batches beyond the
            # b=64 HBM ceiling (PERF.md) train with ONE optimizer update.
            # Per-microbatch BN batch stats == the reference's per-forward-
            # call (per-GPU) statistics; running stats thread sequentially
            # through the scan exactly like torch's per-call updates. The
            # update math is equivalence-tested against a pure-DP run of
            # the same global batch (tests/test_grad_accum.py). NB: with
            # --ntxent_weight, in-batch negatives are per-microbatch.
            def body(carry, mb):
                stats, gsum = carry
                (_, (m, st)), g = grad_fn(params, stats, mb)
                return (st, jax.tree_util.tree_map(jnp.add, gsum, g)), m

            zeros = jax.tree_util.tree_map(jnp.zeros_like, params)
            (new_stats, gsum), mstack = jax.lax.scan(
                body, (state.batch_stats, zeros),
                _microbatches(views_labels, accum, n_data),
            )
            grads = jax.tree_util.tree_map(lambda g: g / accum, gsum)
            metrics = jax.tree_util.tree_map(
                lambda m: jnp.mean(m, axis=0), mstack)
        updates, new_opt = tx.update(grads, state.opt_state, params)
        lr_mult = (optim.bias_double_lr_multipliers(params)
                   if config.double_bias_lr else None)
        new_params = optim.apply_lr(params, updates, lr, lr_mult)
        new_state = state.replace(
            step=state.step + 1,
            params=new_params,
            batch_stats=new_stats,
            opt_state=new_opt,
        )
        return new_state, metrics

    return augment, train


def make_preaugmented_step(model: CSTPPretrain, tx, config: Config):
    """Step variant taking already-augmented views — used by parity tests
    and any host-side augmentation path."""
    w = config.loss_weight
    momentum = effective_byol_momentum(config)

    def loss_fn(params, batch_stats, batch):
        (byol, logits), mutated = model.apply(
            {"params": params, "batch_stats": batch_stats},
            batch["view1"], batch["view2"], train=True, mutable=["batch_stats"],
        )
        p_spa, p_tem, p_pb1, p_pb2, p_rot1, p_rot2 = logits
        total = (
            w[0] * byol
            + w[1] * cross_entropy(p_spa, batch["spa"])
            + w[2] * cross_entropy(p_tem, batch["tem"])
            + w[3] * (cross_entropy(p_pb1, batch["pb"]) + cross_entropy(p_pb2, batch["pb"]))
            + w[4] * (cross_entropy(p_rot1, batch["rot1"]) + cross_entropy(p_rot2, batch["rot2"]))
        )

        def _acc(*pairs):
            return jnp.mean(jnp.stack([
                jnp.argmax(p, -1) == y for p, y in pairs
            ]).astype(jnp.float32))

        metrics = {
            "loss": total, "loss_byol": byol,
            # per-head accuracies (long-horizon cross-framework parity)
            "acc_spa": _acc((p_spa, batch["spa"])),
            "acc_tem": _acc((p_tem, batch["tem"])),
            "acc_pb": _acc((p_pb1, batch["pb"]), (p_pb2, batch["pb"])),
            "acc_rot": _acc((p_rot1, batch["rot1"]), (p_rot2, batch["rot2"])),
        }
        return total, (metrics, mutated["batch_stats"])

    @functools.partial(jax.jit, donate_argnums=(0,))
    def step(state, batch, lr):
        params = dict(state.params)
        params["target_net"] = ema_update(
            state.params["target_net"], state.params["online_net"], momentum
        )
        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
        (_, (metrics, new_stats)), grads = grad_fn(params, state.batch_stats, batch)
        updates, new_opt = tx.update(grads, state.opt_state, params)
        lr_mult = (optim.bias_double_lr_multipliers(params)
                   if config.double_bias_lr else None)
        new_params = optim.apply_lr(params, updates, lr, lr_mult)
        return (
            state.replace(step=state.step + 1, params=new_params,
                          batch_stats=new_stats, opt_state=new_opt),
            metrics,
        )

    return step
