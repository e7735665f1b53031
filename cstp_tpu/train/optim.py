"""Optimizers, LR schedules, gradient clipping.

Parity targets:
* torch ``optim.SGD(momentum, weight_decay)`` as configured at reference
  ``main_byol.py:228-232`` (dampening 0, no nesterov): grad+wd folded into
  the momentum buffer, update = -lr * buf.
* ``CosineAnnealingWarmupRestarts`` (reference ``scheduler/cosine_anneal.py``)
  as a *pure function* of the epoch index — per-epoch stepping, linear warmup
  from min_lr over ``warmup`` epochs, cosine decay to min_lr, cycle restarts
  with ``gamma``-decayed max lr. Because it is pure, checkpoints only need
  the epoch counter — fixing the reference's resume bug where scheduler
  state is silently dropped (SURVEY §5).
* ``torch.nn.utils.clip_grad_norm_(…, 18)`` == global-norm clip before the
  optimizer (main_byol.py:88-90).
* ``ReduceLROnPlateau`` (finetune; main_ft_mp.py:152) as an explicit,
  checkpointable host-side state machine.

Learning rate is applied OUTSIDE the optax chain: the chain emits the raw
(momentum-buffered) step and the train step scales by the lr passed each
call — exactly torch's ``p -= lr * buf``, and it lets the host drive either
schedule without rebuilding the optimizer.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Callable, Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import optax


# ---------------------------------------------------------------------------
# schedules
# ---------------------------------------------------------------------------

def cosine_warmup_restarts(
    max_lr: float,
    first_cycle_steps: int,
    warmup_steps: float,
    min_lr: float = 1e-5,
    gamma: float = 0.5,
    cycle_mult: float = 1.0,
) -> Callable[[int], float]:
    """Pure-function mirror of reference CosineAnnealingWarmupRestarts with
    cycle_mult=1 (the only configuration the reference uses;
    main_byol.py:252-258). ``step`` is the 0-based epoch index — epoch e
    (1-based) trains at lr(e-1)."""
    assert cycle_mult == 1.0, "reference only exercises cycle_mult=1"
    assert warmup_steps < first_cycle_steps

    def lr_fn(step: int) -> float:
        cycle = step // first_cycle_steps
        s = step % first_cycle_steps
        cur_max = max_lr * (gamma ** cycle)
        if s < warmup_steps:
            return (cur_max - min_lr) * s / warmup_steps + min_lr
        return min_lr + (cur_max - min_lr) * (
            1.0 + math.cos(math.pi * (s - warmup_steps) / (first_cycle_steps - warmup_steps))
        ) / 2.0

    return lr_fn


@dataclasses.dataclass
class ReduceLROnPlateau:
    """torch ReduceLROnPlateau (mode='min', defaults) as checkpointable state."""

    lr: float
    patience: int = 10
    factor: float = 0.1
    threshold: float = 1e-4
    min_lr: float = 0.0
    best: float = math.inf
    num_bad: int = 0

    def step(self, metric: float) -> float:
        if metric < self.best * (1.0 - self.threshold):
            self.best = metric
            self.num_bad = 0
        else:
            self.num_bad += 1
            if self.num_bad > self.patience:
                self.lr = max(self.lr * self.factor, self.min_lr)
                self.num_bad = 0
        return self.lr

    def state_dict(self) -> Dict[str, Any]:
        return dataclasses.asdict(self)

    @classmethod
    def from_state_dict(cls, d: Dict[str, Any]) -> "ReduceLROnPlateau":
        return cls(**d)


# ---------------------------------------------------------------------------
# optimizers
# ---------------------------------------------------------------------------

def param_labels(params, frozen_prefixes: Sequence[str]) -> Any:
    """Label each leaf 'train' or 'frozen' by top-level module prefix.

    ``target_net`` is always frozen in pretraining (requires_grad=False in
    the reference, r21d_byol.py:271,342-344); finetune freezing
    (ft_fc/ft_begin_index semantics, r21d_byol.py:10-35) reuses this with
    backbone prefixes.
    """

    def label(path, _leaf):
        keys = [getattr(p, "key", getattr(p, "idx", None)) for p in path]
        for prefix in frozen_prefixes:
            parts = prefix.split("/")
            if keys[: len(parts)] == parts:
                return "frozen"
        return "train"

    return jax.tree_util.tree_map_with_path(label, params)


def trace_with_dampening(decay: float, dampening: float,
                         nesterov: bool = False) -> optax.GradientTransformation:
    """torch SGD momentum with dampening:
    ``buf = decay*buf + (1-dampening)*grad`` — except on the very first step,
    where torch seeds ``buf = grad`` with NO dampening (torch/optim/sgd.py).
    The reference CLIs parse ``--dampening`` but never pass it to SGD
    (main_byol.py:229-232 — torch default 0), so 0 is behavior parity; a
    nonzero value makes the flag real here.
    """

    def init(params):
        return {
            "trace": jax.tree_util.tree_map(jnp.zeros_like, params),
            "count": jnp.zeros((), jnp.int32),
        }

    def update(updates, state, params=None):
        del params
        damp = jnp.where(state["count"] > 0, dampening, 0.0)
        new_trace = jax.tree_util.tree_map(
            lambda g, t: decay * t + (1.0 - damp) * g, updates, state["trace"]
        )
        if nesterov:
            out = jax.tree_util.tree_map(
                lambda g, t: g + decay * t, updates, new_trace
            )
        else:
            out = new_trace
        return out, {"trace": new_trace, "count": state["count"] + 1}

    return optax.GradientTransformation(init, update)


def make_optimizer(
    name: str,
    *,
    momentum: float = 0.9,
    weight_decay: float = 1e-4,
    dampening: float = 0.0,
    nesterov: bool = False,
    clip_grad_norm: Optional[float] = 18.0,
    labels: Any = None,
) -> optax.GradientTransformation:
    """Build the lr-less update rule; the train step multiplies by -lr.

    With ``labels``, 'frozen' leaves get zero updates (and are excluded from
    the clip-norm computation, matching torch skipping grad-None params).
    """
    chain = []
    if clip_grad_norm:
        chain.append(optax.clip_by_global_norm(clip_grad_norm))
    if name == "sgd":
        if weight_decay:
            chain.append(optax.add_decayed_weights(weight_decay))
        if dampening:
            chain.append(trace_with_dampening(momentum, dampening, nesterov))
        else:
            chain.append(optax.trace(decay=momentum, nesterov=nesterov))
    elif name == "adam":
        # L2-style decay feeding the moments + torch-default betas
        # (reference passes none — main_byol.py:238-240)
        if weight_decay:
            chain.append(optax.add_decayed_weights(weight_decay))
        chain.append(optax.scale_by_adam(b1=0.9, b2=0.999))
    elif name == "adamw":
        # decoupled decay + explicit betas(0.9, 0.99) (main_byol.py:233-236)
        chain.append(optax.scale_by_adam(b1=0.9, b2=0.99))
        if weight_decay:
            chain.append(optax.add_decayed_weights(weight_decay))
    else:
        raise ValueError(f"unknown optimizer {name!r}")
    tx = optax.chain(*chain)
    if labels is not None:
        tx = optax.multi_transform(
            {"train": tx, "frozen": optax.set_to_zero()}, labels
        )
    return tx


def apply_lr(params, updates, lr, lr_mult=None):
    """params - lr * updates (torch ``p -= lr * buf``).

    ``lr_mult`` (optional tree of per-leaf scalars) implements per-group lr
    multipliers, e.g. :func:`bias_double_lr_multipliers`.
    """
    if lr_mult is None:
        return jax.tree_util.tree_map(lambda p, u: p - lr * u, params, updates)
    return jax.tree_util.tree_map(
        lambda p, u, m: p - (lr * m) * u, params, updates, lr_mult
    )


def bias_double_lr_multipliers(params) -> Any:
    """1x lr for weights, 2x for biases — the reference's
    ``get_1x_lr_params``/``get_2x_lr_params`` split
    (models/pace/params_settings.py:7-28; unused by the reference mains,
    wired here behind ``--double_bias_lr``). torch's split is name-based:
    '*weight*' -> 1x (incl. BN scale), '*bias*' -> 2x (incl. BN bias)."""

    def mult(path, _leaf):
        key = getattr(path[-1], "key", None)
        return 2.0 if key == "bias" else 1.0

    return jax.tree_util.tree_map_with_path(mult, params)
