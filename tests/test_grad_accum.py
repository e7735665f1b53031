"""--grad_accum microbatch accumulation (TPU-native knob, no reference
equivalent — it reproduces the reference's 128-global-batch recipe
(README.md:31-44) on fewer chips by scanning microbatches).

The semantic claim, tested exactly: one step with ``--grad_accum N`` on a
1-device mesh equals one step of pure data-parallel over N shards of the
same global batch with per-replica BN (``--sync_bn 0``):

* microbatches are CONTIGUOUS slices (pretrain._microbatches), matching
  grouped-BN's contiguous per-replica groups, so every sample is normalized
  by the same statistics in both runs;
* gradients average over microbatches exactly as DP's all-reduce averages
  over shards; clip-18 and SGD then see identical inputs;
* the BYOL target EMA moves once per optimizer step in both.

Running BN statistics are the one deliberate difference (sequential
per-microbatch momentum updates — torch's per-forward-call semantics — vs
one group-averaged update); they do not feed the train-mode forward, so
losses/params agree over multiple steps while running stats drift ~O(m).

Tolerances follow tests/test_cross_topology.py: f32 reassociation noise on
near-cancelling BN-affine gradient sums is ~1e-3 absolute.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cstp_tpu.config import Config
from cstp_tpu.parallel import create_mesh, shard_batch, shard_state
from cstp_tpu.train import finetune
from cstp_tpu.train.pretrain import (
    _microbatches,
    create_pretrain_state,
    make_pretrain_step,
)


def _batch(rng, b, t=4, h0=48, w0=64):
    return {
        "frames1": rng.integers(0, 255, (b, t, h0, w0, 3)).astype(np.uint8),
        "frames2": rng.integers(0, 255, (b, t, h0, w0, 3)).astype(np.uint8),
        "rot1": rng.integers(0, 4, (b,)).astype(np.int32),
        "rot2": rng.integers(0, 4, (b,)).astype(np.int32),
        "tem": rng.integers(0, 5, (b,)).astype(np.int32),
        "pb": rng.integers(0, 4, (b,)).astype(np.int32),
    }


def _cfg(**kw):
    base = dict(
        model_name="r21d", model_depth=1, sample_duration=4, sample_size=32,
        batch_size=8, learning_rate=0.05, compute_dtype="float32",
        sync_bn=0, loss_weight=(0.1, 1.0, 1.0, 1.0, 1.0),
    )
    base.update(kw)
    return Config(**base).finalize()


def _run(cfg, host_state, step, batch, mesh_shape, devices=None, n_steps=2):
    """Params are captured after step 1 — the same methodology as
    tests/test_cross_topology.py: f32 reassociation noise compounds with
    steps, so tight claims are made on one update + the loss series."""
    mesh = create_mesh(mesh_shape, devices=devices)
    state = jax.tree_util.tree_map(jnp.asarray, host_state)
    state = shard_state(mesh, state)
    sbatch = shard_batch(mesh, batch)
    lr = jnp.asarray(cfg.learning_rate, jnp.float32)
    losses, params1 = [], None
    for i in range(n_steps):
        state, metrics = step(state, jax.random.PRNGKey(42 + i), sbatch, lr)
        losses.append(float(metrics["loss"]))
        if i == 0:
            params1 = jax.tree_util.tree_map(
                np.asarray, jax.device_get(state.params))
    return losses, params1


def test_grad_accum_matches_data_parallel():
    cfg_dp = _cfg(mesh_shape=(2, 1))     # 2 DP shards, per-replica BN
    cfg_ac = _cfg(grad_accum=2, mesh_shape=(1, 1))
    model, state, tx = create_pretrain_state(cfg_dp, jax.random.PRNGKey(0))
    host_state = jax.tree_util.tree_map(np.asarray, jax.device_get(state))
    batch = _batch(np.random.default_rng(7), 8)

    step_dp = make_pretrain_step(model, tx, cfg_dp)
    # same init works for both: bn_groups only changes stat grouping at
    # apply time, not the param tree
    model_ac, _, tx_ac = create_pretrain_state(cfg_ac, jax.random.PRNGKey(0))
    step_ac = make_pretrain_step(model_ac, tx_ac, cfg_ac)

    dp_losses, dp_params = _run(cfg_dp, host_state, step_dp, batch,
                                (2, 1), devices=jax.devices()[:2])
    ac_losses, ac_params = _run(cfg_ac, host_state, step_ac, batch,
                                (1, 1), devices=jax.devices()[:1])

    np.testing.assert_allclose(ac_losses[:1], dp_losses[:1], rtol=1e-6)
    np.testing.assert_allclose(ac_losses, dp_losses, rtol=2e-4)

    def chk(a, b):
        np.testing.assert_allclose(a, b, rtol=5e-4, atol=1e-3)

    jax.tree_util.tree_map(chk, dp_params, ac_params)


def test_microbatches_contiguous_per_device():
    x = jnp.arange(16)
    # D=2, accum=2: device 0 holds [0..8), device 1 [8..16); microbatch a
    # must take the a-th contiguous slice of EACH device's chunk
    (mb,) = (_microbatches((x,), 2, 2),)
    got = np.asarray(mb[0])
    np.testing.assert_array_equal(got[0], [0, 1, 2, 3, 8, 9, 10, 11])
    np.testing.assert_array_equal(got[1], [4, 5, 6, 7, 12, 13, 14, 15])


def test_microbatches_rejects_indivisible_batch():
    with pytest.raises(ValueError, match="not divisible"):
        _microbatches((jnp.arange(6),), 4, 1)


def test_finetune_grad_accum_runs_and_matches_loss_scale():
    cfg = _cfg(grad_accum=2, mesh_shape=(1, 1), n_classes=5, task="ft_all")
    rng = np.random.default_rng(3)
    model, state, tx = finetune.create_finetune_state(
        cfg, jax.random.PRNGKey(0), num_classes=5)
    step = finetune.make_finetune_step(model, tx, cfg)
    batch = {
        "frames": rng.integers(0, 255, (8, 4, 48, 64, 3)).astype(np.uint8),
        "labels": rng.integers(0, 5, (8,)).astype(np.int32),
    }
    lr = jnp.asarray(0.01, jnp.float32)
    s1, m1 = step(state, jax.random.PRNGKey(1), batch, lr)
    s2, m2 = step(s1, jax.random.PRNGKey(2), batch, lr)
    assert np.isfinite(float(m1["loss"])) and np.isfinite(float(m2["loss"]))
    assert float(m2["loss"]) < float(m1["loss"]) + 1.0
