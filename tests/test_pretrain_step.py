"""End-to-end jitted pretrain step: runs on an 8-device virtual mesh,
loss decreases on a fixed synthetic batch, EMA/freezing semantics hold."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cstp_tpu.config import Config
from cstp_tpu.parallel import create_mesh, replicate, shard_batch
from cstp_tpu.train.pretrain import (
    create_pretrain_state,
    make_pretrain_step,
)


@pytest.fixture(scope="module")
def _shared():
    cfg = Config(
        model_name="r21d",
        model_depth=1,
        sample_duration=4,
        sample_size=32,
        batch_size=8,
        learning_rate=0.05,
        compute_dtype="float32",  # CPU test: f32 for determinism
        loss_weight=(0.1, 1.0, 1.0, 1.0, 1.0),
    ).finalize()
    model, state, tx = create_pretrain_state(cfg, jax.random.PRNGKey(0))
    # the step donates its input state — keep a host copy for re-materializing
    host_state = jax.tree_util.tree_map(np.asarray, jax.device_get(state))
    step = make_pretrain_step(model, tx, cfg)
    mesh = create_mesh((-1, 1))
    rng = np.random.default_rng(0)
    b, t, h0, w0 = 8, 4, 48, 64
    batch = {
        "frames1": rng.integers(0, 255, (b, t, h0, w0, 3)).astype(np.uint8),
        "frames2": rng.integers(0, 255, (b, t, h0, w0, 3)).astype(np.uint8),
        "rot1": rng.integers(0, 4, (b,)).astype(np.int32),
        "rot2": rng.integers(0, 4, (b,)).astype(np.int32),
        "tem": rng.integers(0, 5, (b,)).astype(np.int32),
        "pb": rng.integers(0, 4, (b,)).astype(np.int32),
    }
    return cfg, model, host_state, step, mesh, batch


@pytest.fixture
def setup(_shared):
    cfg, model, host_state, step, mesh, batch = _shared
    state = jax.tree_util.tree_map(jnp.asarray, host_state)
    return cfg, model, state, step, mesh, batch


def test_multidevice_mesh_exists():
    assert len(jax.devices()) == 8


def test_step_runs_and_loss_decreases(setup):
    cfg, model, state, step, mesh, batch = setup
    state = jax.device_put(state, jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec()))
    sbatch = shard_batch(mesh, batch)
    lr = jnp.asarray(cfg.learning_rate, jnp.float32)
    losses = []
    key = jax.random.PRNGKey(42)
    for i in range(4):
        # fixed batch, fixed aug key -> loss must go down
        state, metrics = step(state, key, sbatch, lr)
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0], losses
    for k in ("loss_byol", "loss_pred_spa", "loss_pred_tem",
              "loss_pred_pb", "loss_pred_rot"):
        assert np.isfinite(float(metrics[k]))
    # byol regression loss stays in [0, 4] * 2 directions
    assert 0.0 <= float(metrics["loss_byol"]) <= 8.0


def test_target_net_moves_only_by_ema(setup):
    cfg, model, state, step, mesh, batch = setup
    sbatch = shard_batch(mesh, batch)
    lr = jnp.asarray(cfg.learning_rate, jnp.float32)
    t0 = jax.tree_util.tree_map(
        np.asarray, jax.device_get(state.params["target_net"])
    )
    o0 = jax.tree_util.tree_map(
        np.asarray, jax.device_get(state.params["online_net"])
    )
    new_state, _ = step(state, jax.random.PRNGKey(1), sbatch, lr)
    t1 = jax.device_get(new_state.params["target_net"])
    m = cfg.byol_momentum

    def check(p0, q0, p1):
        np.testing.assert_allclose(p1, p0 * m + q0 * (1 - m), rtol=2e-5, atol=2e-6)

    jax.tree_util.tree_map(check, t0, o0, t1)


def test_online_net_actually_trains(setup):
    cfg, model, state, step, mesh, batch = setup
    sbatch = shard_batch(mesh, batch)
    # fetch BEFORE stepping: the step donates (and invalidates) state
    before = jax.device_get(state.params["online_net"])
    new_state, _ = step(state, jax.random.PRNGKey(2), sbatch,
                        jnp.asarray(0.05, jnp.float32))
    after = jax.device_get(new_state.params["online_net"])
    diffs = jax.tree_util.tree_map(
        lambda a, b: float(np.abs(np.asarray(a) - np.asarray(b)).max()),
        before, after,
    )
    assert max(jax.tree_util.tree_leaves(diffs)) > 0.0


@pytest.mark.parametrize("backbone,depth", [
    ("r21d", 1), ("c3d", 1), ("r3d", 18), ("s3d", 1), ("i3d", 1),
    ("slowfast", 18),
])
def test_bn_stats_are_per_view_in_all_blocks(backbone, depth):
    """The two views run through each tower as ONE 2B batched call with BN
    groups doubled so train-mode statistics stay PER-VIEW (reference
    per-forward-call stats, r21d_byol.py:358-372). If any inner BatchNorm
    mixed the views, view-1 outputs would depend on view-2's content.

    Parametrized over ALL families (VERDICT r4 #5): this bug class bit
    twice undetected — r21d ResLayers dropped bn_groups (round 4 perf
    campaign) and ResNet3D blocks dropped it again (commit 747a718) — and
    the torch-parity suite can't see it (eval-mode / per-call patterns)."""
    from cstp_tpu.ssl.byol import CSTPPretrain

    model = CSTPPretrain(backbone=backbone, depth=depth, dtype=jnp.float32)
    rng = np.random.default_rng(0)
    x1 = jnp.asarray(rng.uniform(-1, 1, (2, 8, 32, 32, 3)), jnp.float32)
    x2a = jnp.asarray(rng.uniform(-1, 1, (2, 8, 32, 32, 3)), jnp.float32)
    x2b = jnp.asarray(rng.uniform(-1, 1, (2, 8, 32, 32, 3)), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x1, x2a, train=False)

    def run(x2):
        (_, outs), _ = model.apply(variables, x1, x2, train=True,
                                   mutable=["batch_stats"])
        return outs

    outs_a, outs_b = run(x2a), run(x2b)
    # pb1/rot1 (indices 2, 4) depend only on view 1 => identical
    np.testing.assert_allclose(np.asarray(outs_a[2]), np.asarray(outs_b[2]),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(outs_a[4]), np.asarray(outs_b[4]),
                               rtol=1e-5, atol=1e-5)
    # sanity: view-2 heads DO change
    assert not np.allclose(np.asarray(outs_a[3]), np.asarray(outs_b[3]))


def test_zero1_opt_state_sharding_is_equivalent(setup):
    """--shard_opt_state (ZeRO-1, arXiv:2004.13336): momentum buffers shard
    over 'data'; the training math is bit-identical to the replicated run."""
    from jax.sharding import PartitionSpec as P

    from cstp_tpu.parallel import shard_state

    cfg, model, state, step, mesh, batch = setup
    # the step donates its input state and device_put to an identical
    # sharding aliases buffers — re-materialize each run from a host copy
    host = jax.tree_util.tree_map(np.asarray, jax.device_get(state))
    fresh = lambda: jax.tree_util.tree_map(jnp.asarray, host)
    sharded = shard_state(mesh, fresh(), zero_opt=True)

    # big momentum leaves actually get a 'data' dimension
    specs = [
        x.sharding.spec for x in jax.tree_util.tree_leaves(sharded.opt_state)
        if hasattr(x, "sharding") and x.ndim >= 1 and
        max(x.shape) % mesh.shape["data"] == 0 and
        max(x.shape) >= mesh.shape["data"]
    ]
    assert specs and all(any(s == "data" for s in spec if s) or spec != P()
                         for spec in specs)
    assert any(spec != P() for spec in specs)

    dbatch = shard_batch(mesh, batch)
    lr = jnp.asarray(cfg.learning_rate, jnp.float32)
    s0, m0 = step(replicate(mesh, fresh()), jax.random.PRNGKey(3), dbatch, lr)
    s1, m1 = step(sharded, jax.random.PRNGKey(3), dbatch, lr)
    np.testing.assert_allclose(float(m0["loss"]), float(m1["loss"]),
                               rtol=1e-6)
    # updated params identical too
    p0 = jax.device_get(s0.params)
    p1 = jax.device_get(s1.params)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(a, b, rtol=1e-3, atol=5e-5),
        p0, p1)


def test_concat_views_matches_reference_call_pattern():
    """The batched-2B tower call with grouped per-view BN (--concat_views 1,
    the fast path) computes EXACTLY the reference's two-per-view-calls
    pattern (--concat_views 0): same loss, same logits. This is the
    invariant that justifies the throughput optimization (PERF.md round 3).

    Running stats differ in a documented way (one averaged update vs two
    sequential ones), so only outputs are compared.
    """
    import dataclasses

    from cstp_tpu.train.pretrain import create_pretrain_model

    cfg = Config(model_name="r21d", model_depth=1, sample_duration=4,
                 sample_size=32, batch_size=4,
                 compute_dtype="float32").finalize()
    rng = np.random.default_rng(5)
    x1 = jnp.asarray(rng.normal(0, 1, (4, 4, 32, 32, 3)).astype(np.float32))
    x2 = jnp.asarray(rng.normal(0, 1, (4, 4, 32, 32, 3)).astype(np.float32))

    m_cat = create_pretrain_model(cfg)
    m_ref = create_pretrain_model(dataclasses.replace(cfg, concat_views=0))
    v = m_cat.init(jax.random.PRNGKey(0), x1, x2, train=False)
    # identical param trees: the call pattern doesn't change parameters
    chex = jax.tree_util.tree_structure(v)
    assert chex == jax.tree_util.tree_structure(
        m_ref.init(jax.random.PRNGKey(0), x1, x2, train=False))

    (loss_a, outs_a), _ = m_cat.apply(v, x1, x2, train=True,
                                      mutable=["batch_stats"])
    (loss_b, outs_b), _ = m_ref.apply(v, x1, x2, train=True,
                                      mutable=["batch_stats"])
    np.testing.assert_allclose(float(loss_a), float(loss_b), rtol=1e-5)
    for i, (a, b) in enumerate(zip(outs_a, outs_b)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4,
                                   atol=1e-4, err_msg=f"logits {i}")
