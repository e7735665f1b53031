"""Shape/structure tests for backbones and the BYOL engine."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cstp_tpu.models import backbone_feat_dim, make_backbone
from cstp_tpu.models.layers import r21d_intermediate_channels
from cstp_tpu.ssl.byol import (
    CSTPClassify,
    CSTPPretrain,
    byol_regression_loss,
    ema_update,
)

# tiny clip for CPU tests
B, T, S = 2, 4, 32


def test_intermediate_channels_formula():
    # stem: (3,7,7), 3->64 (r21d_byol.py:74-76)
    assert r21d_intermediate_channels(3, 64, (3, 7, 7)) == 83
    # 3x3x3 64->64: (27*64*64)/(9*64 + 3*64) = 110592/768 = 144
    assert r21d_intermediate_channels(64, 64, (3, 3, 3)) == 144
    # 1x1x1 64->128 downsample conv: 64*128/(64+128) = 42
    assert r21d_intermediate_channels(64, 128, (1, 1, 1)) == 42


def test_r21d_feature_dims(key):
    model = make_backbone("r21d", 1, dtype=jnp.float32, proj_flag=True)
    x = jnp.zeros((B, T, S, S, 3), jnp.float32)
    vars_ = model.init(key, x, train=False)
    feat, proj = model.apply(vars_, x, train=False)
    assert feat.shape == (B, 512)  # r21d_byol.py:223
    assert proj.shape == (B, 512)
    assert backbone_feat_dim("r21d") == 512
    assert backbone_feat_dim("r21d_byol") == 512


def test_r21d_spatial_temporal_downsampling(key):
    """16x112^2 -> conv1 halves HW, conv3-5 halve T,H,W each."""
    model = make_backbone("r21d", 1, dtype=jnp.float32, proj_flag=False)
    x = jnp.zeros((1, 8, 64, 64, 3), jnp.float32)
    vars_ = model.init(key, x, train=False)
    feat = model.apply(vars_, x, train=False)
    assert feat.shape == (1, 512)


def test_byol_loss_bounds(key):
    a = jax.random.normal(key, (8, 16))
    l = byol_regression_loss(a, a)
    np.testing.assert_allclose(np.asarray(l), 0.0, atol=1e-5)
    l = byol_regression_loss(a, -a)
    np.testing.assert_allclose(np.asarray(l), 4.0, atol=1e-5)
    l = np.asarray(byol_regression_loss(a, jax.random.normal(jax.random.PRNGKey(1), (8, 16))))
    assert (l >= 0).all() and (l <= 4).all()


def test_ema_update():
    t = {"w": jnp.ones((3,))}
    o = {"w": jnp.zeros((3,))}
    out = ema_update(t, o, 0.996)
    np.testing.assert_allclose(np.asarray(out["w"]), 0.996)


def test_pretrain_model_outputs(key):
    model = CSTPPretrain(backbone="r21d", depth=1, dtype=jnp.float32)
    x = jnp.zeros((B, T, S, S, 3), jnp.float32)
    vars_ = model.init(key, x, x, train=True)
    # param tree has the reference module names
    for name in ("online_net", "target_net", "predictor", "overlap_spa",
                 "overlap_tem", "pb_cls", "rotate_cls"):
        assert name in vars_["params"], name
    (byol, logits), _ = model.apply(
        vars_, x, x, train=True, mutable=["batch_stats"]
    )
    assert byol.shape == ()
    p_spa, p_tem, p_pb1, p_pb2, p_rot1, p_rot2 = logits
    for p in (p_spa, p_tem, p_pb1, p_pb2, p_rot1, p_rot2):
        assert p.shape == (B, 5)  # all heads are 5-way (r21d_byol.py:276-291)


def test_online_target_start_different(key):
    """Reference builds the towers with independent random inits."""
    model = CSTPPretrain(backbone="r21d", depth=1, dtype=jnp.float32)
    x = jnp.zeros((B, T, S, S, 3), jnp.float32)
    vars_ = model.init(key, x, x, train=False)
    on = jax.tree_util.tree_leaves(vars_["params"]["online_net"])
    tg = jax.tree_util.tree_leaves(vars_["params"]["target_net"])
    diffs = [not np.allclose(np.asarray(a), np.asarray(b)) for a, b in zip(on, tg)]
    assert any(diffs)


def test_classify_model(key):
    model = CSTPClassify(backbone="r21d", depth=1, num_classes=101,
                         cls_bn=True, dtype=jnp.float32)
    x = jnp.zeros((B, T, S, S, 3), jnp.float32)
    vars_ = model.init(key, x, train=False)
    logits = model.apply(vars_, x, train=False)
    assert logits.shape == (B, 101)
    assert "classify" in vars_["params"]
    assert "cls_bn" in vars_["params"]


def test_legacy_pace_project_head(key):
    """--legacy_pace rebuilds the reference's live bare-'r21d' dispatch:
    CE over a 512-d Projector (Linear->BN->ReLU->Linear->BN->ReLU) output
    (models/model.py:41-43 -> pace/r21d.py R2Plus1DNet(linear_flag=
    'project')). The 'logits' are the ReLU'd projection: 512-wide and
    non-negative."""
    model = CSTPClassify(backbone="r21d", depth=1, num_classes=101,
                         head_style="pace_project", dtype=jnp.float32)
    x = jnp.ones((B, T, S, S, 3), jnp.float32) * 0.1
    vars_ = model.init(key, x, train=False)
    logits = model.apply(vars_, x, train=False)
    assert logits.shape == (B, 512)
    assert float(logits.min()) >= 0.0  # trailing ReLU
    # head params: MLPHead under 'classify' + trailing 'pace_bn'
    assert "classify" in vars_["params"] and "pace_bn" in vars_["params"]
    assert vars_["params"]["classify"]["fc1"]["kernel"].shape == (512, 4096)

    from cstp_tpu.config import Config
    from cstp_tpu.train.finetune import create_classify_model

    cfg = Config(model_name="r21d", model_depth=1, legacy_pace=1,
                 task="ft_all", compute_dtype="float32").finalize()
    m2 = create_classify_model(cfg, 101)
    assert m2.head_style == "pace_project"


def test_bn_scale_init_is_reference_glorot(key):
    """BN scales must start ~U(-sqrt(6/C), sqrt(6/C)), not ones
    (r21d_byol.py:306-309 glorot-inits BN weights)."""
    model = make_backbone("r21d", 1, dtype=jnp.float32, proj_flag=False)
    x = jnp.zeros((1, 2, 16, 16, 3), jnp.float32)
    vars_ = model.init(key, x, train=False)
    scale = np.asarray(vars_["params"]["bn1"]["bn"]["scale"])  # C=64
    bound = np.sqrt(6.0 / 64.0)
    assert scale.min() >= -bound - 1e-6 and scale.max() <= bound + 1e-6
    assert scale.std() > 0.01  # actually random, not ones/zeros
