"""int8 quantized forward convs (ops/quant.py, --quant int8)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cstp_tpu.ops.quant import _quantize_tensor, _quantize_weight, int8_conv


@pytest.fixture
def key():
    return jax.random.PRNGKey(0)


def test_quantize_roundtrip_error_bounded(key):
    x = jax.random.normal(key, (4, 8, 8, 16), jnp.float32)
    xq, s = _quantize_tensor(x)
    assert xq.dtype == jnp.int8
    err = np.abs(np.asarray(xq, np.float32) * float(s) - np.asarray(x))
    assert err.max() <= float(s) / 2 + 1e-6  # half-ulp of the grid

    w = jax.random.normal(key, (3, 3, 16, 32), jnp.float32) * 0.1
    wq, sw = _quantize_weight(w)
    assert sw.shape == (32,)
    err = np.abs(np.asarray(wq, np.float32) * np.asarray(sw) - np.asarray(w))
    assert err.max() <= float(np.asarray(sw).max()) / 2 + 1e-6


@pytest.mark.parametrize("ndim", [4, 5])
def test_int8_conv_close_to_float_conv(key, ndim):
    ks = jax.random.split(key, 2)
    if ndim == 5:
        x = jax.random.normal(ks[0], (2, 4, 8, 8, 16), jnp.float32)
        w = jax.random.normal(ks[1], (1, 3, 3, 16, 24), jnp.float32) * 0.1
        stride, pad = (1, 1, 1), (0, 1, 1)
        dn = ("NDHWC", "DHWIO", "NDHWC")
    else:
        x = jax.random.normal(ks[0], (2, 8, 8, 16), jnp.float32)
        w = jax.random.normal(ks[1], (3, 3, 16, 24), jnp.float32) * 0.1
        stride, pad = (1, 1), (1, 1)
        dn = ("NHWC", "HWIO", "NHWC")
    out = int8_conv(x, w, stride, pad, jnp.float32)
    ref = jax.lax.conv_general_dilated(
        x, w, stride, [(p, p) for p in pad], dimension_numbers=dn)
    # per-tensor 8-bit grid: relative error ~1% of the output scale
    scale = float(jnp.abs(ref).max())
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=0.03 * scale)


def test_int8_conv_straight_through_gradients(key):
    """Backward must equal the bf16 conv VJP evaluated AT THE DEQUANTIZED
    input (the function the forward actually computed), with identity
    estimation through round/clip."""
    ks = jax.random.split(key, 2)
    x = jax.random.normal(ks[0], (2, 4, 6, 6, 8), jnp.float32)
    w = jax.random.normal(ks[1], (1, 3, 3, 8, 16), jnp.float32) * 0.1
    stride, pad = (1, 1, 1), (0, 1, 1)

    def loss(x_, w_):
        return jnp.sum(int8_conv(x_, w_, stride, pad, jnp.float32) ** 2)

    dx, dw = jax.grad(loss, argnums=(0, 1))(x, w)

    xq, sx = _quantize_tensor(x)
    xhat = (xq.astype(jnp.float32) * sx).astype(jnp.bfloat16)

    def ref_loss(x_, w_):
        out = jax.lax.conv_general_dilated(
            x_, w_.astype(jnp.bfloat16), stride, [(p, p) for p in pad],
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
            preferred_element_type=jnp.bfloat16)
        return jnp.sum(out.astype(jnp.float32) ** 2)

    # cotangent entering the VJP differs (true fwd output vs bf16-chain
    # output) only by quantization noise; compare directionally with a
    # tolerance scaled to that noise
    dxr, dwr = jax.grad(ref_loss, argnums=(0, 1))(xhat, w)
    np.testing.assert_allclose(np.asarray(dx), np.asarray(dxr, np.float32),
                               rtol=0.2, atol=0.1)
    # dw sums B*T*H*W products of two quantization-noisy factors; elements
    # are O(50-90) here, so allow noise-scale absolute slack on the few
    # near-cancelling entries
    np.testing.assert_allclose(np.asarray(dw), np.asarray(dwr, np.float32),
                               rtol=0.2, atol=2.0)


def test_quant_scope_flag_changes_towers(key):
    """--quant_scope target quantizes ONLY the EMA tower: the online
    tower's forward must equal the float model's, while scope 'all'
    changes it."""
    from cstp_tpu.config import Config
    from cstp_tpu.train.pretrain import create_pretrain_model

    x = jax.random.normal(key, (2, 4, 16, 16, 3), jnp.float32)
    base = dict(model_name="r21d", model_depth=1, sample_duration=4,
                sample_size=16, compute_dtype="float32")
    m_f = create_pretrain_model(Config(**base).finalize())
    m_t = create_pretrain_model(Config(quant="int8", quant_scope="target",
                                       **base).finalize())
    m_a = create_pretrain_model(Config(quant="int8", quant_scope="all",
                                       **base).finalize())
    v = m_f.init(jax.random.PRNGKey(0), x, x, train=False)

    def online_feat(m):
        return m.apply(v, x, method=lambda mdl, xx: mdl.online_net(
            xx, train=False))

    np.testing.assert_allclose(np.asarray(online_feat(m_f)[0]),
                               np.asarray(online_feat(m_t)[0]),
                               rtol=1e-6, atol=1e-6)  # target-scope: float
    # all-scope: the online tower is quantized — outputs must differ
    # (features at init are tiny, so assert bitwise difference, not a
    # relative bound)
    assert not np.array_equal(np.asarray(online_feat(m_f)[0]),
                              np.asarray(online_feat(m_a)[0]))


def test_int8_calibration_roundtrip(key, tmp_path):
    """serve/quantize.py: a float checkpoint calibrates into per-site
    act_scale batch_stats; the int8_static model loads it and produces
    logits matching the float model up to quantization noise (the serving
    deployment path — PERF.md round 6: +52% eval throughput on v5e)."""
    import dataclasses

    from cstp_tpu.ckpt import checkpoint as ckpt_lib
    from cstp_tpu.config import Config
    from cstp_tpu.serve.quantize import calibrate_checkpoint
    from cstp_tpu.train.finetune import create_classify_model

    cfg = Config(model_name="r21d", model_depth=1, sample_duration=4,
                 sample_size=32, n_classes=10, n_finetune_classes=10,
                 data_backend="synthetic", synthetic_len=8,
                 compute_dtype="float32").finalize()
    model = create_classify_model(cfg, 10)
    x = jax.random.normal(key, (2, 4, 32, 32, 3), jnp.float32)
    v = model.init(jax.random.PRNGKey(0), x, train=False)
    float_ckpt = str(tmp_path / "save_float")
    ckpt_lib.save_checkpoint(float_ckpt, {
        "params": jax.device_get(v["params"]),
        "batch_stats": jax.device_get(v["batch_stats"])},
        meta={"arch": cfg.arch})

    out_ckpt = str(tmp_path / "save_int8")
    res = calibrate_checkpoint(cfg, float_ckpt, out_ckpt, n_batches=2,
                               batch_size=4)
    assert res["n_sites"] > 10          # every tower conv observed
    assert res["scale_min"] > 0         # no site left at zero

    # serve with the calibrated scales
    cfg_q = dataclasses.replace(cfg, quant="int8_static").finalize()
    model_q = create_classify_model(cfg_q, 10)
    vq = model_q.init(jax.random.PRNGKey(0), x, train=False)
    tree, _ = ckpt_lib.restore_checkpoint(
        out_ckpt, {"params": vq["params"],
                   "batch_stats": vq["batch_stats"]})
    logits_f = model.apply({"params": tree["params"],
                            "batch_stats": tree["batch_stats"]},
                           x, train=False)
    logits_q = model_q.apply({"params": tree["params"],
                              "batch_stats": tree["batch_stats"]},
                             x, train=False)
    assert np.isfinite(np.asarray(logits_q)).all()
    c = np.corrcoef(np.asarray(logits_f).ravel(),
                    np.asarray(logits_q).ravel())[0, 1]
    assert c > 0.5, c  # random-init net: loose bound (see note above)


def test_quant_flag_builds_and_trains(key):
    """--quant int8: same parameter tree as the float model, finite loss,
    and a full fused pretrain step runs."""
    from cstp_tpu.config import Config
    from cstp_tpu.models import make_backbone
    from cstp_tpu.parallel import create_mesh, shard_batch, shard_state
    from cstp_tpu.train.pretrain import (
        create_pretrain_state,
        make_pretrain_step,
    )

    x = jax.random.normal(key, (2, 4, 16, 16, 3), jnp.float32)
    m0 = make_backbone("r21d", 1, dtype=jnp.float32)
    m1 = make_backbone("r21d", 1, dtype=jnp.float32, quant="int8")
    v = m0.init(key, x, train=False)
    assert (jax.tree_util.tree_structure(v)
            == jax.tree_util.tree_structure(m1.init(key, x, train=False)))
    y0, _ = m0.apply(v, x, train=True, mutable=["batch_stats"])
    y1, _ = m1.apply(v, x, train=True, mutable=["batch_stats"])
    # Per-layer quantization noise compounds through 17 convs, each
    # renormalized by BN with the reference's tiny random-sign glorot
    # scales, so random-init features only stay loosely correlated
    # (~0.78 measured); the functional gate for --quant is the long-horizon
    # learning-evidence harness (docs/LEARNING.md), not this smoke bound.
    c = np.corrcoef(np.asarray(y0).ravel(), np.asarray(y1).ravel())[0, 1]
    assert np.isfinite(np.asarray(y1)).all() and c > 0.5, c

    cfg = Config(model_name="r21d", model_depth=1, sample_duration=4,
                 sample_size=32, batch_size=4, compute_dtype="float32",
                 quant="int8").finalize()
    mesh = create_mesh((1, 1), devices=jax.devices()[:1])
    model, state, tx = create_pretrain_state(cfg, jax.random.PRNGKey(0))
    state = shard_state(mesh, state)
    step = make_pretrain_step(model, tx, cfg)
    rng = np.random.default_rng(0)
    b, t = 4, 4
    batch = shard_batch(mesh, {
        "frames1": rng.integers(0, 255, (b, t, 48, 64, 3)).astype(np.uint8),
        "frames2": rng.integers(0, 255, (b, t, 48, 64, 3)).astype(np.uint8),
        "rot1": rng.integers(0, 4, (b,)).astype(np.int32),
        "rot2": rng.integers(0, 4, (b,)).astype(np.int32),
        "tem": rng.integers(0, 5, (b,)).astype(np.int32),
        "pb": rng.integers(0, 4, (b,)).astype(np.int32),
    })
    state, metrics = step(state, jax.random.PRNGKey(1), batch,
                          jnp.asarray(0.01, jnp.float32))
    assert np.isfinite(float(metrics["loss"]))


def test_check_int8_calibrated_guards(key):
    """ADVICE r3: uncalibrated int8_static must be refused up front, not
    silently clip every activation to ~0."""
    from cstp_tpu.ops.quant import check_int8_calibrated

    good = {"backbone": {"conv1": {"act_scale": np.float32(0.04)},
                         "layer1": {"spatial_conv": {
                             "act_scale": np.float32(0.1)}}}}
    assert check_int8_calibrated(good, "test") == 2

    one_zero = {"a": {"act_scale": np.float32(0.04)},
                "b": {"act_scale": np.float32(0.0)}}
    with pytest.raises(ValueError, match="uncalibrated"):
        check_int8_calibrated(one_zero, "test")

    with pytest.raises(ValueError, match="no act_scale sites"):
        check_int8_calibrated({"bn": {"mean": np.zeros(4)}}, "test")


def test_eval_only_quant_modes_rejected_on_train_steps(key):
    """ADVICE r3: int8_static / int8_calib are serving/calibration modes.
    Since VERDICT r4 #8 the rejection happens at PARSE time
    (Config.finalize); the TRAIN step factories keep the same guard as
    defense in depth for programmatically-built configs that skip
    finalize()."""
    import optax

    from cstp_tpu.config import Config
    from cstp_tpu.train.finetune import make_finetune_step
    from cstp_tpu.train.pretrain import make_pretrain_step

    for quant in ("int8_static", "int8_calib"):
        with pytest.raises(ValueError, match="eval/serve"):
            Config(model_name="r21d", model_depth=1, sample_duration=4,
                   sample_size=32, batch_size=4, quant=quant,
                   task="ft_all").finalize()
        # un-finalized config straight into the step factories
        cfg = Config(model_name="r21d", model_depth=1, sample_duration=4,
                     sample_size=32, batch_size=4, quant=quant,
                     task="ft_all")
        with pytest.raises(ValueError, match="eval/serve/calibration"):
            make_pretrain_step(None, optax.sgd(0.1), cfg)
        with pytest.raises(ValueError, match="eval/serve/calibration"):
            make_finetune_step(None, optax.sgd(0.1), cfg)


def test_calibrate_checkpoint_rejects_siteless_backbone(tmp_path, monkeypatch):
    """ADVICE r3: calibrating a backbone with no quantized conv sites must
    fail loudly instead of writing a checkpoint that looks calibrated.
    Round 5 threaded quant through slowfast (the last holdout), so no
    registered family is siteless anymore — simulate a FUTURE family added
    without quant plumbing by stripping `quant` from slowfast's ctor (the
    exact pre-round-5 behavior the guard was built for)."""
    import jax as _jax

    import cstp_tpu.models as models_pkg
    from cstp_tpu.ckpt import checkpoint as ckpt_lib
    from cstp_tpu.config import Config
    from cstp_tpu.serve.quantize import calibrate_checkpoint
    from cstp_tpu.train.finetune import create_finetune_state

    orig_ctor, spec_fn = models_pkg._REGISTRY["slowfast"]

    def siteless_ctor(depth, dtype, proj_flag, **kw):
        kw.pop("quant", None)  # a family whose blocks ignore --quant
        return orig_ctor(depth=depth, dtype=dtype, proj_flag=proj_flag, **kw)

    monkeypatch.setitem(models_pkg._REGISTRY, "slowfast",
                        (siteless_ctor, spec_fn))

    cfg = Config(model_name="slowfast", model_depth=18, sample_duration=8,
                 sample_size=64, batch_size=2, n_finetune_classes=5,
                 data_backend="synthetic", synthetic_len=8,
                 compute_dtype="float32", task="ft_all").finalize()
    model, state, _ = create_finetune_state(cfg, _jax.random.PRNGKey(0), 5)
    float_ckpt = str(tmp_path / "float_ckpt")
    ckpt_lib.save_checkpoint(float_ckpt, {
        "params": jax.device_get(state.params),
        "batch_stats": jax.device_get(state.batch_stats)},
        meta={"arch": cfg.arch})
    with pytest.raises(ValueError, match="0 conv sites"):
        calibrate_checkpoint(cfg, float_ckpt, str(tmp_path / "int8_ckpt"),
                             n_batches=1, batch_size=2)


# ---------------------------------------------------------------------------
# --quant int8_store: s8 STORAGE chain (VERDICT r3 #1)
# ---------------------------------------------------------------------------


def _chain_shapes(key, b=4, t=4, s=8, cin=8, mid=12, cout=16, kt=3):
    ks = jax.random.split(key, 6)
    x = jax.random.normal(ks[0], (b, t, s, s, cin), jnp.float32)
    ws = jax.random.normal(ks[1], (1, 3, 3, cin, mid), jnp.float32) * 0.2
    wt = jax.random.normal(ks[2], (kt, 1, 1, mid, cout), jnp.float32) * 0.2
    gamma = 1.0 + 0.1 * jax.random.normal(ks[3], (mid,), jnp.float32)
    beta = 0.1 * jax.random.normal(ks[4], (mid,), jnp.float32)
    return x, ws, wt, gamma, beta


@pytest.mark.parametrize("groups", [1, 2])
def test_int8_store_chain_matches_float_chain(key, groups):
    """Forward of the s8-storage chain ~= the float chain when the delayed
    scales equal the exact absmax scales (one-step-converged case)."""
    from cstp_tpu.ops.quant import float_store_chain, int8_store_chain

    x, ws, wt, gamma, beta = _chain_shapes(key)
    args = ((1, 1, 1), (0, 1, 1), (1, 1, 1), (1, 0, 0))
    ref, gmean_f, gvar_f, (a_in, a_mid, a_act) = float_store_chain(
        x, ws, wt, gamma, beta, groups, *args, True, None, None, jnp.float32)
    out, gmean, gvar, o_in, o_mid, o_act = int8_store_chain(
        x, ws, wt, gamma, beta, a_in, a_mid, a_act, *args, groups)
    # observations re-derived inside the chain match the float chain's
    np.testing.assert_allclose(float(o_in), float(a_in), rtol=1e-6)
    # group stats computed from the QUANTIZED mid: close to float stats
    np.testing.assert_allclose(np.asarray(gmean), np.asarray(gmean_f),
                               atol=5e-3)
    np.testing.assert_allclose(np.asarray(gvar), np.asarray(gvar_f),
                               atol=2e-2)
    scale = float(jnp.abs(ref).max())
    # three quantization stages compound: ~2-3% of output range
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=0.06 * scale)


def test_int8_store_chain_gradients_close_to_float(key):
    """STE backward: grads of the s8 chain track the float chain's grads
    (evaluated at converged scales) for every differentiable input."""
    from cstp_tpu.ops.quant import float_store_chain, int8_store_chain

    x, ws, wt, gamma, beta = _chain_shapes(key)
    args = ((1, 1, 1), (0, 1, 1), (1, 1, 1), (1, 0, 0))
    _, _, _, (a_in, a_mid, a_act) = float_store_chain(
        x, ws, wt, gamma, beta, 2, *args, True, None, None, jnp.float32)

    def loss_q(x, ws, wt, gamma, beta):
        out = int8_store_chain(x, ws, wt, gamma, beta, a_in, a_mid, a_act,
                               *args, 2)[0]
        return jnp.sum(out * jnp.cos(jnp.arange(out.size, dtype=jnp.float32)
                                     .reshape(out.shape)))

    def loss_f(x, ws, wt, gamma, beta):
        out = float_store_chain(x, ws, wt, gamma, beta, 2, *args, True,
                                None, None, jnp.float32)[0]
        return jnp.sum(out * jnp.cos(jnp.arange(out.size, dtype=jnp.float32)
                                     .reshape(out.shape)))

    gq = jax.grad(loss_q, argnums=(0, 1, 2, 3, 4))(x, ws, wt, gamma, beta)
    gf = jax.grad(loss_f, argnums=(0, 1, 2, 3, 4))(x, ws, wt, gamma, beta)
    for q, f, name in zip(gq, gf, ("x", "ws", "wt", "gamma", "beta")):
        qn, fn = np.asarray(q, np.float32), np.asarray(f, np.float32)
        denom = np.abs(fn).max() + 1e-6
        # direction: strong cosine alignment is the load-bearing check
        cos = (qn * fn).sum() / (np.linalg.norm(qn) * np.linalg.norm(fn)
                                 + 1e-12)
        assert cos > 0.98, (name, cos)
        # pointwise: bf16 backward + 3 compounding int8 grids are coarse at
        # this tiny scale (measured maxima ~0.23 of the grad range); 0.35
        # still catches structural errors (a wrong BN term shifts ~1.0)
        assert np.abs(qn - fn).max() / denom < 0.35, name


def test_int8_store_pretrain_bootstraps_and_trains(key):
    """End-to-end: make_pretrain_step with --quant int8_store seeds the
    delayed scales on the first batch (float observation pass), then trains
    with finite loss; scales are nonzero and running stats move. Param tree
    is IDENTICAL to the float model's (checkpoint interchange)."""
    import numpy as _np

    from cstp_tpu.config import Config
    from cstp_tpu.train.pretrain import create_pretrain_state, make_pretrain_step

    cfg = Config(model_name="r21d", model_depth=1, sample_duration=4,
                 sample_size=32, batch_size=4, compute_dtype="float32",
                 quant="int8_store").finalize()
    model, state, tx = create_pretrain_state(cfg, jax.random.PRNGKey(0))
    cfg_f = Config(model_name="r21d", model_depth=1, sample_duration=4,
                   sample_size=32, batch_size=4,
                   compute_dtype="float32").finalize()
    _, state_f, _ = create_pretrain_state(cfg_f, jax.random.PRNGKey(0))
    assert (jax.tree_util.tree_structure(state.params)
            == jax.tree_util.tree_structure(state_f.params))

    step = make_pretrain_step(model, tx, cfg)
    rng = _np.random.default_rng(0)
    b, t, h0, w0 = 4, 4, 48, 64
    batch = {
        "frames1": rng.integers(0, 255, (b, t, h0, w0, 3)).astype(_np.uint8),
        "frames2": rng.integers(0, 255, (b, t, h0, w0, 3)).astype(_np.uint8),
        "rot1": rng.integers(0, 4, (b,)).astype(_np.int32),
        "rot2": rng.integers(0, 4, (b,)).astype(_np.int32),
        "tem": rng.integers(0, 5, (b,)).astype(_np.int32),
        "pb": rng.integers(0, 4, (b,)).astype(_np.int32),
    }
    losses = []
    for i in range(3):
        state, metrics = step(state, jax.random.PRNGKey(i + 1), batch,
                              jnp.asarray(0.01, jnp.float32))
        losses.append(float(metrics["loss"]))
    assert all(np.isfinite(l) for l in losses), losses

    scales = []

    def walk(tree):
        for k, v in tree.items():
            if k.startswith("act_scale_"):
                scales.append(float(np.asarray(v)))
            elif isinstance(v, dict):
                walk(v)

    walk(jax.device_get(state.batch_stats))
    assert scales and all(s > 0 for s in scales), \
        (len(scales), min(scales) if scales else None)


# ---------------------------------------------------------------------------
# int8 serving across the backbone zoo (round 4: quant threaded through
# c3d / r3d / s3d / i3d in addition to r21d)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("arch,depth", [("c3d", 1), ("r3d", 18),
                                        ("s3d", 1), ("i3d", 1),
                                        ("slowfast", 18)])
def test_int8_calibrate_then_static_all_families(arch, depth):
    """Every backbone family exposes the calibrate→int8_static serving flow:
    the calib pass observes >0 conv sites (including i3d's asymmetric
    TF-SAME convs through Conv3d's (lo, hi) padding, and slowfast's dual
    pathways + laterals since round 5) and the static int8 forward tracks
    the float forward closely."""
    from cstp_tpu.ssl.byol import CSTPClassify

    def n_scales(tree):
        n = 0
        for k, v in tree.items():
            if k == "act_scale":
                n += 1
            elif isinstance(v, dict):
                n += n_scales(v)
        return n

    x = jnp.asarray(np.random.default_rng(0).normal(
        0, 1, (2, 8, 32, 32, 3)).astype(np.float32))
    kw = dict(backbone=arch, depth=depth, num_classes=5, dtype=jnp.float32)
    m = CSTPClassify(**kw)
    vs = m.init(jax.random.PRNGKey(0), x, train=False)
    out_f = m.apply(vs, x, train=False)

    mc = CSTPClassify(quant="int8_calib", **kw)
    _, mut = mc.apply({"params": vs["params"],
                       "batch_stats": vs.get("batch_stats", {})},
                      x, train=False, mutable=["batch_stats"])
    assert n_scales(mut["batch_stats"]) > 0, arch

    ms = CSTPClassify(quant="int8_static", **kw)
    out_q = ms.apply({"params": vs["params"],
                      "batch_stats": mut["batch_stats"]}, x, train=False)
    of = np.asarray(out_f, np.float64).ravel()
    oq = np.asarray(out_q, np.float64).ravel()
    corr = np.corrcoef(of, oq)[0, 1]
    assert corr > 0.95, (arch, corr)


def test_conv3d_asymmetric_padding_matches_nn_conv():
    """Conv3d with (lo, hi) pairs == flax nn.Conv with the same explicit
    pads (the TF-SAME contract i3d relies on), float32 exact."""
    from flax import linen as nn

    from cstp_tpu.models.layers import Conv3d, glorot_conv_init

    pads = [(0, 1), (1, 2), (1, 2)]
    x = jnp.asarray(np.random.default_rng(1).normal(
        0, 1, (2, 5, 9, 9, 4)).astype(np.float32))
    a = Conv3d(6, (2, 3, 3), (2, 2, 2), tuple(pads), dtype=jnp.float32)
    b = nn.Conv(6, (2, 3, 3), (2, 2, 2), pads, use_bias=False,
                dtype=jnp.float32, param_dtype=jnp.float32,
                kernel_init=glorot_conv_init())
    va = a.init(jax.random.PRNGKey(2), x)
    out_a = a.apply(va, x)
    out_b = b.apply({"params": {"kernel": va["params"]["kernel"]}}, x)
    np.testing.assert_allclose(np.asarray(out_a), np.asarray(out_b),
                               rtol=1e-6, atol=1e-6)


def test_int8_conv_asymmetric_padding_matches_explicit_pad():
    """ADVICE r4: the int8_conv path through asymmetric (lo, hi) padding —
    what i3d's TF-SAME sites feed it under --quant int8_static since round
    5 — must agree BITWISE with the same int8_conv on an explicitly
    pre-padded input with zero pads (padding handling cannot change the
    integer arithmetic), and track the float conv closely."""
    from flax import linen as nn

    from cstp_tpu.models.layers import glorot_conv_init
    from cstp_tpu.ops.quant import int8_conv

    pads = [(0, 1), (1, 2), (1, 2)]
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(0, 1, (2, 5, 9, 9, 4)).astype(np.float32))
    w = jnp.asarray(rng.normal(0, 0.2, (2, 3, 3, 4, 6)).astype(np.float32))

    out_a = int8_conv(x, w, (2, 2, 2), tuple(pads), jnp.float32,
                      act_scale=0.05)
    xp = jnp.pad(x, [(0, 0)] + [(lo, hi) for lo, hi in pads] + [(0, 0)])
    out_b = int8_conv(xp, w, (2, 2, 2), ((0, 0), (0, 0), (0, 0)),
                      jnp.float32, act_scale=0.05)
    np.testing.assert_array_equal(np.asarray(out_a), np.asarray(out_b))

    ref = nn.Conv(6, (2, 3, 3), (2, 2, 2), pads, use_bias=False,
                  dtype=jnp.float32, param_dtype=jnp.float32,
                  kernel_init=glorot_conv_init())
    out_f = ref.apply({"params": {"kernel": w}}, x)
    of = np.asarray(out_f, np.float64).ravel()
    oq = np.asarray(out_a, np.float64).ravel()
    corr = np.corrcoef(of, oq)[0, 1]
    assert corr > 0.99, corr
