"""Weight-transplant parity for the legacy pace-era model zoo.

Each test builds the reference torch module (read-only import from
/root/reference/models/pace/*.py), copies its randomly-initialized weights
and warmed BN running stats into the corresponding
:mod:`cstp_tpu.models.legacy` Flax module, and checks both produce the same
outputs on the same input (eval mode; NCDHW -> NDHWC transposed).

Covers SURVEY §2.2 rows: "R(2+1)D legacy pace" (r21d.py), "C3D legacy"
(c3d.py), "R3D legacy pace" (r3d.py), and "S3D-G legacy pace incl. the
space-to-depth trick" (s3d_g.py).
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
# Multi-threaded torch CPU reductions are nondeterministic and were observed
# to push the deep S3D-G comparison just past tolerance on rare runs; pin to
# one thread so the reference side of the transplant is bit-stable.
torch.set_num_threads(1)

from test_torch_parity import (  # noqa: E402
    _bn_into,
    _make_input,
    _mlp_into,
    _ref_module,
    _t2j_conv,
    _t2j_linear,
    _to_mutable,
)

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from cstp_tpu.models.legacy import make_legacy_model  # noqa: E402


# ---------------------------------------------------------------------------
# fixtures
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def ref_pace_r21d():
    return _ref_module("models/pace/r21d.py", "ref_pace_r21d")


@pytest.fixture(scope="module")
def ref_pace_c3d():
    return _ref_module("models/pace/c3d.py", "ref_pace_c3d")


@pytest.fixture(scope="module")
def ref_pace_r3d():
    return _ref_module("models/pace/r3d.py", "ref_pace_r3d")


@pytest.fixture(scope="module")
def ref_pace_s3dg():
    return _ref_module("models/pace/s3d_g.py", "ref_pace_s3dg")


def _ndhwc(x):
    return jnp.asarray(np.transpose(x, (0, 2, 3, 4, 1)))


# ---------------------------------------------------------------------------
# transplant helpers (legacy-specific naming)
# ---------------------------------------------------------------------------

def _stconv_into(params, stats, tmod):
    """pace/r21d.py SpatioTemporalConv (identical to r21d_byol.py's)."""
    params["spatial_conv"]["kernel"] = _t2j_conv(tmod.spatial_conv.weight)
    params["temporal_conv"]["kernel"] = _t2j_conv(tmod.temporal_conv.weight)
    _bn_into(params["bn"]["bn"], stats["bn"]["bn"], tmod.bn)


def _resblock_into(params, stats, tblock):
    _stconv_into(params["conv1"], stats["conv1"], tblock.conv1)
    _bn_into(params["bn1"]["bn"], stats["bn1"]["bn"], tblock.bn1)
    _stconv_into(params["conv2"], stats["conv2"], tblock.conv2)
    _bn_into(params["bn2"]["bn"], stats["bn2"]["bn"], tblock.bn2)
    if tblock.downsample:
        _stconv_into(params["downsampleconv"], stats["downsampleconv"],
                     tblock.downsampleconv)
        _bn_into(params["downsamplebn"]["bn"], stats["downsamplebn"]["bn"],
                 tblock.downsamplebn)


def _trunk_into(params, stats, tnet):
    """pace/r21d.py R2Plus1DNet trunk -> our models.r21d.R2Plus1DNet."""
    _stconv_into(params["conv1"], stats["conv1"], tnet.conv1)
    _bn_into(params["bn1"]["bn"], stats["bn1"]["bn"], tnet.bn1)
    for i in (2, 3, 4, 5):
        tlayer = getattr(tnet, f"conv{i}")
        _resblock_into(params[f"conv{i}"]["block1"],
                       stats[f"conv{i}"]["block1"], tlayer.block1)
        for j, tb in enumerate(tlayer.blocks):
            _resblock_into(params[f"conv{i}"][f"block{j + 2}"],
                           stats[f"conv{i}"][f"block{j + 2}"], tb)


def _legacy_projector_into(params, stats, tproj):
    """Projector = Linear-BN-ReLU-Linear-BN-ReLU (pace/r21d.py:242-256)."""
    _mlp_into(params["mlp"], stats["mlp"], tproj.net)
    _bn_into(params["bn2"]["bn"], stats["bn2"]["bn"], tproj.net[4])


def _pace_net_into(params, stats, tnet):
    """pace/r21d.py R2Plus1DNet(linear_flag) -> our LegacyR21DPace."""
    _trunk_into(params["trunk"], stats["trunk"], tnet)
    if tnet.linear_flag == "linear":
        params["linear"]["kernel"] = _t2j_linear(tnet.linear.weight)
        params["linear"]["bias"] = tnet.linear.bias.detach().numpy()
    else:
        _legacy_projector_into(params["project"], stats["project"],
                               tnet.project)


def _dense_into(params, tmod):
    params["kernel"] = _t2j_linear(tmod.weight)
    params["bias"] = tmod.bias.detach().numpy()


# ---------------------------------------------------------------------------
# R(2+1)D legacy pace (pace/r21d.py)
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("linear_flag", ["linear", "project"])
def test_legacy_r21d_pace_forward_matches_torch(ref_pace_r21d, linear_flag):
    tnet = ref_pace_r21d.R2Plus1DNet(linear_flag=linear_flag)
    x = _make_input((2, 3, 8, 56, 56), seed=10)
    tnet.train()
    with torch.no_grad():
        for _ in range(2):
            tnet(torch.from_numpy(x))
    tnet.eval()
    with torch.no_grad():
        tout = tnet(torch.from_numpy(x))

    fnet = make_legacy_model("r21d", linear_flag=linear_flag,
                             dtype=jnp.float32)
    variables = _to_mutable(
        fnet.init(jax.random.PRNGKey(0), _ndhwc(x), train=False))
    _pace_net_into(variables["params"], variables["batch_stats"], tnet)
    out = fnet.apply(variables, _ndhwc(x), train=False)
    np.testing.assert_allclose(np.asarray(out), tout.numpy(),
                               rtol=2e-3, atol=2e-3)


def test_legacy_r21d_byol_loss_matches_torch(ref_pace_r21d):
    """o_type='r_byol': 10x-scaled symmetric BYOL loss, including the
    reference's EMA-update-before-target-forward (pace/r21d.py:343-347).
    The reference returns the per-sample loss vector; we return its mean."""
    from cstp_tpu.ssl.byol import ema_update

    tmod = ref_pace_r21d.R21DBYOL()
    x1 = _make_input((2, 3, 8, 56, 56), seed=11)
    x2 = _make_input((2, 3, 8, 56, 56), seed=12)
    tmod.train()
    with torch.no_grad():  # warm BN running stats (also EMA-steps target)
        tmod(torch.from_numpy(x1), torch.from_numpy(x2), o_type="r_byol")
    tmod.eval()

    fmod = make_legacy_model("r21d_byol", dtype=jnp.float32)
    variables = _to_mutable(
        fmod.init(jax.random.PRNGKey(0), _ndhwc(x1), _ndhwc(x2),
                  train=False))
    p, s = variables["params"], variables["batch_stats"]
    _pace_net_into(p["online_net"], s["online_net"], tmod.online_net)
    _pace_net_into(p["target_net"], s["target_net"], tmod.target_net)
    _mlp_into(p["prodictor"], s["prodictor"], tmod.prodictor.net)
    _dense_into(p["classify"], tmod.classify)

    with torch.no_grad():  # this call EMA-updates target, then computes
        tloss = tmod(torch.from_numpy(x1), torch.from_numpy(x2),
                     o_type="r_byol")
    # replicate the in-forward EMA step on our (transplanted) target params
    p["target_net"] = ema_update(p["target_net"], p["online_net"],
                                 tmod.momentum)
    loss = fmod.apply(variables, _ndhwc(x1), _ndhwc(x2), train=False)
    np.testing.assert_allclose(float(loss), float(tloss.mean()),
                               rtol=2e-3, atol=2e-3)


def test_legacy_r21d_byol_ft_fc_matches_torch(ref_pace_r21d):
    """o_type='ft_fc': classify the online project-head output
    (pace/r21d.py:354-357)."""
    tmod = ref_pace_r21d.R21DBYOL(num_classes=7)
    x = _make_input((2, 3, 8, 56, 56), seed=13)
    tmod.train()
    with torch.no_grad():
        tmod(torch.from_numpy(x), o_type="ft_fc")
    tmod.eval()
    with torch.no_grad():
        tlogits = tmod(torch.from_numpy(x), o_type="ft_fc")

    fmod = make_legacy_model("r21d_byol", num_classes=7, dtype=jnp.float32)
    variables = _to_mutable(
        fmod.init(jax.random.PRNGKey(0), _ndhwc(x), _ndhwc(x), train=False))
    p, s = variables["params"], variables["batch_stats"]
    _pace_net_into(p["online_net"], s["online_net"], tmod.online_net)
    _pace_net_into(p["target_net"], s["target_net"], tmod.target_net)
    _mlp_into(p["prodictor"], s["prodictor"], tmod.prodictor.net)
    _dense_into(p["classify"], tmod.classify)
    logits = fmod.apply(variables, _ndhwc(x), train=False,
                        method=fmod.classify_forward)
    np.testing.assert_allclose(np.asarray(logits), tlogits.numpy(),
                               rtol=2e-3, atol=2e-3)


# ---------------------------------------------------------------------------
# C3D legacy (pace/c3d.py)
# ---------------------------------------------------------------------------

def _legacy_c3d_into(params, stats, tnet):
    for stage in ("conv1", "conv2", "conv3a", "conv3b", "conv4a", "conv4b",
                  "conv5a", "conv5b"):
        tconv = getattr(tnet, stage)
        tbn = getattr(tnet, "bn" + stage[4:])
        params[stage]["conv"]["kernel"] = _t2j_conv(tconv.weight)
        params[stage]["conv"]["bias"] = tconv.bias.detach().numpy()
        _bn_into(params[stage]["bn"]["bn"], stats[stage]["bn"]["bn"], tbn)


def test_legacy_c3d_ctr_and_cls_match_torch(ref_pace_c3d):
    tnet = ref_pace_c3d.C3D(num_classes=6)
    x1 = _make_input((2, 3, 8, 48, 48), seed=14)
    x2 = _make_input((2, 3, 8, 48, 48), seed=15)
    tnet.train()
    with torch.no_grad():
        tnet(torch.from_numpy(x1), torch.from_numpy(x2), o_type="ctr")
    tnet.eval()
    with torch.no_grad():
        tf1, tf2 = tnet(torch.from_numpy(x1), torch.from_numpy(x2),
                        o_type="ctr")
        tcls = tnet(torch.from_numpy(x1), None, o_type="cls")

    fmod = make_legacy_model("c3d", num_classes=6, dtype=jnp.float32)
    variables = _to_mutable(
        fmod.init(jax.random.PRNGKey(0), _ndhwc(x1), _ndhwc(x2),
                  train=False))
    p, s = variables["params"], variables["batch_stats"]
    _legacy_c3d_into(p["trunk"], s["trunk"], tnet)
    _dense_into(p["classify"], tnet.classify)
    f1, f2 = fmod.apply(variables, _ndhwc(x1), _ndhwc(x2), train=False)
    np.testing.assert_allclose(np.asarray(f1), tf1.numpy(),
                               rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(np.asarray(f2), tf2.numpy(),
                               rtol=2e-3, atol=2e-3)
    cls = fmod.apply(variables, _ndhwc(x1), train=False, method=fmod.cls)
    np.testing.assert_allclose(np.asarray(cls), tcls.numpy(),
                               rtol=2e-3, atol=2e-3)


# ---------------------------------------------------------------------------
# R3D legacy pace (pace/r3d.py) — full-3D convs
# ---------------------------------------------------------------------------

def _full_conv_into(params, tmod):
    params["conv"]["kernel"] = _t2j_conv(tmod.temporal_spatial_conv.weight)


def _legacy_r3d_block_into(params, stats, tblock):
    _full_conv_into(params["conv1"], tblock.conv1)
    _bn_into(params["bn1"]["bn"], stats["bn1"]["bn"], tblock.bn1)
    _full_conv_into(params["conv2"], tblock.conv2)
    _bn_into(params["bn2"]["bn"], stats["bn2"]["bn"], tblock.bn2)
    if tblock.downsample:
        _full_conv_into(params["downsampleconv"], tblock.downsampleconv)
        _bn_into(params["downsamplebn"]["bn"], stats["downsamplebn"]["bn"],
                 tblock.downsamplebn)


@pytest.mark.parametrize("layer_sizes", [(1, 1, 1, 1), (2, 1, 1, 1)])
def test_legacy_r3d_forward_matches_torch(ref_pace_r3d, layer_sizes):
    tnet = ref_pace_r3d.R3DNet(layer_sizes=layer_sizes, num_classes=4)
    x = _make_input((2, 3, 8, 56, 56), seed=16)
    tnet.train()
    with torch.no_grad():
        tnet(torch.from_numpy(x))
    tnet.eval()
    with torch.no_grad():
        tout = tnet(torch.from_numpy(x))

    fnet = make_legacy_model("r3d", layer_sizes=layer_sizes,
                             dtype=jnp.float32)
    variables = _to_mutable(
        fnet.init(jax.random.PRNGKey(0), _ndhwc(x), train=False))
    p, s = variables["params"], variables["batch_stats"]
    _full_conv_into(p["conv1"], tnet.conv1)
    _bn_into(p["bn1"]["bn"], s["bn1"]["bn"], tnet.bn1)
    for i in (2, 3, 4, 5):
        tlayer = getattr(tnet, f"conv{i}")
        _legacy_r3d_block_into(p[f"conv{i}_b1"], s[f"conv{i}_b1"],
                               tlayer.block1)
        for j, tb in enumerate(tlayer.blocks):
            _legacy_r3d_block_into(p[f"conv{i}_b{j + 2}"],
                                   s[f"conv{i}_b{j + 2}"], tb)
    _dense_into(p["linear"], tnet.linear)
    out = fnet.apply(variables, _ndhwc(x), train=False)
    np.testing.assert_allclose(np.asarray(out), tout.numpy(),
                               rtol=2e-3, atol=2e-3)


# ---------------------------------------------------------------------------
# S3D-G legacy pace (pace/s3d_g.py) — incl. the space-to-depth stem
# ---------------------------------------------------------------------------

def _legacy_stconv_into(params, stats, tmod):
    params["conv1"]["kernel"] = _t2j_conv(tmod.conv1.weight)
    _bn_into(params["bn1"]["bn"], stats["bn1"]["bn"], tmod.bn1)
    if tmod.separable:
        params["conv2"]["kernel"] = _t2j_conv(tmod.conv2.weight)
        _bn_into(params["bn2"]["bn"], stats["bn2"]["bn"], tmod.bn2)


def _legacy_inception_into(params, stats, tmod):
    for name in ("conv_b0", "conv_b1_a", "conv_b1_b", "conv_b2_a",
                 "conv_b2_b", "conv_b3_b"):
        _legacy_stconv_into(params[name], stats[name], getattr(tmod, name))
    for name in ("gating_b0", "gating_b1", "gating_b2", "gating_b3"):
        _dense_into(params[name]["fc"], getattr(tmod, name).fc)


@pytest.mark.parametrize("space_to_depth", [True, False])
def test_legacy_s3dg_forward_matches_torch(ref_pace_s3dg, space_to_depth):
    tnet = ref_pace_s3dg.S3D(num_classes=17, space_to_depth=space_to_depth)
    x = _make_input((2, 3, 8, 64, 64), seed=17)
    tnet.train()
    with torch.no_grad():
        tnet(torch.from_numpy(x))
    tnet.eval()
    with torch.no_grad():
        tout = tnet(torch.from_numpy(x))

    fnet = make_legacy_model("s3d_g", num_classes=17,
                             space_to_depth=space_to_depth,
                             dtype=jnp.float32)
    variables = _to_mutable(
        fnet.init(jax.random.PRNGKey(0), _ndhwc(x), train=False))
    p, s = variables["params"], variables["batch_stats"]
    for name in ("conv1", "conv_2b", "conv_2c"):
        _legacy_stconv_into(p[name], s[name], getattr(tnet, name))
    _dense_into(p["gating"]["fc"], tnet.gating.fc)
    for name in ("mixed_3b", "mixed_3c", "mixed_4b", "mixed_4c", "mixed_4d",
                 "mixed_4e", "mixed_4f", "mixed_5b", "mixed_5c"):
        _legacy_inception_into(p[name], s[name], getattr(tnet, name))
    _dense_into(p["fc"], tnet.fc)
    out = fnet.apply(variables, _ndhwc(x), train=False)
    np.testing.assert_allclose(np.asarray(out), tout.numpy(),
                               rtol=5e-3, atol=5e-3)


def test_make_legacy_model_rejects_unknown():
    with pytest.raises(ValueError, match="unknown legacy model"):
        make_legacy_model("vit")
