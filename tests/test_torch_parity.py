"""Numerics parity vs the PyTorch reference: weight-transplant tests.

Builds the reference torch model (imported read-only from /root/reference),
copies its randomly-initialized weights + BN running stats into our Flax
model, and checks both produce the same outputs on the same input. This is
direct evidence for the accuracy-parity north star (BASELINE.md): identical
functions + identical data pipeline => identical training trajectories.

Reference modules are imported at test time only (never copied); skipped
when the reference tree or torch is unavailable.
"""

import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REF = "/root/reference"


def _ref_module(path, name):
    import importlib.util
    import os

    if not os.path.isdir(REF):
        pytest.skip("reference tree not available")
    spec = importlib.util.spec_from_file_location(name, f"{REF}/{path}")
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


def _t2j_conv(w):
    """torch Conv3d OIDHW -> flax DHWIO."""
    return np.transpose(w.detach().numpy(), (2, 3, 4, 1, 0))


def _t2j_linear(w):
    """torch Linear (out, in) -> flax (in, out)."""
    return w.detach().numpy().T


def _bn_into(params_bn, stats_bn, tmod):
    params_bn["scale"] = tmod.weight.detach().numpy()
    params_bn["bias"] = tmod.bias.detach().numpy()
    stats_bn["mean"] = tmod.running_mean.detach().numpy()
    stats_bn["var"] = tmod.running_var.detach().numpy()


def _stconv_into(params, stats, tmod):
    """reference SpatioTemporalConv -> our SpatioTemporalConv subtree."""
    params["spatial_conv"]["kernel"] = _t2j_conv(tmod.spatial_conv.weight)
    params["temporal_conv"]["kernel"] = _t2j_conv(tmod.temporal_conv.weight)
    _bn_into(params["bn"]["bn"], stats["bn"]["bn"], tmod.bn)


def _mlp_into(params, stats, tseq):
    """torch Sequential(Linear, BN1d, ReLU, Linear) -> our MLPHead."""
    params["fc1"]["kernel"] = _t2j_linear(tseq[0].weight)
    params["fc1"]["bias"] = tseq[0].bias.detach().numpy()
    _bn_into(params["bn"]["bn"], stats["bn"]["bn"], tseq[1])
    params["fc2"]["kernel"] = _t2j_linear(tseq[3].weight)
    params["fc2"]["bias"] = tseq[3].bias.detach().numpy()


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


def _reslayer_into(params, stats, tlayer):
    _resblock_into(params["block1"], stats["block1"], tlayer.block1)
    for i, tb in enumerate(tlayer.blocks):
        _resblock_into(params[f"block{i + 2}"], stats[f"block{i + 2}"], tb)


def _r21d_into(params, stats, tnet):
    _stconv_into(params["conv1"], stats["conv1"], tnet.conv1)
    _bn_into(params["bn1"]["bn"], stats["bn1"]["bn"], tnet.bn1)
    for i in (2, 3, 4, 5):
        _reslayer_into(params[f"conv{i}"], stats[f"conv{i}"],
                       getattr(tnet, f"conv{i}"))
    if getattr(tnet, "proj_flag", False):
        _mlp_into(params["project"], stats["project"], tnet.project.net)


def _to_mutable(tree):
    import flax

    return flax.core.unfreeze(tree) if hasattr(flax.core, "unfreeze") else tree


@pytest.fixture(scope="module")
def ref_r21d():
    return _ref_module("models/pace/r21d_byol.py", "ref_r21d_byol")


def _make_input(shape, seed=0):
    rng = np.random.default_rng(seed)
    # value range of tf-normalized clips
    return (rng.uniform(-1, 1, shape)).astype(np.float32)


def _warm_bn_stats(tnet, x, steps=2):
    """Run torch forwards in train mode so running stats are nontrivial."""
    tnet.train()
    with torch.no_grad():
        for _ in range(steps):
            tnet(torch.from_numpy(x))
    tnet.eval()


@pytest.mark.parametrize("layer_sizes", [(1, 1, 1, 1), (2, 2, 2, 2)])
def test_r21d_backbone_forward_matches_torch(ref_r21d, layer_sizes):
    import jax.numpy as jnp

    from cstp_tpu.models.r21d import R2Plus1DNet

    tnet = ref_r21d.R2Plus1DNet(layer_sizes=layer_sizes, proj_flag=True)
    x = _make_input((2, 3, 8, 56, 56))
    _warm_bn_stats(tnet, x)
    with torch.no_grad():
        tfeat, tproj = tnet(torch.from_numpy(x))

    import jax

    fnet = R2Plus1DNet(layer_sizes=layer_sizes, proj_flag=True,
                       dtype=jnp.float32)
    xj = jnp.asarray(np.transpose(x, (0, 2, 3, 4, 1)))  # NCDHW -> NDHWC
    variables = _to_mutable(fnet.init(jax.random.PRNGKey(0), xj, train=False))
    _r21d_into(variables["params"], variables["batch_stats"], tnet)
    feat, proj = fnet.apply(variables, xj, train=False)

    np.testing.assert_allclose(np.asarray(feat), tfeat.numpy(),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(proj), tproj.numpy(),
                               rtol=2e-3, atol=2e-3)


def test_r21d_classify_forward_matches_torch(ref_r21d):
    """Finetune/test path: backbone -> l2norm -> BN -> linear
    (reference forward o_type='ft_all'/'test', r21d_byol.py:394-399)."""
    import jax
    import jax.numpy as jnp

    from cstp_tpu.ssl.byol import CSTPClassify

    tmod = ref_r21d.R21DBYOL(pretrain=False, num_classes=11, cls_bn=True)
    x = _make_input((2, 3, 8, 56, 56), seed=1)
    tmod.train()
    with torch.no_grad():
        for _ in range(2):
            tmod(torch.from_numpy(x), o_type="ft_all")
    tmod.eval()
    with torch.no_grad():
        tlogits = tmod(torch.from_numpy(x), o_type="test")

    fmod = CSTPClassify(backbone="r21d", depth=1, num_classes=11,
                        cls_bn=True, dtype=jnp.float32)
    xj = jnp.asarray(np.transpose(x, (0, 2, 3, 4, 1)))
    variables = _to_mutable(fmod.init(jax.random.PRNGKey(0), xj, train=False))
    p, s = variables["params"], variables["batch_stats"]
    _r21d_into(p["online_net"], s["online_net"], tmod.online_net)
    _bn_into(p["cls_bn"]["bn"], s["cls_bn"]["bn"], tmod.cls_bn)
    p["classify"]["kernel"] = _t2j_linear(tmod.classify.weight)
    p["classify"]["bias"] = tmod.classify.bias.detach().numpy()
    logits = fmod.apply(variables, xj, train=False)

    np.testing.assert_allclose(np.asarray(logits), tlogits.numpy(),
                               rtol=2e-3, atol=2e-3)


def test_r21d_byol_loss_and_heads_match_torch(ref_r21d):
    """Full pretrain forward (o_type='loss_com'): BYOL loss + 6 pretext
    logits match the reference bit-for-bit-ish in eval mode.

    Eval mode sidesteps batch-stat updates; train-mode parity is covered by
    the per-view BN semantics test in test_pretrain_step.py.
    """
    import jax
    import jax.numpy as jnp

    from cstp_tpu.ssl.byol import CSTPPretrain

    tmod = ref_r21d.R21DBYOL(pretrain=True)
    x1 = _make_input((2, 3, 8, 56, 56), seed=2)
    x2 = _make_input((2, 3, 8, 56, 56), seed=3)
    tmod.train()
    with torch.no_grad():  # warm BN stats through the loss_com path
        tmod(torch.from_numpy(x1), torch.from_numpy(x2), o_type="loss_com")
    tmod.eval()
    with torch.no_grad():
        tloss, touts = tmod(torch.from_numpy(x1), torch.from_numpy(x2),
                            o_type="loss_com")

    fmod = CSTPPretrain(backbone="r21d", depth=1, dtype=jnp.float32)
    xj1 = jnp.asarray(np.transpose(x1, (0, 2, 3, 4, 1)))
    xj2 = jnp.asarray(np.transpose(x2, (0, 2, 3, 4, 1)))
    variables = _to_mutable(
        fmod.init(jax.random.PRNGKey(0), xj1, xj2, train=False))
    p, s = variables["params"], variables["batch_stats"]
    _r21d_into(p["online_net"], s["online_net"], tmod.online_net)
    _r21d_into(p["target_net"], s["target_net"], tmod.target_net)
    _mlp_into(p["predictor"], s["predictor"], tmod.predictor.net)
    for name, tseq in (("overlap_spa", tmod.overlap_spa),
                       ("overlap_tem", tmod.overlap_tem),
                       ("pb_cls", tmod.pb_cls),
                       ("rotate_cls", tmod.rotate_cls)):
        _mlp_into(p[name]["mlp"], s[name]["mlp"], tseq)
    loss, outs = fmod.apply(variables, xj1, xj2, train=False)

    # reference returns per-sample byol loss summed over both directions;
    # our engine returns its mean
    np.testing.assert_allclose(float(loss), float(tloss.mean()),
                               rtol=2e-3, atol=2e-3)
    tnames = ["pred_spa", "pred_tem", "pb1", "pb2", "rot1", "rot2"]
    for name, ours, theirs in zip(tnames, outs, touts):
        np.testing.assert_allclose(
            np.asarray(ours), theirs.numpy(), rtol=2e-3, atol=2e-3,
            err_msg=f"pretext head {name} mismatch")
