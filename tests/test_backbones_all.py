"""Forward-shape tests for every backbone family + spec-driven BYOL heads.

First run compiles (slow on the 1-core CI host) but populates the
persistent JAX compile cache set up in conftest; reruns are seconds.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cstp_tpu.models import backbone_spec, make_backbone
from cstp_tpu.models.s3dg import space_to_depth_stem
from cstp_tpu.ssl.byol import CSTPPretrain

B, T, S = 1, 4, 32



@pytest.mark.parametrize(
    "name,depth,feat",
    [("c3d", 1, 512), ("r3d", 10, 512), ("r3d", 18, 512),
     ("s3d", 1, 1024), ("i3d", 1, 1024)],
)
def test_backbone_forward_dims(key, name, depth, feat):
    m = make_backbone(name, depth, dtype=jnp.float32)
    x = jnp.zeros((B, T, S, S, 3), jnp.float32)
    v = m.init(key, x, train=False)
    out = m.apply(v, x, train=False)
    assert out.shape == (B, feat)
    assert backbone_spec(name, depth).feat_dim == feat


def test_s3d_projector(key):
    m = make_backbone("s3d", 1, dtype=jnp.float32, proj_flag=True)
    x = jnp.zeros((B, T, S, S, 3), jnp.float32)
    v = m.init(key, x, train=False)
    feat, proj = m.apply(v, x, train=False)
    # s3d projector: 1024 -> 1024 with 1024 hidden (s3dg.py:229-234)
    assert feat.shape == (B, 1024) and proj.shape == (B, 1024)


def test_c3d_pretrain_heads_are_linear_and_4way(key):
    """c3d family: plain Linear heads, pb/rot 4-way (c3d_byol.py:150-153).

    T=8: c3d has three temporal /2 pools, so clips must be >= 8 frames
    (same constraint as the reference C3D)."""
    model = CSTPPretrain(backbone="c3d", depth=1, dtype=jnp.float32)
    x = jnp.zeros((2, 8, S, S, 3), jnp.float32)
    v = model.init(key, x, x, train=True)
    (byol, logits), _ = model.apply(v, x, x, train=True,
                                    mutable=["batch_stats"])
    p_spa, p_tem, p_pb1, _, p_rot1, _ = logits
    assert p_spa.shape == (2, 5) and p_tem.shape == (2, 5)
    assert p_pb1.shape == (2, 4) and p_rot1.shape == (2, 4)
    # linear style -> head params are a single Dense named 'fc'
    assert "fc" in v["params"]["pb_cls"]
    assert "mlp" not in v["params"]["pb_cls"]
    assert np.isfinite(float(byol))


def test_r3d_shortcut_a(key):
    m = make_backbone("r3d", 10, dtype=jnp.float32, shortcut="A")
    x = jnp.zeros((B, T, S, S, 3), jnp.float32)
    v = m.init(key, x, train=False)
    out = m.apply(v, x, train=False)
    assert out.shape == (B, 512)
    # 'A' shortcut has no projection conv params in downsampling blocks
    flat = jax.tree_util.tree_leaves_with_path(v["params"])
    assert not any("downsample_conv" in jax.tree_util.keystr(p) for p, _ in flat)


def test_space_to_depth_stem():
    x = jnp.arange(2 * 4 * 4 * 4 * 3, dtype=jnp.float32).reshape(2, 4, 4, 4, 3)
    y = space_to_depth_stem(x)
    assert y.shape == (2, 2, 2, 2, 24)
    # energy preserved
    np.testing.assert_allclose(float(jnp.sum(y)), float(jnp.sum(x)))
