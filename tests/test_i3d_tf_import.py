"""kinetics-i3d TF (Sonnet) checkpoint import into the Flax I3D.

Builds a synthetic V1 name-based TF checkpoint with the exact Sonnet naming
(including the Mixed_5b Branch_2 typo the public checkpoint carries) and
verifies every conv kernel / BN stat lands on the right Flax leaf."""

import numpy as np
import pytest

tf = pytest.importorskip("tensorflow")

import jax
import jax.numpy as jnp

from cstp_tpu.models import make_backbone
from cstp_tpu.models.i3d_tf_import import load_tf_i3d, sonnet_name_map


@pytest.fixture(scope="module")
def i3d_vars():
    m = make_backbone("i3d", dtype=jnp.float32)
    x = jnp.zeros((1, 8, 64, 64, 3), jnp.float32)
    v = m.init(jax.random.PRNGKey(0), x, train=False)
    return m, v


def _write_sonnet_ckpt(tmp_path, variables):
    """Emit a V1 name-based checkpoint whose tensors are derived from the
    target shapes with per-tensor constant fingerprints."""
    params = variables["params"]
    fingerprints = {}
    tf.compat.v1.reset_default_graph()
    idx = 1
    with tf.compat.v1.Session() as sess:
        for tf_scope, path in sonnet_name_map("rgb").items():
            unit = params
            for k in path:
                unit = unit[k]
            kshape = np.asarray(unit["conv"]["kernel"]).shape
            c = kshape[-1]
            fingerprints[tf_scope] = idx
            # tiny kernel magnitudes so the 9-layer forward stays finite
            tf.compat.v1.get_variable(
                f"{tf_scope}/conv_3d/w",
                initializer=np.full(kshape, idx * 1e-4, np.float32))
            tf.compat.v1.get_variable(
                f"{tf_scope}/batch_norm/beta",
                initializer=np.full((1, 1, 1, 1, c), idx + 0.25, np.float32))
            tf.compat.v1.get_variable(
                f"{tf_scope}/batch_norm/moving_mean",
                initializer=np.full((1, 1, 1, 1, c), idx + 0.5, np.float32))
            tf.compat.v1.get_variable(
                f"{tf_scope}/batch_norm/moving_variance",
                initializer=np.full((1, 1, 1, 1, c), idx + 0.75, np.float32))
            idx += 1
        sess.run(tf.compat.v1.global_variables_initializer())
        path = tf.compat.v1.train.Saver().save(
            sess, str(tmp_path / "i3d_rgb.ckpt"))
    return path, fingerprints


def test_tf_import_routes_all_units(tmp_path, i3d_vars):
    model, variables = i3d_vars
    ckpt, fp = _write_sonnet_ckpt(tmp_path, variables)
    params, stats = load_tf_i3d(
        dict(variables["params"]), dict(variables["batch_stats"]), ckpt)
    nmap = sonnet_name_map("rgb")
    assert len(nmap) == 3 + 9 * 6  # 3 stem convs + 9 mixed x 6 branches
    for tf_scope, path in nmap.items():
        p = params
        s = stats
        for k in path:
            p = p[k]
            s = s[k]
        i = fp[tf_scope]
        np.testing.assert_allclose(np.asarray(p["conv"]["kernel"]).ravel()[0],
                                   i * 1e-4, rtol=1e-6)
        np.testing.assert_allclose(np.asarray(p["bn"]["bn"]["bias"])[0], i + 0.25)
        np.testing.assert_allclose(np.asarray(p["bn"]["bn"]["scale"]), 1.0)
        np.testing.assert_allclose(np.asarray(s["bn"]["bn"]["mean"])[0], i + 0.5)
        np.testing.assert_allclose(np.asarray(s["bn"]["bn"]["var"])[0], i + 0.75)

    # imported weights run
    x = jnp.zeros((1, 8, 64, 64, 3), jnp.float32)
    out = model.apply({"params": params, "batch_stats": stats}, x, train=False)
    assert out.shape == (1, 1024) and bool(jnp.isfinite(out).all())


def test_tf_import_typo_and_strict(tmp_path, i3d_vars):
    _, variables = i3d_vars
    nmap = sonnet_name_map("rgb")
    assert ("RGB/inception_i3d/Mixed_5b/Branch_2/Conv3d_0a_3x3" in nmap)
    with pytest.raises(Exception):
        load_tf_i3d(dict(variables["params"]),
                    dict(variables["batch_stats"]),
                    str(tmp_path / "nonexistent.ckpt"))
