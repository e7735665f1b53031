"""NT-Xent loss parity vs the reference torch implementation semantics."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cstp_tpu.ssl.ntxent import cross_replica_ntxent, ntxent_loss


def _torch_style_reference(zi, zj, temperature):
    """Direct numpy transliteration of the reference loss/NTXent.py math:
    cat -> cosine sim -> positives at ±B diagonals -> CE over negatives."""
    z = np.concatenate([zi, zj], 0)
    z = z / np.linalg.norm(z, axis=1, keepdims=True)
    sim = z @ z.T / temperature
    b = zi.shape[0]
    n = 2 * b
    losses = []
    for r in range(n):
        pos = sim[r, (r + b) % n]
        mask = np.ones(n, bool)
        mask[r] = False  # drop self
        denom = np.log(np.exp(sim[r][mask]).sum())
        losses.append(-(pos - denom))
    return np.mean(losses)


def test_matches_reference_math(key):
    zi = np.asarray(jax.random.normal(key, (6, 16)))
    zj = np.asarray(jax.random.normal(jax.random.fold_in(key, 1), (6, 16)))
    got = float(ntxent_loss(jnp.asarray(zi), jnp.asarray(zj), 0.5))
    want = _torch_style_reference(zi, zj, 0.5)
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_perfect_alignment_low_loss(key):
    zi = np.asarray(jax.random.normal(key, (8, 32)))
    aligned = float(ntxent_loss(jnp.asarray(zi), jnp.asarray(zi * 3), 0.1))
    shuffled = float(
        ntxent_loss(jnp.asarray(zi), jnp.asarray(np.roll(zi, 1, 0)), 0.1)
    )
    assert aligned < shuffled


def test_cross_replica_gather_equals_global(key):
    """shard_map cross-replica NT-Xent == single-device loss on full batch."""
    from jax.sharding import Mesh, PartitionSpec as P
    from jax.experimental.shard_map import shard_map

    devs = jax.devices()[:4]
    mesh = Mesh(np.asarray(devs), ("data",))
    zi = jax.random.normal(key, (8, 16))
    zj = jax.random.normal(jax.random.fold_in(key, 1), (8, 16))

    want = float(ntxent_loss(zi, zj, 0.5))

    f = shard_map(
        lambda a, b: cross_replica_ntxent(a, b, 0.5, "data")[None],
        mesh=mesh,
        in_specs=(P("data"), P("data")),
        out_specs=P("data"),
    )
    got = np.asarray(f(zi, zj))
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_ntxent_matches_reference_module():
    """Numeric parity vs the reference's ACTUAL NTXentLoss
    (loss/NTXent.py:5-62, use_cosine_similarity=True)."""
    import importlib.util
    import os
    import sys

    ref = "/root/reference/loss/NTXent.py"
    if not os.path.exists(ref):
        pytest.skip("reference tree not available")
    torch = pytest.importorskip("torch")
    spec = importlib.util.spec_from_file_location("ref_ntxent", ref)
    mod = importlib.util.module_from_spec(spec)
    sys.modules["ref_ntxent"] = mod
    spec.loader.exec_module(mod)

    rng = np.random.default_rng(2)
    b, d, temp = 6, 16, 0.5
    zi = rng.normal(0, 1, (b, d)).astype(np.float32)
    zj = rng.normal(0, 1, (b, d)).astype(np.float32)
    tloss = mod.NTXentLoss("cpu", b, temp, True)(
        torch.from_numpy(zi), torch.from_numpy(zj))
    ours = ntxent_loss(jnp.asarray(zi), jnp.asarray(zj), temperature=temp)
    np.testing.assert_allclose(float(ours), float(tloss), rtol=1e-5)
