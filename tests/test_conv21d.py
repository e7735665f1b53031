"""Fused (2+1)D conv block kernel (ops/pallas/conv21d.py) — equivalence vs
the XLA chain in interpret mode, including gradients through the custom VJP
and both BN-group modes."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cstp_tpu.ops.pallas.conv21d import (
    fused_st_conv,
    reference_chain,
    reference_stats,
)


def _setup(key, b=4, t=4, h=8, w=8, cin=8, m=16, cout=8):
    ks = jax.random.split(key, 5)
    x = jax.random.normal(ks[0], (b, t, h, w, cin), jnp.float32)
    ws = jax.random.normal(ks[1], (3, 3, cin, m), jnp.float32) * 0.1
    wt = jax.random.normal(ks[2], (3, m, cout), jnp.float32) * 0.1
    scale = jax.random.normal(ks[3], (m,), jnp.float32) * 0.5
    bias = jax.random.normal(ks[4], (m,), jnp.float32) * 0.1
    return x, ws, wt, scale, bias


@pytest.mark.parametrize("tiling", ["taps9", "clip"])
@pytest.mark.parametrize("groups", [1, 2])
def test_fused_forward_matches_xla_chain(key, groups, tiling):
    x, ws, wt, scale, bias = _setup(key)
    out, gmean, gvar = fused_st_conv(x, ws, wt, scale, bias, groups, 1e-5,
                                     True, tiling)
    rm, rv = reference_stats(x, ws, bn_groups=groups)
    np.testing.assert_allclose(np.asarray(gmean), np.asarray(rm),
                               rtol=2e-2, atol=2e-3)
    np.testing.assert_allclose(np.asarray(gvar), np.asarray(rv),
                               rtol=5e-2, atol=2e-3)
    ref = reference_chain(x, ws, wt, scale, bias, gmean, gvar,
                          bn_groups=groups)
    assert out.shape == ref.shape == (4, 4, 8, 8, 8)
    # bf16 chain: tolerances cover rounding-order differences only
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32),
        rtol=0.1, atol=0.05,
    )


@pytest.mark.parametrize("tiling", ["taps9", "clip"])
def test_fused_temporal_boundaries(key, tiling):
    """First/last output frames use zero temporal padding — verify against
    an explicit XLA conv with the same padding."""
    x, ws, wt, scale, bias = _setup(key, t=3)
    out, gmean, gvar = fused_st_conv(x, ws, wt, scale, bias, 1, 1e-5, True,
                                     tiling)
    ref = reference_chain(x, ws, wt, scale, bias, gmean, gvar, bn_groups=1)
    for frame in (0, x.shape[1] - 1):
        np.testing.assert_allclose(
            np.asarray(out[:, frame], np.float32),
            np.asarray(ref[:, frame], np.float32),
            rtol=0.1, atol=0.05,
        )


def test_fused_gradients_match_xla(key):
    """custom-VJP backward (XLA recompute incl. grads through batch stats)
    == autodiff of the all-XLA chain."""
    x, ws, wt, scale, bias = _setup(key, b=2, t=3, h=6, w=6, cin=4, m=8,
                                    cout=4)

    def loss_fused(x_, ws_, wt_, s_, b_):
        out, _, _ = fused_st_conv(x_, ws_, wt_, s_, b_, 2, 1e-5, True)
        return jnp.sum(out.astype(jnp.float32) ** 2)

    def loss_ref(x_, ws_, wt_, s_, b_):
        gm, gv = reference_stats(x_, ws_, bn_groups=2)
        out = reference_chain(x_, ws_, wt_, s_, b_, gm, gv, bn_groups=2)
        return jnp.sum(out.astype(jnp.float32) ** 2)

    gf = jax.grad(loss_fused, argnums=(0, 1, 2, 3, 4))(x, ws, wt, scale, bias)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2, 3, 4))(x, ws, wt, scale, bias)
    for a, b_ in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=0.15, atol=0.05)


def test_fused_module_falls_through_on_non_tpu_backend(key):
    """--fused_conv on a non-TPU backend (this CPU test mesh, the driver
    dryrun) must not reach the Mosaic kernel: SpatioTemporalConv falls
    through to the unfused XLA chain for BOTH init and train-mode apply."""
    from cstp_tpu.models.layers import SpatioTemporalConv

    assert jax.default_backend() != "tpu"
    mod = SpatioTemporalConv(8, (3, 3, 3), padding=(1, 1, 1),
                             dtype=jnp.float32, fused=True)
    x = jax.random.normal(key, (2, 4, 8, 8, 3), jnp.float32)
    variables = mod.init(jax.random.PRNGKey(0), x, train=True)
    out, _ = mod.apply(variables, x, train=True,
                       mutable=["batch_stats", "intermediates"])
    assert out.shape == (2, 4, 8, 8, 8)
    unfused = SpatioTemporalConv(8, (3, 3, 3), padding=(1, 1, 1),
                                 dtype=jnp.float32, fused=False)
    ref, _ = unfused.apply(variables, x, train=True,
                           mutable=["batch_stats", "intermediates"])
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-6, atol=1e-6)
