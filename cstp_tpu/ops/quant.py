"""Dynamically-quantized int8 forward convolutions (``--quant int8``).

The v5e MXU runs int8 contractions at 394 TOPS vs 197 TFLOP/s bf16, and the
measured gap on the step's hot conv shape is 3.8x (perf/probe_int8.py:
bf16 37.4 TFLOP/s vs int8 142 TOPS, dequant epilogue fused). The pretrain
step is memory-bound, so the second effect matters as much: the backward
residual saved for each conv is the INT8 activation + one f32 scale —
half the bytes of the bf16 activation the unquantized path saves.

Scheme (AQT-style dynamic symmetric quantization):
* activations: per-TENSOR scale  sx = absmax(x)/127  (recomputed per step);
* weights:     per-OUT-CHANNEL   sw[c] = absmax(w[...,c])/127;
* conv int8 x int8 -> int32, dequantized by sx*sw in the epilogue (fuses).

Backward is straight-through (arXiv:1308.3432; standard QAT practice): the
VJP differentiates the bf16 convolution at the DEQUANTIZED input x_hat =
xq*sx — the gradient of the function the forward actually computed, with
identity estimation through the round/clip. Gradients therefore remain
bf16/f32; only forward compute and saved residuals are 8-bit.

This changes training numerics (quantization noise on every tower conv), so
the flag is gated on the long-horizon learning-evidence harness re-running
clean (docs/LEARNING.md protocol) — VERDICT r2 #9's condition.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

_EPS = 1e-12


def _quantize_tensor(x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Symmetric per-tensor int8: (xq, scale)."""
    xf = x.astype(jnp.float32)
    scale = jnp.max(jnp.abs(xf)) / 127.0 + _EPS
    xq = jnp.clip(jnp.round(xf / scale), -127, 127).astype(jnp.int8)
    return xq, scale


def _quantize_weight(w: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Symmetric per-out-channel int8 over a DHWIO kernel: (wq, (Cout,))."""
    wf = w.astype(jnp.float32)
    scale = jnp.max(jnp.abs(wf), axis=tuple(range(wf.ndim - 1))) / 127.0 + _EPS
    wq = jnp.clip(jnp.round(wf / scale), -127, 127).astype(jnp.int8)
    return wq, scale


def _conv(x, w, stride, padding, acc_dtype):
    nd = ("NDHWC", "DHWIO", "NDHWC") if x.ndim == 5 else \
         ("NHWC", "HWIO", "NHWC")
    # padding entries: int (symmetric) or (lo, hi) pair (TF-SAME backbones
    # like i3d use bottom-heavy asymmetric pads)
    pads = [(p, p) if isinstance(p, int) else tuple(p) for p in padding]
    return jax.lax.conv_general_dilated(
        x, w, stride, pads,
        dimension_numbers=nd, preferred_element_type=acc_dtype,
    )


def _int8_conv_fwd_impl(x, w, stride, padding, act_scale, dynamic):
    if dynamic:
        xq, sx = _quantize_tensor(x)
    else:
        # static activation scale (traced scalar — a calibrated per-site
        # value or a fixed constant): no absmax reduce, so the quantize is
        # pure elementwise and fuses into the producer epilogue. Clips
        # outliers beyond 127*scale.
        sx = act_scale.astype(jnp.float32)
        xq = jnp.clip(jnp.round(x.astype(jnp.float32) / sx), -127,
                      127).astype(jnp.int8)
    wq, sw = _quantize_weight(w)
    oi = _conv(xq, wq, stride, padding, jnp.int32)
    out = oi.astype(jnp.float32) * (sx * sw)
    return out, (xq, sx, w)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _int8_conv_core(x, w, act_scale, stride: Tuple[int, ...],
                    padding: Tuple[int, ...], dynamic: bool):
    out, _ = _int8_conv_fwd_impl(x, w, stride, padding, act_scale, dynamic)
    return out


def int8_conv(x, w, stride: Tuple[int, ...], padding: Tuple[int, ...],
              out_dtype=jnp.bfloat16, act_scale=None):
    """int8-quantized convolution with straight-through bf16 backward.

    ``x``: (B, [T,] H, W, Cin) float; ``w``: ([kt,] kh, kw, Cin, Cout)
    float; ``stride``/``padding`` per spatial dim. Returns ``out_dtype``
    (the f32 dequantized result cast outside the custom-VJP core, so the
    dtype is never a traced argument). ``act_scale``: None = dynamic
    per-tensor absmax; a scalar (python float or traced array) = static
    activation scale — no reduce, fuses, clips outliers.
    """
    dynamic = act_scale is None
    sa = (jnp.zeros((), jnp.float32) if dynamic
          else jnp.asarray(act_scale, jnp.float32))
    pads = tuple(p if isinstance(p, int) else tuple(p) for p in padding)
    return _int8_conv_core(x, w, sa, tuple(stride), pads,
                           dynamic).astype(out_dtype)


def _int8_conv_fwd(x, w, act_scale, stride, padding, dynamic):
    out, res = _int8_conv_fwd_impl(x, w, stride, padding, act_scale, dynamic)
    # zero-size carrier for x's dtype (residual leaves must be JAX types)
    return out, res + (jnp.zeros((0,), x.dtype),)


def _int8_conv_bwd(stride, padding, dynamic, res, g):
    xq, sx, w, x_proto = res
    x_dtype = x_proto.dtype
    # dequantized forward input — the point the forward actually evaluated
    xhat = (xq.astype(jnp.float32) * sx).astype(jnp.bfloat16)
    wb = w.astype(jnp.bfloat16)

    def f(x_, w_):
        return _conv(x_, w_, stride, padding, jnp.bfloat16)

    _, vjp = jax.vjp(f, xhat, wb)
    dx, dw = vjp(g.astype(jnp.bfloat16))
    # no gradient to the (calibration-owned) activation scale
    return dx.astype(x_dtype), dw.astype(w.dtype), jnp.zeros((), jnp.float32)


_int8_conv_core.defvjp(_int8_conv_fwd, _int8_conv_bwd)


def activation_absmax_scale(x) -> jnp.ndarray:
    """Calibration observation: per-tensor symmetric int8 scale of ``x``."""
    return jnp.max(jnp.abs(x.astype(jnp.float32))) / 127.0 + _EPS


# ---------------------------------------------------------------------------
# int8 STORAGE chain (--quant int8_store): s8 as the storage dtype of the
# factorized (2+1)D conv chain.
#
# The round-3 campaign measured that int8 ARITHMETIC cannot move the
# memory-bound pretrain step (PERF.md round 6): every `--quant int8` variant
# lost because the s8 quantize wrote a SECOND copy of an activation whose
# bf16 original still materialized for BN statistics, ReLU, and saved
# residuals. This chain is the structural fix that analysis called for
# (VERDICT r3 #1): ONE traced function spans
#
#   quantize(x) -> int8 spatial conv -> [dequant + BN partial moments +
#   requantize]  (conv epilogue: the f32/bf16 mid tensor NEVER reaches HBM;
#   only the s8 mid does) -> [dequant + normalize + ReLU + requantize]
#   (one s8-in/s8-out loop fusion) -> int8 temporal conv -> dequant out
#
# and its custom VJP saves ONLY the s8 tensors (+f32 scalars/(G,C) stats) as
# residuals — halving both the forward activation writes and the backward
# residual reads of the chain (the reference chain being re-stored:
# models/pace/r21d_byol.py:94-97).
#
# Numerics: BN statistics are computed from the DEQUANTIZED s8 mid (so the
# normalization exactly matches the values it is applied to); activation
# scales are DELAYED (previous-step running absmax, held in batch_stats and
# updated each step from exact pre-quantization absmax observations computed
# in the same epilogue — no feedback through clipping), the standard delayed-
# scaling recipe of low-precision training stacks (cf. FP8 Transformer
# Engine). Backward is straight-through at the dequantized points, with the
# exact grouped-BN three-term gradient. Gradients and optimizer state stay
# bf16/f32.
# ---------------------------------------------------------------------------


def _q(x, s):
    """Symmetric int8 quantize at a given (positive) scale."""
    return jnp.clip(jnp.round(x / s), -127, 127).astype(jnp.int8)


def _group_broadcast(p, groups):
    """(B, C) per-sample partials -> per-group mean broadcast back to (B, C)."""
    b, c = p.shape
    g = p.reshape(groups, b // groups, c).mean(axis=1)
    return g, jnp.repeat(g, b // groups, axis=0)


def _bshape(x):
    return (x.shape[0],) + (1,) * (x.ndim - 2) + (x.shape[-1],)


def _store_chain_fwd_impl(x, ws, wt, gamma, beta, s_in, s_mid, s_act,
                          stride_s, pad_s, stride_t, pad_t, groups,
                          observe=True):
    f32 = jnp.float32
    xf = x.astype(f32)
    # observe=False (frozen scales): skip the absmax observation reduces.
    # Measured motivation (PERF.md round 7): each observation is a full
    # reduce whose result must be a KERNEL OUTPUT, which forces the
    # quantize/normalize elementwise chains to materialize as standalone
    # multi-output passes instead of input-fusing into the consumer conv —
    # the +208 ms loop-fusion regression of the observing chain.
    a_in = (jnp.max(jnp.abs(xf)) / 127.0 + _EPS if observe
            else jnp.zeros((), f32))
    xq = _q(xf, s_in)
    wsq, sws = _quantize_weight(ws)
    oi = _conv(xq, wsq, stride_s, pad_s, jnp.int32)
    h = oi.astype(f32) * (s_in * sws)          # epilogue-only f32 mid
    a_mid = (jnp.max(jnp.abs(h)) / 127.0 + _EPS if observe  # pre-quant
             else jnp.zeros((), f32))          # absmax: no clip feedback
    hq = _q(h, s_mid)
    hh = hq.astype(f32) * s_mid                 # stats match the s8 values
    spatial = tuple(range(1, hh.ndim - 1))
    pmean = jnp.mean(hh, axis=spatial)
    psq = jnp.mean(jnp.square(hh), axis=spatial)
    gmean, mean_b = _group_broadcast(pmean, groups)
    gsq, sq_b = _group_broadcast(psq, groups)
    gvar = gsq - jnp.square(gmean)
    var_b = sq_b - jnp.square(mean_b)
    bs = _bshape(hh)
    inv_b = jax.lax.rsqrt(var_b + 1e-5).reshape(bs)
    xnorm = (hh - mean_b.reshape(bs)) * inv_b
    y1 = jax.nn.relu(xnorm * gamma + beta)
    a_act = (jnp.max(y1) / 127.0 + _EPS if observe  # y1 >= 0
             else jnp.zeros((), f32))
    yq = _q(y1, s_act)
    wtq, swt = _quantize_weight(wt)
    oj = _conv(yq, wtq, stride_t, pad_t, jnp.int32)
    out = (oj.astype(f32) * (s_act * swt)).astype(x.dtype)
    res = (xq, hq, yq, ws, wt, gamma, gmean, gvar,
           s_in, s_mid, s_act, jnp.zeros((0,), x.dtype))
    return (out, gmean, gvar, a_in, a_mid, a_act), res


@functools.partial(jax.custom_vjp, nondiff_argnums=(8, 9, 10, 11, 12, 13))
def int8_store_chain(x, ws, wt, gamma, beta, s_in, s_mid, s_act,
                     stride_s, pad_s, stride_t, pad_t, groups,
                     observe=True):
    """spatial conv -> grouped-BN -> ReLU -> temporal conv with s8 STORAGE.

    ``x``: (B, T, H, W, Cin); ``ws``: (1, kh, kw, Cin, M) (passed as its
    (kh, kw, Cin, M) 2D slice is NOT needed — 5D conv throughout);
    ``wt``: (kt, 1, 1, M, Cout); ``gamma``/``beta``: (M,) BN affine;
    ``s_*``: positive f32 scalars — DELAYED activation scales (previous
    step's running absmax, from batch_stats). Returns
    ``(out, gmean, gvar, a_in, a_mid, a_act)``: the chain output, the
    per-group batch statistics (for running-stat EMA), and the three exact
    absmax observations (for the scale updates; zeros when
    ``observe=False``). Only ``out`` carries gradient."""
    out, _ = _store_chain_fwd_impl(x, ws, wt, gamma, beta, s_in, s_mid,
                                   s_act, stride_s, pad_s, stride_t, pad_t,
                                   groups, observe)
    return out


def _store_chain_fwd(x, ws, wt, gamma, beta, s_in, s_mid, s_act,
                     stride_s, pad_s, stride_t, pad_t, groups, observe):
    return _store_chain_fwd_impl(x, ws, wt, gamma, beta, s_in, s_mid, s_act,
                                 stride_s, pad_s, stride_t, pad_t, groups,
                                 observe)


def _store_chain_bwd(stride_s, pad_s, stride_t, pad_t, groups, observe,
                     res, cts):
    g_out = cts[0]  # aux outputs (stats/absmax observations) carry no grad
    (xq, hq, yq, ws, wt, gamma, gmean, gvar,
     s_in, s_mid, s_act, x_proto) = res
    f32, bf16 = jnp.float32, jnp.bfloat16
    b = hq.shape[0]

    # temporal conv VJP at the dequantized stored input
    y_hat = (yq.astype(f32) * s_act).astype(bf16)
    wtb = wt.astype(bf16)
    _, vjp_t = jax.vjp(lambda a, w: _conv(a, w, stride_t, pad_t, bf16),
                       y_hat, wtb)
    dy1, dwt = vjp_t(g_out.astype(bf16))
    # ReLU mask from the stored post-ReLU values (y >= 0; ties at 0 are
    # measure-zero and quantization maps them to exactly 0)
    dpre = dy1.astype(f32) * (y_hat > 0)

    # grouped batch-BN three-term gradient, from the stored s8 mid
    hh = hq.astype(f32) * s_mid
    bs = _bshape(hh)
    mean_b = jnp.repeat(gmean, b // groups, axis=0).reshape(bs)
    var_b = jnp.repeat(gvar, b // groups, axis=0).reshape(bs)
    inv_b = jax.lax.rsqrt(var_b + 1e-5)
    xnorm = (hh - mean_b) * inv_b
    spatial = tuple(range(1, hh.ndim - 1))
    dgamma = jnp.sum(dpre * xnorm, axis=(0,) + spatial)
    dbeta = jnp.sum(dpre, axis=(0,) + spatial)
    m1 = jnp.mean(dpre, axis=spatial)            # (B, M)
    m2 = jnp.mean(dpre * xnorm, axis=spatial)    # (B, M)
    _, gm1_b = _group_broadcast(m1, groups)
    _, gm2_b = _group_broadcast(m2, groups)
    dh = (gamma * inv_b) * (dpre - gm1_b.reshape(bs)
                            - xnorm * gm2_b.reshape(bs))

    # spatial conv VJP at the dequantized stored input
    x_hat = (xq.astype(f32) * s_in).astype(bf16)
    wsb = ws.astype(bf16)
    _, vjp_s = jax.vjp(lambda a, w: _conv(a, w, stride_s, pad_s, bf16),
                       x_hat, wsb)
    dx, dws = vjp_s(dh.astype(bf16))
    zero = jnp.zeros((), f32)
    return (dx.astype(x_proto.dtype), dws.astype(ws.dtype),
            dwt.astype(wt.dtype), dgamma, dbeta, zero, zero, zero)


int8_store_chain.defvjp(_store_chain_fwd, _store_chain_bwd)


def float_store_chain(x, ws, wt, gamma, beta, groups,
                      stride_s, pad_s, stride_t, pad_t,
                      train, ra_mean, ra_var, dtype):
    """The FLOAT reference of the int8_store chain, computed from the same
    parameter set: used for (a) the ``int8_store_calib`` scale-bootstrap
    pass, (b) eval mode of an int8_store model, and (c) equivalence tests.
    Returns ``(out, gmean, gvar, obs)`` with ``obs = (a_in, a_mid, a_act)``
    absmax observations; in eval mode (``train=False``) statistics come from
    ``ra_mean``/``ra_var`` and gmean/gvar are returned as None."""
    f32 = jnp.float32
    xd = x.astype(dtype)
    a_in = jnp.max(jnp.abs(xd.astype(f32))) / 127.0 + _EPS
    h = _conv(xd, ws.astype(dtype), stride_s, pad_s, dtype)
    hf = h.astype(f32)
    a_mid = jnp.max(jnp.abs(hf)) / 127.0 + _EPS
    bs = _bshape(hf)
    if train:
        spatial = tuple(range(1, hf.ndim - 1))
        pmean = jnp.mean(hf, axis=spatial)
        psq = jnp.mean(jnp.square(hf), axis=spatial)
        gmean, mean_b = _group_broadcast(pmean, groups)
        gsq, sq_b = _group_broadcast(psq, groups)
        gvar = gsq - jnp.square(gmean)
        var_b = sq_b - jnp.square(mean_b)
        xnorm = (hf - mean_b.reshape(bs)) * jax.lax.rsqrt(
            var_b.reshape(bs) + 1e-5)
    else:
        gmean = gvar = None
        xnorm = (hf - ra_mean) * jax.lax.rsqrt(ra_var + 1e-5)
    y1 = jax.nn.relu(xnorm * gamma + beta)
    a_act = jnp.max(y1) / 127.0 + _EPS
    out = _conv(y1.astype(dtype), wt.astype(dtype), stride_t, pad_t, dtype)
    return out, gmean, gvar, (a_in, a_mid, a_act)


def check_int8_calibrated(batch_stats, context: str) -> int:
    """Guard for ``--quant int8_static``: raise unless every conv site in
    ``batch_stats`` carries a CALIBRATED (non-zero) ``act_scale``.

    A float checkpoint restored by merge-by-name fills ``act_scale`` with 0;
    quantizing with a ~0 static scale clips every activation to +/-127 and
    dequantizes to ~0 — silently-garbage logits (ADVICE r3). Call this on the
    host tree right after checkpoint restore on the eval/test/retrieval/serve
    paths. Returns the number of calibrated sites."""
    import numpy as np

    zeros, n_sites = [], 0

    def walk(tree, prefix=""):
        nonlocal n_sites
        for k, v in tree.items():
            path = f"{prefix}/{k}"
            if k == "act_scale":
                n_sites += 1
                if float(np.asarray(v)) <= 0.0:
                    zeros.append(path)
            elif isinstance(v, dict):
                walk(v, path)

    walk(batch_stats)
    if n_sites == 0:
        raise ValueError(
            f"--quant int8_static ({context}): no act_scale sites in "
            "batch_stats — this model family has no quantized conv sites; "
            "int8_static would be a silent float run. Use a supported "
            "backbone or drop --quant.")
    if zeros:
        raise ValueError(
            f"--quant int8_static ({context}): {len(zeros)}/{n_sites} conv "
            "sites have act_scale == 0 (uncalibrated — e.g. "
            f"{zeros[0]}). Run the calibration pass first:\n"
            "  python -m cstp_tpu.serve.quantize --test_md_path CKPT "
            "--out_path CKPT_int8 ...\nthen pass --test_md_path CKPT_int8.")
    return n_sites
