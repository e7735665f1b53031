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
    return jax.lax.conv_general_dilated(
        x, w, stride, [(p, p) for p in padding],
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
    return _int8_conv_core(x, w, sa, tuple(stride), tuple(padding),
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
