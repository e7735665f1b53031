"""Pallas-fused factorized (2+1)D convolution block.

Fuses the chain  spatial (1,k,k) conv -> BatchNorm -> ReLU -> temporal
(3,1,1) conv  (reference ``models/pace/r21d_byol.py:94-97``; our
``models/layers.py SpatioTemporalConv``) so the WIDE mid tensor (144/230/288
channels — the (2+1)D paper's parameter-matching formula) never touches HBM
in the forward pass. On the XLA path that tensor is written by the
spatial-conv fusion and re-read by the temporal conv: ~2x|mid| of HBM
traffic per block on a step that is bandwidth-bound at 59% HBM utilization
(PERF.md round 3 — the single structural lever VERDICT r1 #1 calls for).

Design (TPU v5e, single tensorcore, sequential grid):

* **Two passes, exact BN semantics.** Batch statistics need the whole mid
  tensor before any element can be normalized, so a fused one-pass kernel
  is impossible without changing semantics. Pass A (stats) computes the
  spatial conv per frame and accumulates per-group sum/sum-of-squares,
  discarding activations. Pass B (fwd) recomputes the spatial conv,
  normalizes with the now-known statistics, applies scale/bias + ReLU, and
  feeds a temporal conv via a 3-slot VMEM ring buffer that persists across
  grid steps — one frame of mid is alive at a time, none of it in HBM.
  Cost: the spatial conv is computed twice. The step runs at 41% MFU on a
  memory-bound roofline, so the extra FLOPs ride in bandwidth headroom.
* **Grid = (B, T(+1))**, one frame per step; Pallas double-buffers the
  frame DMA against compute. The ring emits output frame ``t-1`` at step
  ``t`` (temporal pad 1), with a flush step for the last frame.
* **Spatial conv as k*k shifted matmuls** on the padded frame:
  (H*W, Cin) x (Cin, M) per tap — MXU-shaped, no gathers, no strided loads
  (phase 1 supports spatial stride 1: the layer1 blocks that dominate the
  trace; stride-2 blocks keep the XLA path, or can be rewritten to stride 1
  via the exact space-to-depth transform in models/layers.py).
* **Backward = recompute in XLA** via ``jax.custom_vjp``: residuals are
  (x, weights, affine); the backward pass calls ``jax.vjp`` on the
  reference XLA chain. Backward traffic is unchanged from the unfused path
  (plus one recomputed spatial conv); forward saves 2x|mid|.

Equivalence-tested against the XLA chain in interpret mode
(tests/test_conv21d.py); benchmarked standalone and end-to-end via
``perf/bench_conv21d.py``. Wired behind ``--fused_conv`` (r21d family).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


# --------------------------------------------------------------------------
# reference XLA chain (used by the custom-vjp backward and by tests)
# --------------------------------------------------------------------------

def reference_chain(x, ws, wt, scale, bias, gmean, gvar,
                    *, bn_groups: int, eps: float = 1e-5,
                    dtype=jnp.bfloat16):
    """The unfused spatial->BN(affine,given stats)->ReLU->temporal chain.
    ``x`` is the UNPADDED input (B, T, H, W, Cin); ``gmean``/``gvar`` are
    per-group (G, M) statistics (treated as given — see ``fused_chain`` for
    how gradients through the statistics are recovered)."""
    b = x.shape[0]
    g = bn_groups
    mid = jax.lax.conv_general_dilated(
        x.astype(dtype), ws.astype(dtype)[None], (1, 1, 1),
        [(0, 0), (1, 1), (1, 1)],
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        preferred_element_type=dtype,
    )
    mean_b = jnp.repeat(gmean, b // g, axis=0)[:, None, None, None, :]
    rstd_b = jax.lax.rsqrt(jnp.repeat(gvar, b // g, axis=0)
                           + eps)[:, None, None, None, :]
    y = (mid.astype(jnp.float32) - mean_b) * rstd_b * scale + bias
    y = jnp.maximum(y, 0.0).astype(dtype)
    out = jax.lax.conv_general_dilated(
        y, wt.astype(dtype)[:, None, None], (1, 1, 1),
        [(1, 1), (0, 0), (0, 0)],
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        preferred_element_type=dtype,
    )
    return out


def reference_stats(x, ws, *, bn_groups: int, dtype=jnp.bfloat16):
    """Per-group (G, M) mean / biased variance of the spatial-conv output —
    the same partial-moments law as models/layers._GroupedBN."""
    b = x.shape[0]
    g = bn_groups
    mid = jax.lax.conv_general_dilated(
        x.astype(dtype), ws.astype(dtype)[None], (1, 1, 1),
        [(0, 0), (1, 1), (1, 1)],
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        preferred_element_type=dtype,
    ).astype(jnp.float32)
    pmean = jnp.mean(mid, axis=(1, 2, 3))              # (B, M)
    psq = jnp.mean(jnp.square(mid), axis=(1, 2, 3))    # (B, M)
    m = pmean.reshape(g, b // g, -1).mean(axis=1)
    v = psq.reshape(g, b // g, -1).mean(axis=1) - jnp.square(m)
    return m, v


# --------------------------------------------------------------------------
# pass A: statistics kernel
# --------------------------------------------------------------------------

def _stats_kernel(x_ref, ws_ref, sum_ref, sq_ref, acc_ref, *,
                  kh: int, kw: int, h: int, w: int, n_frames: int,
                  groups: int, batch: int):
    b = pl.program_id(0)
    t = pl.program_id(1)

    @pl.when(jnp.logical_and(b == 0, t == 0))
    def _():
        sum_ref[:] = jnp.zeros_like(sum_ref)
        sq_ref[:] = jnp.zeros_like(sq_ref)

    # frame spatial conv: kh*kw shifted matmuls, f32 accumulation
    cin = x_ref.shape[-1]
    m = sum_ref.shape[-1]
    acc_ref[:] = jnp.zeros_like(acc_ref)
    for dy in range(kh):
        for dx in range(kw):
            patch = x_ref[0, 0, dy : dy + h, dx : dx + w, :].reshape(
                h * w, cin)
            acc_ref[:] += jnp.dot(patch, ws_ref[dy, dx],
                                  preferred_element_type=jnp.float32)
    mid = acc_ref[:].astype(jnp.bfloat16).astype(jnp.float32)
    g = b // (batch // groups)
    denom = jnp.float32(1.0 / (h * w))
    sum_ref[pl.ds(g, 1), :] += (jnp.sum(mid, axis=0) * denom)[None, :]
    sq_ref[pl.ds(g, 1), :] += (jnp.sum(mid * mid, axis=0) * denom)[None, :]


def _run_stats(x_pad, ws, *, bn_groups: int, interpret: bool = False):
    b, t, hp, wp, cin = x_pad.shape
    kh, kw, _, m = ws.shape
    h, w = hp - (kh - 1), wp - (kw - 1)
    ws2 = ws.reshape(kh, kw, cin, m)
    kernel = functools.partial(
        _stats_kernel, kh=kh, kw=kw, h=h, w=w, n_frames=t,
        groups=bn_groups, batch=b,
    )
    sums, sqs = pl.pallas_call(
        kernel,
        grid=(b, t),
        in_specs=[
            pl.BlockSpec((1, 1, hp, wp, cin), lambda i, j: (i, j, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((kh, kw, cin, m), lambda i, j: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((bn_groups, m), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bn_groups, m), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bn_groups, m), jnp.float32),
            jax.ShapeDtypeStruct((bn_groups, m), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((h * w, m), jnp.float32)],
        interpret=interpret,
    )(x_pad, ws2)
    count = (b // bn_groups) * t
    gmean = sums / count
    gvar = sqs / count - jnp.square(gmean)
    return gmean, gvar


# --------------------------------------------------------------------------
# pass B: fused forward kernel (ring-buffered temporal conv)
# --------------------------------------------------------------------------

def _fwd_kernel(x_ref, ws_ref, wt_ref, mean_ref, rstd_ref, scale_ref,
                bias_ref, out_ref, acc_ref, ring_ref, oacc_ref, *,
                kh: int, kw: int, h: int, w: int, n_frames: int,
                groups: int, batch: int, out_dtype):
    b = pl.program_id(0)
    t = pl.program_id(1)
    cin = x_ref.shape[-1]
    m = ring_ref.shape[-1]
    g = b // (batch // groups)

    # ---- compute mid frame t (skip on the flush step) ----
    @pl.when(t < n_frames)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        for dy in range(kh):
            for dx in range(kw):
                patch = x_ref[0, 0, dy : dy + h, dx : dx + w, :].reshape(
                    h * w, cin)
                acc_ref[:] += jnp.dot(patch, ws_ref[dy, dx],
                                      preferred_element_type=jnp.float32)
        mid = acc_ref[:].astype(jnp.bfloat16).astype(jnp.float32)
        y = (mid - mean_ref[pl.ds(g, 1), :]) * rstd_ref[pl.ds(g, 1), :]
        y = y * scale_ref[pl.ds(0, 1), :] + bias_ref[pl.ds(0, 1), :]
        y = jnp.maximum(y, 0.0).astype(jnp.bfloat16)
        ring_ref[pl.ds(jnp.remainder(t, 3), 1)] = y[None]

    # ---- emit out frame t-1 from ring frames t-2, t-1, t ----
    @pl.when(t >= 1)
    def _():
        to = t - 1
        oacc_ref[:] = jnp.zeros_like(oacc_ref)

        def tap(k):
            # mid frame index for this tap; valid iff 0 <= to-1+k < T
            mi = to - 1 + k

            @pl.when(jnp.logical_and(mi >= 0, mi < n_frames))
            def _():
                y = ring_ref[jnp.remainder(mi, 3)]
                oacc_ref[:] += jnp.dot(y, wt_ref[k],
                                       preferred_element_type=jnp.float32)

        tap(0)
        tap(1)
        tap(2)
        out_ref[0, 0] = oacc_ref[:].reshape(h, w, -1).astype(out_dtype)


def _run_fwd(x_pad, ws, wt, gmean, gvar, scale, bias, *,
             bn_groups: int, eps: float = 1e-5, out_dtype=jnp.bfloat16,
             interpret: bool = False):
    b, t, hp, wp, cin = x_pad.shape
    kh, kw, _, m = ws.shape
    kt, _, cout = wt.shape
    assert kt == 3, "temporal kernel fixed at 3 (all reference blocks)"
    h, w = hp - (kh - 1), wp - (kw - 1)
    rstd = jax.lax.rsqrt(gvar + eps)
    kernel = functools.partial(
        _fwd_kernel, kh=kh, kw=kw, h=h, w=w, n_frames=t,
        groups=bn_groups, batch=b, out_dtype=out_dtype,
    )
    out = pl.pallas_call(
        kernel,
        grid=(b, t + 1),
        in_specs=[
            pl.BlockSpec((1, 1, hp, wp, cin),
                         lambda i, j: (i, jnp.minimum(j, t - 1), 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((kh, kw, cin, m), lambda i, j: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((kt, m, cout), lambda i, j: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bn_groups, m), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bn_groups, m), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, m), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, m), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, h, w, cout),
            lambda i, j: (i, jnp.maximum(j - 1, 0), 0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((b, t, h, w, cout), out_dtype),
        scratch_shapes=[
            pltpu.VMEM((h * w, m), jnp.float32),     # spatial-conv acc
            pltpu.VMEM((3, h * w, m), jnp.bfloat16),  # mid ring buffer
            pltpu.VMEM((h * w, cout), jnp.float32),   # temporal acc
        ],
        interpret=interpret,
    )(x_pad, ws.reshape(kh, kw, cin, m), wt, gmean, rstd,
      scale.reshape(1, m), bias.reshape(1, m))
    return out


# --------------------------------------------------------------------------
# re-tiled "clip" variant (VERDICT r2 #2): tap-stacked im2col contraction +
# whole-clip macro-tiles
# --------------------------------------------------------------------------
#
# The original kernels above contract (H*W, Cin) x (Cin, M) per tap —
# K = Cin = 64 is HALF an MXU tile, and each frame issues 9 such matmuls.
# The re-tile fixes both axes of the diagnosis:
#   * tap-stacked im2col: the 9 shifted taps are written into one
#     (H*W, 9*Cin) VMEM scratch (static 64-aligned lane offsets), and the
#     spatial conv becomes ONE (H*W, 576) x (576, M) contraction — K 64->576,
#     4.5 full K-tiles instead of 9 half-filled passes.
#   * whole-clip macro-tiles: grid = (B,), one CLIP per step (all T frames
#     in VMEM). No ring buffer, no flush step, no per-frame grid overhead;
#     the temporal conv reads shifted rows of the resident (T*H*W, M) mid
#     scratch directly. VMEM at layer1 shapes (T=16, 56^2, 64->144->64,
#     bf16): in 6.9 MB + mid 14.5 MB + patch 3.6 MB + out 6.4 MB + f32
#     accs ~2.6 MB ~= 34 MB — inside the 64 MiB scoped-vmem default this
#     repo ships (utils/profiling.apply_tpu_tuning).


def _im2col(patch_ref, fr, *, kh, kw, h, w, cin):
    """Write the kh*kw shifted taps of one padded frame into the
    (h*w, kh*kw*cin) scratch at static lane offsets (tap-major, cin-minor —
    matching ws.reshape(kh*kw*cin, m))."""
    for dy in range(kh):
        for dx in range(kw):
            off = (dy * kw + dx) * cin
            patch_ref[:, off:off + cin] = fr[dy:dy + h, dx:dx + w, :].reshape(
                h * w, cin)


def _stats_kernel_clip(x_ref, ws_ref, sum_ref, sq_ref, patch_ref, *,
                       kh: int, kw: int, h: int, w: int, n_frames: int,
                       groups: int, batch: int):
    b = pl.program_id(0)

    @pl.when(b == 0)
    def _():
        sum_ref[:] = jnp.zeros_like(sum_ref)
        sq_ref[:] = jnp.zeros_like(sq_ref)

    cin = x_ref.shape[-1]
    g = b // (batch // groups)
    denom = jnp.float32(1.0 / (h * w))

    def body(t, carry):
        s, q = carry
        fr = x_ref[0, t]
        _im2col(patch_ref, fr, kh=kh, kw=kw, h=h, w=w, cin=cin)
        mid = jnp.dot(patch_ref[:], ws_ref[:],
                      preferred_element_type=jnp.float32)
        mid = mid.astype(jnp.bfloat16).astype(jnp.float32)
        return (s + jnp.sum(mid, axis=0) * denom,
                q + jnp.sum(mid * mid, axis=0) * denom)

    m = sum_ref.shape[-1]
    s, q = jax.lax.fori_loop(
        0, n_frames, body,
        (jnp.zeros((m,), jnp.float32), jnp.zeros((m,), jnp.float32)))
    sum_ref[pl.ds(g, 1), :] += s[None, :]
    sq_ref[pl.ds(g, 1), :] += q[None, :]


def _run_stats_clip(x_pad, ws, *, bn_groups: int, interpret: bool = False):
    b, t, hp, wp, cin = x_pad.shape
    kh, kw, _, m = ws.shape
    h, w = hp - (kh - 1), wp - (kw - 1)
    kernel = functools.partial(
        _stats_kernel_clip, kh=kh, kw=kw, h=h, w=w, n_frames=t,
        groups=bn_groups, batch=b,
    )
    sums, sqs = pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, t, hp, wp, cin), lambda i: (i, 0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((kh * kw * cin, m), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((bn_groups, m), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bn_groups, m), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bn_groups, m), jnp.float32),
            jax.ShapeDtypeStruct((bn_groups, m), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((h * w, kh * kw * cin), jnp.bfloat16)],
        interpret=interpret,
    )(x_pad, ws.reshape(kh * kw * cin, m))
    count = (b // bn_groups) * t
    gmean = sums / count
    gvar = sqs / count - jnp.square(gmean)
    return gmean, gvar


def _fwd_kernel_clip(x_ref, ws_ref, wt_ref, mean_ref, rstd_ref, scale_ref,
                     bias_ref, out_ref, patch_ref, mid_ref, *,
                     kh: int, kw: int, h: int, w: int, n_frames: int,
                     groups: int, batch: int, out_dtype):
    b = pl.program_id(0)
    cin = x_ref.shape[-1]
    hw = h * w
    g = b // (batch // groups)
    mean = mean_ref[pl.ds(g, 1), :]
    rstd = rstd_ref[pl.ds(g, 1), :]
    scale = scale_ref[pl.ds(0, 1), :]
    bias = bias_ref[pl.ds(0, 1), :]

    def mids(t, _):
        fr = x_ref[0, t]
        _im2col(patch_ref, fr, kh=kh, kw=kw, h=h, w=w, cin=cin)
        mid = jnp.dot(patch_ref[:], ws_ref[:],
                      preferred_element_type=jnp.float32)
        mid = mid.astype(jnp.bfloat16).astype(jnp.float32)
        y = (mid - mean) * rstd * scale + bias
        y = jnp.maximum(y, 0.0).astype(jnp.bfloat16)
        # leading (untiled) dim indexing — no row-offset alignment proofs
        mid_ref[t] = y
        return 0

    jax.lax.fori_loop(0, n_frames, mids, 0)

    cout = out_ref.shape[-1]

    def emit(t, _):
        acc = jnp.zeros((hw, cout), jnp.float32)
        for k in range(3):
            mi = t - 1 + k
            valid = jnp.logical_and(mi >= 0, mi < n_frames)
            mic = jnp.clip(mi, 0, n_frames - 1)
            contrib = jnp.dot(mid_ref[mic], wt_ref[k],
                              preferred_element_type=jnp.float32)
            acc = acc + jnp.where(valid, contrib, 0.0)
        out_ref[0, t] = acc.reshape(h, w, cout).astype(out_dtype)
        return 0

    jax.lax.fori_loop(0, n_frames, emit, 0)


def _run_fwd_clip(x_pad, ws, wt, gmean, gvar, scale, bias, *,
                  bn_groups: int, eps: float = 1e-5, out_dtype=jnp.bfloat16,
                  interpret: bool = False):
    b, t, hp, wp, cin = x_pad.shape
    kh, kw, _, m = ws.shape
    kt, _, cout = wt.shape
    assert kt == 3, "temporal kernel fixed at 3 (all reference blocks)"
    h, w = hp - (kh - 1), wp - (kw - 1)
    rstd = jax.lax.rsqrt(gvar + eps)
    kernel = functools.partial(
        _fwd_kernel_clip, kh=kh, kw=kw, h=h, w=w, n_frames=t,
        groups=bn_groups, batch=b, out_dtype=out_dtype,
    )
    out = pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, t, hp, wp, cin), lambda i: (i, 0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((kh * kw * cin, m), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((kt, m, cout), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bn_groups, m), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bn_groups, m), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, m), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, m), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, t, h, w, cout), lambda i: (i, 0, 0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((b, t, h, w, cout), out_dtype),
        scratch_shapes=[
            pltpu.VMEM((h * w, kh * kw * cin), jnp.bfloat16),  # im2col
            pltpu.VMEM((t, h * w, m), jnp.bfloat16),           # resident mid
        ],
        interpret=interpret,
    )(x_pad, ws.reshape(kh * kw * cin, m), wt, gmean, rstd,
      scale.reshape(1, m), bias.reshape(1, m))
    return out


# --------------------------------------------------------------------------
# public op with custom VJP
# --------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8))
def fused_st_conv(x, ws, wt, scale, bias, bn_groups: int = 1,
                  eps: float = 1e-5, interpret: bool = False,
                  tiling: str = "clip"):
    """Fused spatial(1,k,k,s=1)->BN(train stats)->ReLU->temporal(3,1,1,s=1)
    block. ``x``: (B, T, H, W, Cin) unpadded; ``ws``: (kh, kw, Cin, M) f32;
    ``wt``: (3, M, Cout) f32; ``scale``/``bias``: (M,) f32.

    ``tiling``: 'taps9' = the round-2 kernels (one frame per grid step,
    9 K=Cin matmuls per frame, VMEM ring for the temporal conv);
    'clip' = the re-tiled kernels (one clip per grid step, tap-stacked
    K=9*Cin im2col contraction, resident mid scratch).

    Returns ``(out, gmean, gvar)`` — the group statistics feed the module's
    running-stat update exactly like models/layers._GroupedBN.
    """
    out, gmean, gvar = _fused_fwd_impl(x, ws, wt, scale, bias, bn_groups,
                                       eps, interpret, tiling)
    return out, gmean, gvar


def _pad_hw(x, kh, kw):
    ph, pw = (kh - 1) // 2, (kw - 1) // 2
    return jnp.pad(x, ((0, 0), (0, 0), (ph, ph), (pw, pw), (0, 0)))


def _fused_fwd_impl(x, ws, wt, scale, bias, bn_groups, eps, interpret,
                    tiling="clip"):
    kh, kw = ws.shape[0], ws.shape[1]
    xb = x.astype(jnp.bfloat16)
    x_pad = _pad_hw(xb, kh, kw)
    wsb = ws.astype(jnp.bfloat16)
    run_stats = _run_stats_clip if tiling == "clip" else _run_stats
    run_fwd = _run_fwd_clip if tiling == "clip" else _run_fwd
    gmean, gvar = run_stats(x_pad, wsb, bn_groups=bn_groups,
                            interpret=interpret)
    out = run_fwd(x_pad, wsb, wt.astype(jnp.bfloat16), gmean, gvar,
                  scale.astype(jnp.float32), bias.astype(jnp.float32),
                  bn_groups=bn_groups, eps=eps, interpret=interpret)
    return out, gmean, gvar


def _fused_fwd_rule(x, ws, wt, scale, bias, bn_groups, eps, interpret,
                    tiling):
    out, gmean, gvar = _fused_fwd_impl(x, ws, wt, scale, bias, bn_groups,
                                       eps, interpret, tiling)
    return (out, gmean, gvar), (x, ws, wt, scale, bias)


def _fused_bwd_rule(bn_groups, eps, interpret, tiling, res, cts):
    """Backward by XLA recompute: jax.vjp over the reference chain WITH the
    statistics recomputed inside (so gradients flow through mean/var exactly
    like a plain BatchNorm). Cotangents on the stats outputs are dropped —
    they only feed the (undifferentiated) running-stat update."""
    x, ws, wt, scale, bias = res
    d_out, _d_gmean, _d_gvar = cts

    def chain(x_, ws_, wt_, scale_, bias_):
        gm, gv = reference_stats(x_, ws_, bn_groups=bn_groups)
        return reference_chain(x_, ws_, wt_, scale_, bias_, gm, gv,
                               bn_groups=bn_groups, eps=eps)

    _, vjp = jax.vjp(chain, x, ws, wt, scale, bias)
    return vjp(d_out)


fused_st_conv.defvjp(_fused_fwd_rule, _fused_bwd_rule)
