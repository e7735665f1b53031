"""Profiling and roofline accounting (SURVEY §5: the reference has nothing
beyond wall-clock AverageMeters, ``main_byol.py:29-32``; the rebuild adds
real tracing + model-FLOP accounting).

Three tools:

* :func:`trace` — context manager around ``jax.profiler.trace`` so any loop
  or bench can capture a TensorBoard/xprof trace with one flag.
* :func:`compiled_cost` — XLA's own cost analysis (FLOPs + bytes accessed)
  for a jitted, lowered function. This is the ground truth for the roofline:
  it counts what the compiled HLO actually executes, not a hand model.
* :func:`chip_peak` — per-chip peak dense-matmul FLOP/s and HBM bandwidth by
  device kind, for MFU / bandwidth-utilization numbers.
"""

from __future__ import annotations

import contextlib
from typing import Any, Dict, NamedTuple, Optional

import jax


class ChipSpec(NamedTuple):
    name: str
    bf16_flops: float  # peak dense bf16 FLOP/s
    hbm_bw: float      # bytes/s
    hbm_bytes: float


# Public numbers (cloud.google.com/tpu/docs/system-architecture-tpu-vm).
_CHIP_SPECS = {
    "TPU v4": ChipSpec("v4", 275e12, 1.2e12, 32e9),
    "TPU v5 lite": ChipSpec("v5e", 197e12, 0.82e12, 16e9),
    "TPU v5e": ChipSpec("v5e", 197e12, 0.82e12, 16e9),
    "TPU v5p": ChipSpec("v5p", 459e12, 2.77e12, 95e9),
    "TPU v5": ChipSpec("v5e", 197e12, 0.82e12, 16e9),
    "TPU v6 lite": ChipSpec("v6e", 918e12, 1.64e12, 32e9),
}


def chip_peak(device: Optional[jax.Device] = None) -> Optional[ChipSpec]:
    """Peak spec for ``device`` (default: first addressable), None if unknown
    (e.g. the CPU test mesh)."""
    device = device or jax.devices()[0]
    kind = getattr(device, "device_kind", "")
    for prefix, spec in sorted(_CHIP_SPECS.items(), key=lambda kv: -len(kv[0])):
        if kind.startswith(prefix):
            return spec
    return None


def apply_tpu_tuning(vmem_limit_kib: Optional[int] = None) -> None:
    """Apply measured-default TPU compiler tuning via ``LIBTPU_INIT_ARGS``.

    Must run BEFORE the TPU backend initializes (libtpu reads the env var at
    load). A raised scoped-vmem budget lets the compiler double-buffer the
    big conv fusions' operands: measured +5% end-to-end on the v5e pretrain
    step (PERF.md round-3 sweep: 235.4 -> 247.2 clips/s/chip at 64 MiB).
    Explicit user-set ``LIBTPU_INIT_ARGS`` values win — we only append when
    the flag is absent. ``vmem_limit_kib=0`` disables the override.
    """
    import os

    kib = 65536 if vmem_limit_kib is None else int(vmem_limit_kib)
    if not kib:
        return
    cur = os.environ.get("LIBTPU_INIT_ARGS", "")
    if "xla_tpu_scoped_vmem_limit_kib" not in cur:
        os.environ["LIBTPU_INIT_ARGS"] = (
            cur + f" --xla_tpu_scoped_vmem_limit_kib={kib}"
        ).strip()


@contextlib.contextmanager
def trace(log_dir: Optional[str]):
    """``with trace('/tmp/trace'):`` captures an xprof trace; no-op if
    ``log_dir`` is falsy so call sites can pass the flag straight through."""
    if not log_dir:
        yield
        return
    with jax.profiler.trace(log_dir):
        yield


def compiled_cost(fn, *args, **kwargs) -> Dict[str, float]:
    """Lower+compile ``fn`` on abstract avals of ``args`` and return XLA's
    cost analysis: at least ``flops`` and ``bytes accessed`` (keys as XLA
    names them; missing entries default to 0.0)."""
    compiled = jax.jit(fn).lower(*args, **kwargs).compile()
    costs = compiled.cost_analysis()
    if isinstance(costs, (list, tuple)):  # older jax returns [dict]
        costs = costs[0] if costs else {}
    return dict(costs or {})


def summarize(cost: Dict[str, float], seconds_per_call: float,
              device: Optional[jax.Device] = None) -> Dict[str, Any]:
    """Roofline summary for one compiled program: achieved FLOP/s + MFU,
    achieved bytes/s + HBM utilization, arithmetic intensity."""
    flops = float(cost.get("flops", 0.0))
    bytes_acc = float(cost.get("bytes accessed", 0.0))
    out: Dict[str, Any] = {
        "flops_per_call": flops,
        "bytes_per_call": bytes_acc,
        "seconds_per_call": seconds_per_call,
        "achieved_tflops": flops / seconds_per_call / 1e12,
        "achieved_gbps": bytes_acc / seconds_per_call / 1e9,
        "arithmetic_intensity": flops / bytes_acc if bytes_acc else float("inf"),
    }
    spec = chip_peak(device)
    if spec is not None:
        out["chip"] = spec.name
        out["mfu"] = flops / seconds_per_call / spec.bf16_flops
        out["hbm_util"] = bytes_acc / seconds_per_call / spec.hbm_bw
        # time lower bounds (speed of light)
        out["sol_compute_s"] = flops / spec.bf16_flops
        out["sol_memory_s"] = bytes_acc / spec.hbm_bw
    return out
