"""cstp_tpu — a TPU-native JAX/Flax/Pallas framework with the capabilities of
the CSTP reference (Contrastive Spatio-Temporal Pretext learning for
self-supervised video representation, AAAI 2022).

Layering (top = closest to the user):

  cli/       entry points: pretrain (main_byol), finetune (main_ft), test
  config     dataclass + argparse flag surface (parity with reference opts.py)
  train/     jitted train/eval steps, loops, meters, prefetch
  ssl/       BYOL engine: online/target towers, EMA, pretext heads, loss mix
  models/    Flax backbones: r21d (flagship), c3d, r3d, s3dg, i3d
  augment/   fused on-device augmentation (crop-overlap, jitter, blur, rot90)
  pretext/   pure-function CSTP pretext label/index samplers
  data/      host ingest: frame-dir / packed-shard readers, clip samplers
  parallel/  device mesh, shardings, multi-host init, collectives
  ops/       Pallas TPU kernels (fused augmentation; opt-in, see PERF.md)
  utils/     profiling: xprof traces, XLA cost analysis, chip rooflines
  ckpt/      checkpoint save/restore (Orbax), save_{E} naming parity

Unlike the reference (a flat research codebase glued by an argparse
namespace), every layer here is importable and unit-tested on a virtual
multi-device CPU mesh.
"""

__version__ = "0.1.0"
