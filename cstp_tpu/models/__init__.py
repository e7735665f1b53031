"""Backbone registry — the TPU-era ``generate_model`` string dispatch
(reference ``models/model.py:39-79``).

Each backbone registers a constructor and a :class:`BackboneSpec` describing
its BYOL wiring, which differs per family in the reference:

| backbone | feat | projector          | predictor      | pretext heads        |
|----------|------|--------------------|----------------|----------------------|
| r21d     | 512  | 512 (h4096)        | 512 (h4096)    | MLP, 5/5/5/5         |
| s3d      | 1024 | 1024 (h1024)       | 1024 (h4096)   | MLP, 5/5/5/5         |
| c3d      | 512  | —                  | 512 (h4096)    | Linear, 5/5/4/4      |
| r3d      | 512  | —                  | 512 (h4096)    | Linear, 5/5/4/4      |
| i3d      | 1024 | — (L2-normed feat) | 1024 (h4096)   | Linear, 5/5/4/4      |

(citations: r21d_byol.py:268-291, s3dg.py:336-360, c3d_byol.py:144-153,
r3d_byol.py:243-253, i3d_byol.py:616-629)
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Dict, Optional, Tuple

import jax.numpy as jnp


@dataclass(frozen=True)
class BackboneSpec:
    feat_dim: int
    proj_dim: Optional[int]   # None = no projector (BYOL on raw features)
    proj_hidden: int
    pred_dim: int
    pred_hidden: int
    head_style: str           # 'mlp' (Linear-BN-ReLU-Linear) | 'linear'
    n_spa: int = 5
    n_tem: int = 5
    n_pb: int = 5
    n_rot: int = 5
    l2_feat: bool = False     # i3d id_head L2-normalizes the pooled feature


_REGISTRY: Dict[str, Tuple[Callable, Callable]] = {}


def register_backbone(name: str, ctor: Callable,
                      spec_fn: Callable[[int], BackboneSpec]) -> None:
    _REGISTRY[name] = (ctor, spec_fn)


def backbone_names():
    return sorted(_REGISTRY)


def _base(arch: str) -> str:
    for suffix in ("_byol", "_classify"):
        if arch.endswith(suffix):
            return arch[: -len(suffix)]
    return arch


def make_backbone(arch: str, depth: int = 1, *, dtype=jnp.bfloat16,
                  proj_flag: bool = False, **kwargs):
    """Instantiate a backbone Flax module.

    ``arch`` accepts both bare encoder names ('r21d') and the reference's
    model_name strings ('r21d_byol', 's3d_classify' — models/model.py:41-77).
    Extra kwargs (e.g. flax ``name=``, s3d ``gating``/``slow``) pass through.
    """
    base = _base(arch)
    if base not in _REGISTRY:
        raise ValueError(f"unknown backbone {arch!r}; have {backbone_names()}")
    ctor, _ = _REGISTRY[base]
    return ctor(depth=depth, dtype=dtype, proj_flag=proj_flag, **kwargs)


def backbone_spec(arch: str, depth: int = 1) -> BackboneSpec:
    base = _base(arch)
    if base not in _REGISTRY:
        raise ValueError(f"unknown backbone {arch!r}; have {backbone_names()}")
    return _REGISTRY[base][1](depth)


def backbone_feat_dim(arch: str, depth: int = 1) -> int:
    return backbone_spec(arch, depth).feat_dim


# ---- registrations -------------------------------------------------------

def _r21d_ctor(depth: int, dtype, proj_flag: bool, **kw):
    from cstp_tpu.models.r21d import LAYER_SIZES, R2Plus1DNet

    kw.pop("shortcut", None)  # ResNet3D-only knob
    # r21d accepts remat and s2d_stem; they pass through in kw
    sizes = LAYER_SIZES.get(depth, (1, 1, 1, 1))
    return R2Plus1DNet(layer_sizes=sizes, proj_flag=proj_flag, dtype=dtype, **kw)


register_backbone(
    "r21d", _r21d_ctor,
    lambda depth: BackboneSpec(512, 512, 4096, 512, 4096, "mlp"),
)


def _c3d_ctor(depth: int, dtype, proj_flag: bool, **kw):
    from cstp_tpu.models.c3d import C3D

    kw.pop("shortcut", None)
    kw.pop("s2d_stem", None)
    kw.pop("remat", None)
    return C3D(dtype=dtype, **kw)  # reference C3D has no projector


register_backbone(
    "c3d", _c3d_ctor,
    lambda depth: BackboneSpec(512, None, 0, 512, 4096, "linear",
                               n_pb=4, n_rot=4),
)


def _r3d_ctor(depth: int, dtype, proj_flag: bool, **kw):
    from cstp_tpu.models.r3d import R3D_LAYERS, ResNet3D

    kw.pop("s2d_stem", None)
    kw.pop("remat", None)
    block, layers, expansion = R3D_LAYERS.get(depth, R3D_LAYERS[18])
    return ResNet3D(block=block, layers=layers, dtype=dtype, **kw)


def _r3d_spec(depth: int) -> BackboneSpec:
    # reference pools to 512 regardless (r3d_byol.py:205 view(-1, 512));
    # Bottleneck depths would produce 2048 and crash the reference — we
    # expose the true dim instead.
    _, _, expansion = R3D_LAYERS_SPEC.get(depth, (None, None, 1))
    return BackboneSpec(512 * expansion, None, 0, 512 * expansion, 4096,
                        "linear", n_pb=4, n_rot=4)


R3D_LAYERS_SPEC = {
    10: (None, None, 1), 18: (None, None, 1), 34: (None, None, 1),
    50: (None, None, 4), 101: (None, None, 4), 152: (None, None, 4),
    200: (None, None, 4),
}

register_backbone("r3d", _r3d_ctor, _r3d_spec)


def _s3d_ctor(depth: int, dtype, proj_flag: bool, **kw):
    from cstp_tpu.models.s3dg import S3D

    kw.pop("shortcut", None)
    kw.pop("remat", None)
    kw.setdefault("gating", True)   # model.py:57 s3d_byol uses gating=True
    kw.setdefault("slow", False)
    return S3D(proj_flag=proj_flag, dtype=dtype, **kw)


register_backbone(
    "s3d", _s3d_ctor,
    lambda depth: BackboneSpec(1024, 1024, 1024, 1024, 4096, "mlp"),
)


def _i3d_ctor(depth: int, dtype, proj_flag: bool, **kw):
    from cstp_tpu.models.i3d import I3D

    kw.pop("shortcut", None)
    kw.pop("s2d_stem", None)
    kw.pop("remat", None)
    return I3D(dtype=dtype, **kw)


register_backbone(
    "i3d", _i3d_ctor,
    lambda depth: BackboneSpec(1024, None, 0, 1024, 4096, "linear",
                               n_pb=4, n_rot=4, l2_feat=True),
)


def _slowfast_ctor(depth: int, dtype, proj_flag: bool, **kw):
    from cstp_tpu.models.slowfast import SLOWFAST_LAYERS, SlowFastNet

    kw.pop("s2d_stem", None)
    kw.pop("remat", None)
    if depth not in SLOWFAST_LAYERS:
        depth = 18
    return SlowFastNet(depth=depth, dtype=dtype, **kw)


def _slowfast_spec(depth: int) -> BackboneSpec:
    from cstp_tpu.models.slowfast import slowfast_feat_dim

    f = slowfast_feat_dim(depth)
    return BackboneSpec(f, None, 0, f, 4096, "linear", n_pb=4, n_rot=4)


# 'slowfast_fb' is the reference's model_name string (train_slowfast.pyc,
# docs/SLOWFAST.md); 'slowfast' is the friendly alias.
register_backbone("slowfast", _slowfast_ctor, _slowfast_spec)
register_backbone("slowfast_fb", _slowfast_ctor, _slowfast_spec)


def __getattr__(name):
    # Lazy re-export: the legacy pace-era zoo (models/legacy.py) is not part
    # of the live BYOL registry (nothing in the reference's factory
    # dispatches it) but IS part of the public API for component parity.
    if name == "make_legacy_model":
        from cstp_tpu.models.legacy import make_legacy_model

        return make_legacy_model
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
