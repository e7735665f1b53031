"""Import DeepMind kinetics-i3d TF (Sonnet) checkpoints into the Flax I3D.

The reference ships a TF-session-based loader (``models/BE/i3d_byol.py:
428-586``) mapping Sonnet variable names to its torch modules. This is the
checkpoint-FILE equivalent: it reads a V1 name-based TF checkpoint with
``tf.train.load_checkpoint`` (no session/graph needed) and returns updated
Flax variables.

Name mapping (Sonnet -> cstp_tpu.models.i3d):

  RGB/inception_i3d/Conv3d_1a_7x7/conv_3d/w          -> conv3d_1a_7x7/conv/kernel
  .../Conv3d_1a_7x7/batch_norm/beta                  -> conv3d_1a_7x7/bn/bn/bias
  .../batch_norm/moving_mean|moving_variance         -> batch_stats .../bn/bn/mean|var
  Mixed_3b/Branch_0/Conv3d_0a_1x1/...                -> mixed_3b/branch_0/...
  Mixed_3b/Branch_1/Conv3d_0a_1x1 / 0b_3x3           -> branch_1_0 / branch_1_1
  Mixed_3b/Branch_2/Conv3d_0a_1x1 / 0b_3x3           -> branch_2_0 / branch_2_1
  Mixed_3b/Branch_3/Conv3d_0b_1x1                    -> branch_3_1

TF conv kernels are (D, H, W, I, O) — identical to the Flax NDHWC layout, so
weights copy without transposition (the torch reference had to permute).
Sonnet I3D BatchNorm has no scale (gamma); the Flax scale is set to 1. The
public checkpoint's ``Mixed_5b/Branch_2`` uses the well-known ``Conv3d_0a_3x3``
name typo (reference ``fix_typo=True``), handled automatically. The
classifier (``Logits/Conv3d_0c_1x1``) has no counterpart in the backbone and
is skipped.
"""

from __future__ import annotations

import copy
from typing import Any, Dict, Tuple

import numpy as np

_BRANCHES = {
    "branch_0": "Branch_0/Conv3d_0a_1x1",
    "branch_1_0": "Branch_1/Conv3d_0a_1x1",
    "branch_1_1": "Branch_1/Conv3d_0b_3x3",
    "branch_2_0": "Branch_2/Conv3d_0a_1x1",
    "branch_2_1": "Branch_2/Conv3d_0b_3x3",
    "branch_3_1": "Branch_3/Conv3d_0b_1x1",
}
_STEM = ("conv3d_1a_7x7", "conv3d_2b_1x1", "conv3d_2c_3x3")
_MIXED = ("mixed_3b", "mixed_3c", "mixed_4b", "mixed_4c", "mixed_4d",
          "mixed_4e", "mixed_4f", "mixed_5b", "mixed_5c")


def sonnet_name_map(modality: str = "rgb") -> Dict[str, Tuple[str, ...]]:
    """{tf_scope: (flax path to the Unit3D module)} for every conv+BN unit."""
    prefix = {"rgb": "RGB/inception_i3d", "flow": "Flow/inception_i3d"}[modality]
    out = {}
    for name in _STEM:
        sonnet = "Conv3d_" + name[len("conv3d_"):]
        out[f"{prefix}/{sonnet}"] = (name,)
    for m in _MIXED:
        sm = "Mixed_" + m[len("mixed_"):]
        for ours, theirs in _BRANCHES.items():
            t = theirs
            # public checkpoint typo: Mixed_5b/Branch_2/Conv3d_0a_3x3
            # (reference i3d_byol.py load_mixed(fix_typo=True))
            if m == "mixed_5b" and ours == "branch_2_1":
                t = "Branch_2/Conv3d_0a_3x3"
            out[f"{prefix}/{sm}/{t}"] = (m, ours)
    return out


def _get_in(tree, path):
    for k in path:
        tree = tree[k]
    return tree


def _set_in(tree, path, value):
    for k in path[:-1]:
        tree = tree[k]
    tree[path[-1]] = value


def load_tf_i3d(params: Dict[str, Any], batch_stats: Dict[str, Any],
                ckpt_path: str, backbone_path: Tuple[str, ...] = (),
                modality: str = "rgb", strict: bool = True):
    """Overlay a kinetics-i3d TF checkpoint onto Flax I3D variables.

    ``params`` / ``batch_stats`` are full trees; ``backbone_path`` addresses
    the I3D module inside them (e.g. ``("online_net",)``). Returns new
    (params, batch_stats). Requires tensorflow (present in this image) only
    at call time.
    """
    import tensorflow as tf

    reader = tf.train.load_checkpoint(ckpt_path)
    params = copy.deepcopy(params)
    batch_stats = copy.deepcopy(batch_stats)
    p_root = _get_in(params, backbone_path)
    s_root = _get_in(batch_stats, backbone_path)

    loaded = 0
    for tf_scope, flax_path in sonnet_name_map(modality).items():
        try:
            w = reader.get_tensor(f"{tf_scope}/conv_3d/w")
            beta = reader.get_tensor(f"{tf_scope}/batch_norm/beta")
            mean = reader.get_tensor(f"{tf_scope}/batch_norm/moving_mean")
            var = reader.get_tensor(f"{tf_scope}/batch_norm/moving_variance")
        except Exception:
            if strict:
                raise KeyError(f"missing {tf_scope} in {ckpt_path}")
            continue
        unit_p = _get_in(p_root, flax_path)
        unit_s = _get_in(s_root, flax_path)
        want = np.asarray(unit_p["conv"]["kernel"]).shape
        assert w.shape == want, (tf_scope, w.shape, want)
        unit_p["conv"]["kernel"] = np.asarray(w, np.float32)
        # Sonnet BN: beta only (scale=False); moving stats may be stored
        # broadcast-shaped (1,1,1,1,C)
        unit_p["bn"]["bn"]["bias"] = np.asarray(beta, np.float32).reshape(-1)
        unit_p["bn"]["bn"]["scale"] = np.ones_like(
            np.asarray(unit_p["bn"]["bn"]["scale"]))
        unit_s["bn"]["bn"]["mean"] = np.asarray(mean, np.float32).reshape(-1)
        unit_s["bn"]["bn"]["var"] = np.asarray(var, np.float32).reshape(-1)
        loaded += 1
    assert loaded, "no I3D units loaded"
    return params, batch_stats
