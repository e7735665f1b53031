"""Import reference PyTorch checkpoints (``save_{E}.pth``) into Flax trees.

The reference saves ``{'epoch', 'arch', 'state_dict', 'optimizer'}`` with
DDP ``module.``-prefixed torch parameter names (``main_byol.py:134-140``).
This module translates those names to our Flax parameter/batch-stat paths so
a user can finetune from a reference-pretrained checkpoint directly:

    python -m cstp_tpu.cli.main_ft --pretrained_path save_300.pth ...

Name translation is purely mechanical (module-name maps per backbone
family); tensors are re-laid out torch->flax (conv OIDHW -> DHWIO, linear
(out,in) -> (in,out)). The weight-transplant tests
(tests/test_torch_parity.py) prove translated checkpoints reproduce the
reference's outputs exactly.
"""

from __future__ import annotations

import re
from typing import Any, Dict, List, Tuple

import numpy as np

# Sequential(Linear, BN1d, ReLU, Linear) index -> our MLPHead child
_MLP_IDX = {"0": "fc1", "1": "bn", "3": "fc2"}


def _r21d_path(parts: List[str]) -> List[str]:
    """reference r21d_byol.R2Plus1DNet names -> cstp_tpu.models.r21d."""
    out = []
    i = 0
    while i < len(parts):
        p = parts[i]
        if p == "blocks":  # conv{N}.blocks.K -> block{K+2}
            out.append(f"block{int(parts[i + 1]) + 2}")
            i += 2
            continue
        if p == "project":  # Projector.net.{0,1,3} -> MLPHead children
            out.append("project")
            assert parts[i + 1] == "net"
            out.append(_MLP_IDX[parts[i + 2]])
            i += 3
            continue
        out.append(p)
        i += 1
    return out


def _c3d_path(parts: List[str]) -> List[str]:
    """c3d_byol.C3D: convXy + bnXy -> convXy/{conv,bn}."""
    p = parts[0]
    if p.startswith("bn"):
        return ["conv" + p[2:], "bn"] + parts[1:]
    if p.startswith("conv"):
        return [p, "conv"] + parts[1:]
    return list(parts)


def _r3d_path(parts: List[str]) -> List[str]:
    """BE/r3d_byol.ResNet: layer{i}.{j} -> layer{i}_block{j+1};
    downsample.{0,1} -> downsample_{conv,bn}."""
    out = []
    i = 0
    while i < len(parts):
        p = parts[i]
        m = re.fullmatch(r"layer(\d)", p)
        if m and i + 1 < len(parts) and parts[i + 1].isdigit():
            out.append(f"layer{m.group(1)}_block{int(parts[i + 1]) + 1}")
            i += 2
            continue
        if p == "downsample":
            out.append("downsample_conv" if parts[i + 1] == "0"
                       else "downsample_bn")
            i += 2
            continue
        out.append(p)
        i += 1
    return out


def _s3d_path(parts: List[str]) -> List[str]:
    """coclr/s3dg.S3D: Mixed branches are Sequentials ->
    branch{K}_{idx} module names; branch0.0 -> branch0."""
    out = []
    i = 0
    while i < len(parts):
        p = parts[i]
        if re.fullmatch(r"branch[0-3]", p) and i + 1 < len(parts) and \
                parts[i + 1].isdigit():
            idx = parts[i + 1]
            if p == "branch0":
                out.append("branch0")          # Sequential of one
            elif p == "branch3":
                out.append("branch3_1")        # [pool, conv] -> conv only
            else:
                out.append(f"{p}_{idx}")
            i += 2
            continue
        if p == "project":
            out.append("project")
            assert parts[i + 1] == "net"
            out.append(_MLP_IDX[parts[i + 2]])
            i += 3
            continue
        # drop the blockN Sequential aliases (block1..block5 share modules
        # with the named attributes; state_dict emits both)
        out.append(p)
        i += 1
    return out


def _i3d_path(parts: List[str]) -> List[str]:
    """BE/i3d_byol.I3D: Unit3Dpy conv3d/batch3d -> conv/bn; Mixed branch
    Sequentials -> branch_{K}_{idx}."""
    out = []
    i = 0
    while i < len(parts):
        p = parts[i]
        if p == "conv3d":
            out.append("conv")
            i += 1
            continue
        if p == "batch3d":
            out.append("bn")
            i += 1
            continue
        if re.fullmatch(r"branch_[0-3]", p) and i + 1 < len(parts) and \
                parts[i + 1].isdigit():
            idx = parts[i + 1]
            out.append("branch_3_1" if p == "branch_3" else f"{p}_{idx}")
            i += 2
            continue
        out.append(p)
        i += 1
    return out


_BACKBONE_PATHS = {
    "r21d": _r21d_path,
    "c3d": _c3d_path,
    "r3d": _r3d_path,
    "s3d": _s3d_path,
    "i3d": _i3d_path,
}

# heads whose reference form is Sequential(Linear, BN, ReLU, Linear); our
# PretextHead 'mlp' style nests an MLPHead under "mlp". The r3d/i3d BYOL
# wrappers name the rotation head ``rot_cls`` (r3d_byol.py:253,
# i3d_byol.py:628) where r21d/c3d/s3d use ``rotate_cls`` — both map to our
# canonical ``rotate_cls``.
_PRETEXT_HEADS = ("overlap_spa", "overlap_tem", "pb_cls", "rotate_cls",
                  "rot_cls")
_HEAD_CANON = {"rot_cls": "rotate_cls"}


def _top_path(parts: List[str], family: str, mlp_heads: bool) -> List[str]:
    p = parts[0]
    if p in ("online_net", "target_net"):
        return [p] + _BACKBONE_PATHS[family](parts[1:])
    if p in ("predictor", "prodictor"):
        assert parts[1] == "net"
        return ["predictor", _MLP_IDX[parts[2]]] + parts[3:]
    if p in _PRETEXT_HEADS:
        p = _HEAD_CANON.get(p, p)
        if mlp_heads:  # Sequential directly on the attribute
            return [p, "mlp", _MLP_IDX[parts[1]]] + parts[2:]
        return [p, "fc"] + parts[1:]          # plain nn.Linear
    if p == "cls_bn":
        return ["cls_bn"] + parts[1:]
    if p == "classify":
        if len(parts) > 2 and parts[1].isdigit():  # S3DClassify MLP head
            return ["classify", _MLP_IDX[parts[1]]] + parts[2:]
        return ["classify"] + parts[1:]
    # bare-backbone checkpoints carry backbone modules at top level
    return _BACKBONE_PATHS[family](parts)


def _set(tree: Dict, path: List[str], value) -> None:
    node = tree
    for k in path[:-1]:
        node = node.setdefault(k, {})
    node[path[-1]] = value


def convert_torch_state_dict(
    sd: Dict[str, Any], arch: str
) -> Dict[str, Dict]:
    """Translate a reference state_dict to ``{'params': ..., 'batch_stats':
    ...}`` nested numpy trees (merge into a model with
    ``cstp_tpu.ckpt.checkpoint`` partial restore).

    ``arch`` is the reference model_name ('r21d_byol', 's3d_classify', ...)
    or a bare family name.
    """
    family = arch.split("_")[0]
    if family not in _BACKBONE_PATHS:
        raise ValueError(f"unknown model family {arch!r}")
    mlp_heads = family in ("r21d", "s3d")  # r21d_byol.py:276-291 vs Linear

    def to_np(v):
        return v.detach().cpu().numpy() if hasattr(v, "detach") else np.asarray(v)

    # group by module prefix; BN modules are those with running stats
    modules: Dict[str, Dict[str, Any]] = {}
    for key, val in sd.items():
        if key.startswith("module."):
            key = key[len("module."):]
        parts = key.split(".")
        leaf = parts[-1]
        if leaf == "num_batches_tracked":
            continue
        prefix = ".".join(parts[:-1])
        modules.setdefault(prefix, {})[leaf] = to_np(val)

    params: Dict = {}
    stats: Dict = {}
    for prefix, leaves in modules.items():
        parts = prefix.split(".")
        # coclr S3D registers blockN Sequential ALIASES of the named modules
        # (s3dg.py:181-230) — state_dict emits each tensor twice; keep the
        # canonical names only. Same for backbone-nested aliases.
        bi = 1 if parts[0] in ("online_net", "target_net") else 0
        if family == "s3d" and re.fullmatch(r"block[1-5]", parts[bi]):
            continue
        path = _top_path(parts, family, mlp_heads)
        is_bn = "running_mean" in leaves
        if is_bn:
            # our BatchNorm module wraps an inner module named 'bn'
            path = path + ["bn"]
            _set(params, path + ["scale"], leaves["weight"])
            _set(params, path + ["bias"], leaves["bias"])
            _set(stats, path + ["mean"], leaves["running_mean"])
            _set(stats, path + ["var"], leaves["running_var"])
            continue
        w = leaves.get("weight")
        if w is None:
            continue
        if w.ndim == 5:    # conv OIDHW -> DHWIO
            _set(params, path + ["kernel"], np.transpose(w, (2, 3, 4, 1, 0)))
        elif w.ndim == 2:  # linear (out,in) -> (in,out)
            _set(params, path + ["kernel"], w.T)
        else:
            _set(params, path + ["scale"], w)
        if "bias" in leaves:
            _set(params, path + ["bias"], leaves["bias"])
    return {"params": params, "batch_stats": stats}


def load_torch_checkpoint(path: str, arch: str) -> Tuple[Dict, Dict]:
    """Load a reference ``save_{E}.pth`` -> (converted_tree, meta)."""
    import torch

    try:
        # weights_only=True is a pure tensor/dict unpickler — no arbitrary
        # code execution. The reference's save_{E}.pth payload (epoch/arch/
        # state_dict/optimizer tensors, main_byol.py:134-140) loads fine
        # this way.
        blob = torch.load(path, map_location="cpu", weights_only=True)
    except Exception:
        import warnings

        warnings.warn(
            f"{path!r} is not loadable with weights_only=True; falling back "
            "to the full unpickler, which EXECUTES code embedded in the "
            "checkpoint — only proceed with checkpoints you trust."
        )
        blob = torch.load(path, map_location="cpu", weights_only=False)
    sd = blob.get("state_dict", blob) if isinstance(blob, dict) else blob
    meta = {}
    if isinstance(blob, dict):
        meta = {k: blob[k] for k in ("epoch", "arch") if k in blob}
    return convert_torch_state_dict(sd, arch), meta


def main(argv=None):
    """CLI: convert a reference .pth into a cstp_tpu checkpoint directory.

        python -m cstp_tpu.models.torch_import save_300.pth out_dir \
            --arch r21d_byol
    """
    import argparse

    from cstp_tpu.ckpt.checkpoint import save_checkpoint

    ap = argparse.ArgumentParser(description=main.__doc__)
    ap.add_argument("pth")
    ap.add_argument("out")
    ap.add_argument("--arch", default="r21d_byol")
    args = ap.parse_args(argv)
    tree, meta = load_torch_checkpoint(args.pth, args.arch)
    meta.setdefault("arch", args.arch)
    meta["source"] = args.pth
    save_checkpoint(args.out, tree, meta)
    n = sum(1 for _ in _iter_leaves(tree))
    print(f"converted {n} tensors -> {args.out}")


def _iter_leaves(tree):
    for v in tree.values():
        if isinstance(v, dict):
            yield from _iter_leaves(v)
        else:
            yield v


if __name__ == "__main__":
    main()
