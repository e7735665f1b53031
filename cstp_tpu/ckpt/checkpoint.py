"""Checkpoint save/restore (Orbax) with reference naming semantics.

Reference behavior reproduced (``main_byol.py:132-140``,
``main_ft_mp.py:295-310``, ``test.py:50-55``):
* pretrain: ``save_{epoch}`` directories (torch saved ``save_{epoch}.pth``);
* finetune: best-val-only retention as ``save_{epoch}_max``, deleting the
  previous best;
* test auto-discovery: glob ``*_max`` under the result path;
* resume: epoch parsed from the checkpoint name;
* an ``arch`` tag asserted on load (models/model.py:113-121).

Fixes over the reference: optimizer AND epoch/step AND plateau-scheduler
state are always saved (the reference silently drops scheduler state —
SURVEY §5 resume bug); restore into a target tree is partial/by-name, the
moral equivalent of ``neq_load_customized`` (models/model.py:11-36).

Layout: ``<path>/tree`` (Orbax array pytree) + ``<path>/meta.json``
(arch/epoch/scheduler and other JSON-able metadata).
"""

from __future__ import annotations

import glob
import json
import os
import re
import shutil
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np
import orbax.checkpoint as ocp


def _to_host(tree):
    return jax.tree_util.tree_map(lambda x: np.asarray(jax.device_get(x)), tree)


def save_checkpoint(path: str, tree: Dict[str, Any],
                    meta: Optional[Dict[str, Any]] = None) -> str:
    """Save an array pytree + JSON metadata at ``path`` (a directory)."""
    path = os.path.abspath(path)
    if os.path.exists(path):
        shutil.rmtree(path)
    os.makedirs(path)
    tree = {k: v for k, v in tree.items() if v is not None}
    ckptr = ocp.PyTreeCheckpointer()
    ckptr.save(os.path.join(path, "tree"), _to_host(tree))
    with open(os.path.join(path, "meta.json"), "w") as f:
        json.dump(meta or {}, f)
    return path


def restore_checkpoint(
    path: str, target: Optional[Dict[str, Any]] = None
) -> Tuple[Dict[str, Any], Dict[str, Any]]:
    """Restore (tree, meta). With ``target``, the tree is overlaid onto the
    target structure by name (partial 'not-equal' load tolerated)."""
    path = os.path.abspath(path)
    ckptr = ocp.PyTreeCheckpointer()
    restored = ckptr.restore(os.path.join(path, "tree"))
    meta_path = os.path.join(path, "meta.json")
    meta = {}
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            meta = json.load(f)
    if target is not None:
        restored = _merge_by_name(target, restored)
    return restored, meta


def _merge_by_name(target, restored):
    """Recursively overlay restored leaves onto target by dict path —
    equivalent to reference ``neq_load_customized`` (models/model.py:11-36):
    keys present in both are loaded, target-only keys keep their init,
    restored-only keys are dropped.

    Orbax round-trips namedtuples (optax states) and tuples as dicts keyed
    by field name / index string; the target's container types are
    reconstructed so optimizer state survives resume intact."""
    if isinstance(target, dict) and isinstance(restored, dict):
        out = dict(target)
        for k in target:
            if k in restored:
                out[k] = _merge_by_name(target[k], restored[k])
        return out
    if hasattr(target, "_fields"):  # namedtuple (optax TraceState etc.)
        if isinstance(restored, dict):
            vals = {f: _merge_by_name(getattr(target, f), restored[f])
                    for f in target._fields if f in restored}
        elif isinstance(restored, (tuple, list)) and len(restored) == len(
                target._fields):
            vals = {f: _merge_by_name(getattr(target, f), r)
                    for f, r in zip(target._fields, restored)}
        else:
            return target
        full = {f: vals.get(f, getattr(target, f)) for f in target._fields}
        return type(target)(**full)
    if isinstance(target, (tuple, list)):
        if isinstance(restored, dict):
            seq = [_merge_by_name(t, restored[str(i)])
                   if str(i) in restored else t
                   for i, t in enumerate(target)]
        elif isinstance(restored, (tuple, list)) and len(restored) == len(target):
            seq = [_merge_by_name(t, r) for t, r in zip(target, restored)]
        else:
            return target
        return type(target)(seq) if isinstance(target, list) else tuple(seq)
    if restored is None:
        return target
    return restored


def ckpt_name(epoch: int, best: bool = False) -> str:
    return f"save_{epoch}_max" if best else f"save_{epoch}"


def epoch_from_name(path: str) -> int:
    """Reference resume parses the epoch from the filename
    (main_byol.py:215: ``split('_')[1]``)."""
    m = re.search(r"save_(\d+)", os.path.basename(os.path.normpath(path)))
    if not m:
        raise ValueError(f"cannot parse epoch from {path!r}")
    return int(m.group(1))


def latest_checkpoint(result_dir: str) -> Optional[str]:
    cands = glob.glob(os.path.join(result_dir, "save_*"))
    cands = [c for c in cands if os.path.isdir(c)]
    if not cands:
        return None
    return max(cands, key=epoch_from_name)


def find_best_checkpoint(result_dir: str) -> str:
    """test.py:50-55 auto-discovery: exactly one ``*_max`` must exist."""
    cands = [c for c in glob.glob(os.path.join(result_dir, "*_max"))
             if os.path.isdir(c)]
    if len(cands) > 1:
        raise ValueError("Too many models in result path")
    if not cands:
        raise FileNotFoundError(f"no *_max checkpoint under {result_dir}")
    return cands[0]


def delete_checkpoint(path: str) -> None:
    if path and os.path.isdir(path):
        shutil.rmtree(path)
