"""Serving export: the eval forward as a portable, self-contained artifact.

The reference has no deployment path: serving a finetuned model means
re-running the training stack (``test.py:23-98`` rebuilds the torch model,
loads a ``.pth`` and loops in eager mode). The TPU-native answer is
ahead-of-time export: trace the FULL inference computation — deterministic
eval augmentation (scale short side -> center crop -> normalize,
``preprocess_data.py:1139-1149`` semantics) fused with the eval-mode
forward — into one StableHLO program with the trained weights baked in as
constants, and serialize it with :mod:`jax.export`.

Properties of the artifact (a single ``.cstps`` zip):

* **Self-contained** — a runtime needs jax + this file; no model classes,
  no Flax, no checkpoint tree. Weights travel inside the program.
* **Batch-polymorphic** — exported with a symbolic leading dimension, so
  one program serves any window count (XLA compiles per concrete batch
  size on first use, as usual).
* **Cross-platform** — lowered for several platforms at once (default
  ``cpu`` + ``tpu``): export on a CPU dev box, serve on TPU.
* **Versioned metadata** — ``meta.json`` records the model identity, input
  geometry and normalization so a server can validate requests.

``ServingModel`` is the tiny runtime: load, ``predict`` on a window batch,
``predict_video`` for reference ``test.py`` semantics (sliding windows ->
mean logits -> top-k).
"""

from __future__ import annotations

import io
import json
import zipfile
from dataclasses import dataclass
from typing import Dict, Optional, Sequence, Tuple

import numpy as np

ARTIFACT_VERSION = 1
_MODULE_NAME = "forward.shlo"
_META_NAME = "meta.json"


def _export_forward(model, params, batch_stats, *, sample_size: int,
                    sample_duration: int, input_hw: Tuple[int, int],
                    norm_method: str, platforms: Sequence[str],
                    check_platform: bool = True):
    """jax.export the fused augment+forward with a symbolic batch dim."""
    import jax
    import jax.numpy as jnp

    from cstp_tpu.augment.pipeline import eval_augment_batch

    variables = {"params": params, "batch_stats": batch_stats}

    def forward(frames):  # (b, T, H0, W0, 3) uint8 -> (b, C) f32
        x = eval_augment_batch(frames, sample_size=sample_size,
                               norm_method=norm_method)
        logits = model.apply(variables, x.astype(model.dtype), train=False)
        return logits.astype(jnp.float32)

    (b,) = jax.export.symbolic_shape("b")
    h0, w0 = input_hw
    spec = jax.ShapeDtypeStruct((b, sample_duration, h0, w0, 3), jnp.uint8)
    disabled = () if check_platform else (
        jax.export.DisabledSafetyCheck.platform(),)
    return jax.export.export(jax.jit(forward), platforms=list(platforms),
                             disabled_checks=list(disabled))(spec)


def export_serving_artifact(model, params, batch_stats, *,
                            num_classes: int, sample_size: int,
                            sample_duration: int,
                            input_hw: Tuple[int, int] = (128, 171),
                            norm_method: str = "tf",
                            platforms: Sequence[str] = ("cpu", "tpu"),
                            extra_meta: Optional[Dict] = None,
                            check_platform: bool = True) -> bytes:
    """Serialize (augment + eval forward + weights) to artifact bytes.

    ``model`` is a built ``CSTPClassify``; ``params``/``batch_stats`` its
    trained variables. ``input_hw`` is the stored frame geometry the server
    will receive (the eval transform rescales from it, so it is part of the
    traced program and fixed per artifact). ``check_platform=False`` drops
    the call-time platform safety check — needed when the serving runtime's
    PJRT plugin reports a platform name outside jax.export's canonical set
    (e.g. a tunneled/proxied TPU).
    """
    exported = _export_forward(
        model, params, batch_stats, sample_size=sample_size,
        sample_duration=sample_duration, input_hw=tuple(input_hw),
        norm_method=norm_method, platforms=platforms,
        check_platform=check_platform,
    )
    meta = {
        "artifact_version": ARTIFACT_VERSION,
        "model_name": model.backbone,
        "model_depth": model.depth,
        "num_classes": num_classes,
        "sample_size": sample_size,
        "sample_duration": sample_duration,
        "input_hw": list(input_hw),
        "norm_method": norm_method,
        "platforms": list(exported.platforms),
    }
    if extra_meta:
        meta.update(extra_meta)
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as z:
        z.writestr(_META_NAME, json.dumps(meta, indent=2))
        z.writestr(_MODULE_NAME, bytes(exported.serialize()))
    return buf.getvalue()


def save_serving_artifact(path: str, artifact: bytes) -> None:
    with open(path, "wb") as f:
        f.write(artifact)


@dataclass
class ServingModel:
    """Loaded artifact: ``predict`` on window batches, zero model code."""

    meta: Dict
    _exported: object  # jax.export.Exported

    @classmethod
    def load(cls, path_or_bytes) -> "ServingModel":
        import jax

        if isinstance(path_or_bytes, (bytes, bytearray)):
            raw = bytes(path_or_bytes)
        else:
            with open(path_or_bytes, "rb") as f:
                raw = f.read()
        with zipfile.ZipFile(io.BytesIO(raw)) as z:
            meta = json.loads(z.read(_META_NAME))
            exported = jax.export.deserialize(bytearray(z.read(_MODULE_NAME)))
        if meta.get("artifact_version") != ARTIFACT_VERSION:
            raise ValueError(
                f"artifact version {meta.get('artifact_version')} "
                f"!= supported {ARTIFACT_VERSION}")
        return cls(meta=meta, _exported=exported)

    def predict(self, frames: np.ndarray) -> np.ndarray:
        """(N, T, H0, W0, 3) uint8 windows -> (N, num_classes) f32 logits."""
        import jax.numpy as jnp

        t = self.meta["sample_duration"]
        h0, w0 = self.meta["input_hw"]
        want = (t, h0, w0, 3)
        if frames.ndim != 5 or frames.shape[1:] != want:
            raise ValueError(
                f"expected (N, {t}, {h0}, {w0}, 3) uint8 windows, got "
                f"{frames.shape}")
        out = self._exported.call(jnp.asarray(frames, jnp.uint8))
        return np.asarray(out)

    def predict_video(self, frames: np.ndarray, *, pb_rate: int = 1,
                      topk: int = 5) -> Dict:
        """Reference ``test.py`` video-level semantics on one decoded video:
        non-overlapping sliding windows + tail (datasets.py:1062-1097),
        mean of per-window logits, top-k (test.py:78-95)."""
        from cstp_tpu.train.finetune import sliding_window_indices

        t = self.meta["sample_duration"]
        idx = sliding_window_indices(frames.shape[0], t, pb_rate)
        windows = frames[idx]  # (N, T, H0, W0, 3)
        logits = self.predict(windows)
        mean_logits = logits.mean(axis=0)
        order = np.argsort(-mean_logits)[:topk]
        return {
            "mean_logits": mean_logits,
            "topk": order,
            "top1": int(order[0]),
            "n_windows": int(windows.shape[0]),
        }


def export_from_checkpoint(config, ckpt_path: str, num_classes: int,
                           input_hw: Tuple[int, int] = (128, 171),
                           platforms: Sequence[str] = ("cpu", "tpu")) -> bytes:
    """Build the classify model from ``config``, restore a checkpoint
    (partial, name-merged — the same path ``run_test`` uses,
    train/loops.py:476-489) and export it."""
    import jax

    from cstp_tpu.ckpt import checkpoint as ckpt_lib
    from cstp_tpu.train.finetune import create_finetune_state

    model, state, _ = create_finetune_state(
        config, jax.random.PRNGKey(config.manual_seed), num_classes)
    tree, meta = ckpt_lib.restore_checkpoint(
        ckpt_path, {"params": state.params, "batch_stats": state.batch_stats})
    if config.quant == "int8_static":
        from cstp_tpu.ops.quant import check_int8_calibrated

        check_int8_calibrated(tree["batch_stats"], "serve export")
    return export_serving_artifact(
        model, tree["params"], tree["batch_stats"],
        num_classes=num_classes, sample_size=config.sample_size,
        sample_duration=config.sample_duration, input_hw=input_hw,
        platforms=platforms,
        extra_meta={"arch": config.arch, "ckpt_epoch": meta.get("epoch")},
    )


def main(argv=None):
    import argparse

    from cstp_tpu.config import Config

    ap = argparse.ArgumentParser(
        description="Export a finetuned checkpoint as a serving artifact")
    ap.add_argument("--ckpt", required=True, help="finetune checkpoint path")
    ap.add_argument("--out", required=True, help="output .cstps path")
    ap.add_argument("--model_name", default="r21d")
    ap.add_argument("--model_depth", type=int, default=1)
    ap.add_argument("--num_classes", type=int, required=True)
    ap.add_argument("--sample_size", type=int, default=112)
    ap.add_argument("--sample_duration", type=int, default=16)
    ap.add_argument("--input_hw", type=int, nargs=2, default=(128, 171),
                    metavar=("H", "W"),
                    help="stored frame geometry the server receives")
    ap.add_argument("--platforms", default="cpu,tpu")
    ap.add_argument("--compute_dtype", default="bfloat16")
    args = ap.parse_args(argv)

    cfg = Config(model_name=args.model_name, model_depth=args.model_depth,
                 sample_size=args.sample_size,
                 sample_duration=args.sample_duration,
                 compute_dtype=args.compute_dtype).finalize()
    artifact = export_from_checkpoint(
        cfg, args.ckpt, args.num_classes, input_hw=tuple(args.input_hw),
        platforms=tuple(p for p in args.platforms.split(",") if p),
    )
    save_serving_artifact(args.out, artifact)
    print(f"wrote {args.out} ({len(artifact)/1e6:.1f} MB, "
          f"platforms {args.platforms})")


if __name__ == "__main__":
    main()
