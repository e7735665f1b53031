"""Serving export (cstp_tpu/serve): self-contained StableHLO artifacts.

The reference deploys by re-running its training stack (test.py:23-98);
the rebuild exports the fused augment+forward with weights baked in. These
tests prove the artifact is faithful (logits == the live test path),
batch-polymorphic, cross-platform-lowered, and loadable with no model code.
"""

import json
import zipfile

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cstp_tpu.ckpt import checkpoint as ckpt_lib
from cstp_tpu.config import Config
from cstp_tpu.serve import (
    ServingModel,
    export_serving_artifact,
    save_serving_artifact,
)
from cstp_tpu.serve.export import export_from_checkpoint, main as export_main
from cstp_tpu.train.finetune import create_finetune_state, make_logits_step

T, S, HW = 4, 32, (40, 52)  # tiny geometry: fast CPU compiles
NUM_CLASSES = 7


@pytest.fixture(scope="module")
def tiny_cfg():
    return Config(model_name="r21d", model_depth=1, sample_duration=T,
                  sample_size=S, compute_dtype="float32").finalize()


@pytest.fixture(scope="module")
def tiny_state(tiny_cfg):
    return create_finetune_state(tiny_cfg, jax.random.PRNGKey(3), NUM_CLASSES)


@pytest.fixture(scope="module")
def artifact(tiny_cfg, tiny_state):
    model, state, _ = tiny_state
    return export_serving_artifact(
        model, state.params, state.batch_stats, num_classes=NUM_CLASSES,
        sample_size=S, sample_duration=T, input_hw=HW, platforms=("cpu",),
    )


def _windows(n, seed=0):
    rng = np.random.RandomState(seed)
    return rng.randint(0, 256, size=(n, T, *HW, 3), dtype=np.uint8)


def test_artifact_matches_live_logits_path(tiny_cfg, tiny_state, artifact):
    """The exported program IS the test path: same logits as
    make_logits_step (the engine run_test uses) on the same windows."""
    model, state, _ = tiny_state
    served = ServingModel.load(artifact)
    w = _windows(5)
    live = np.asarray(make_logits_step(model, tiny_cfg)(state, jnp.asarray(w)))
    got = served.predict(w)
    np.testing.assert_allclose(got, live, rtol=2e-5, atol=2e-5)


def test_artifact_is_batch_polymorphic(artifact):
    served = ServingModel.load(artifact)
    for n in (1, 3, 8):
        assert served.predict(_windows(n)).shape == (n, NUM_CLASSES)


def test_artifact_is_self_contained_zip_with_meta(artifact, tmp_path):
    p = tmp_path / "m.cstps"
    save_serving_artifact(str(p), artifact)
    with zipfile.ZipFile(p) as z:
        meta = json.loads(z.read("meta.json"))
    assert meta["model_name"] == "r21d"
    assert meta["num_classes"] == NUM_CLASSES
    assert meta["input_hw"] == list(HW)
    served = ServingModel.load(str(p))
    assert served.meta["sample_duration"] == T


def test_predict_validates_geometry(artifact):
    served = ServingModel.load(artifact)
    with pytest.raises(ValueError, match="expected"):
        served.predict(np.zeros((2, T, 41, 52, 3), np.uint8))


def test_predict_video_mean_logit_topk(artifact):
    """predict_video == sliding windows -> mean logits -> argsort top-k
    (reference test.py:78-95)."""
    served = ServingModel.load(artifact)
    nframes = 3 * T + 1  # forces several windows + a tail window
    rng = np.random.RandomState(1)
    video = rng.randint(0, 256, size=(nframes, *HW, 3), dtype=np.uint8)
    out = served.predict_video(video, pb_rate=1, topk=3)
    from cstp_tpu.train.finetune import sliding_window_indices

    idx = sliding_window_indices(nframes, T, 1)
    logits = served.predict(video[idx])
    mean = logits.mean(axis=0)
    np.testing.assert_allclose(out["mean_logits"], mean, rtol=1e-6)
    assert out["top1"] == int(np.argmax(mean))
    assert out["n_windows"] == idx.shape[0]
    assert list(out["topk"]) == list(np.argsort(-mean)[:3])


def test_cross_platform_lowering_includes_tpu(tiny_state):
    """platforms=('cpu','tpu') lowers BOTH from a CPU-only process — export
    on a dev box, serve on TPU — and the cpu leg still runs here."""
    model, state, _ = tiny_state
    art = export_serving_artifact(
        model, state.params, state.batch_stats, num_classes=NUM_CLASSES,
        sample_size=S, sample_duration=T, input_hw=HW,
        platforms=("cpu", "tpu"),
    )
    served = ServingModel.load(art)
    assert sorted(served.meta["platforms"]) == ["cpu", "tpu"]
    assert served.predict(_windows(2)).shape == (2, NUM_CLASSES)


def test_export_cli_from_checkpoint(tiny_cfg, tiny_state, tmp_path):
    """CLI round-trip: save a finetune checkpoint, export via __main__,
    load the artifact and get the checkpointed model's logits."""
    model, state, _ = tiny_state
    ckpt = str(tmp_path / "save_3.ckpt")
    ckpt_lib.save_checkpoint(
        ckpt, {"params": state.params, "batch_stats": state.batch_stats},
        meta={"arch": tiny_cfg.arch, "epoch": 3},
    )
    out = str(tmp_path / "m.cstps")
    export_main([
        "--ckpt", ckpt, "--out", out, "--model_name", "r21d",
        "--model_depth", "1", "--num_classes", str(NUM_CLASSES),
        "--sample_size", str(S), "--sample_duration", str(T),
        "--input_hw", str(HW[0]), str(HW[1]), "--platforms", "cpu",
        "--compute_dtype", "float32",
    ])
    served = ServingModel.load(out)
    assert served.meta["ckpt_epoch"] == 3
    w = _windows(4, seed=2)
    live = np.asarray(
        make_logits_step(model, tiny_cfg)(state, jnp.asarray(w)))
    np.testing.assert_allclose(served.predict(w), live, rtol=2e-5, atol=2e-5)


def test_int8_static_artifact_matches_live_logits(tiny_state, tmp_path):
    """int8 serving ships inside the AOT artifact (PERF.md round 6: +42%
    measured on TPU): an int8_static model with calibrated scales exports
    to StableHLO, and the artifact's logits equal the live int8 path."""
    import dataclasses

    from cstp_tpu.ckpt import checkpoint as ckpt_lib
    from cstp_tpu.serve.quantize import calibrate_checkpoint
    from cstp_tpu.train.finetune import create_classify_model

    model, state, _ = tiny_state
    float_ckpt = str(tmp_path / "save_float")
    ckpt_lib.save_checkpoint(float_ckpt, {
        "params": jax.device_get(state.params),
        "batch_stats": jax.device_get(state.batch_stats)}, meta={})

    cfg = Config(model_name="r21d", model_depth=1, sample_duration=T,
                 sample_size=S, n_classes=NUM_CLASSES,
                 n_finetune_classes=NUM_CLASSES, data_backend="synthetic",
                 synthetic_len=8, compute_dtype="float32").finalize()
    out_ckpt = str(tmp_path / "save_int8")
    calibrate_checkpoint(cfg, float_ckpt, out_ckpt, n_batches=2,
                         batch_size=4)

    cfg_q = dataclasses.replace(cfg, quant="int8_static").finalize()
    model_q = create_classify_model(cfg_q, NUM_CLASSES)
    x = jnp.zeros((2, T, S, S, 3), jnp.float32)
    vq = model_q.init(jax.random.PRNGKey(0), x, train=False)
    tree, _ = ckpt_lib.restore_checkpoint(
        out_ckpt, {"params": vq["params"], "batch_stats": vq["batch_stats"]})

    art = export_serving_artifact(
        model_q, tree["params"], tree["batch_stats"],
        num_classes=NUM_CLASSES, sample_size=S, sample_duration=T,
        input_hw=HW, platforms=("cpu",))
    served = ServingModel.load(art)
    w = _windows(4, seed=1)
    live = np.asarray(make_logits_step(model_q, cfg_q)(
        state.replace(params=tree["params"],
                      batch_stats=tree["batch_stats"]), jnp.asarray(w)))
    got = served.predict(w)
    assert np.isfinite(got).all()
    np.testing.assert_allclose(got, live, rtol=2e-4, atol=2e-4)
