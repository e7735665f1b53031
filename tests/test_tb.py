"""TensorBoard scalar writer (--tb_dir): files must round-trip through
tensorboard's OWN event loader — framing (masked crc32c), protobuf
encoding, and tag/step/value fidelity."""

import numpy as np
import pytest

from cstp_tpu.utils.tb import TBWriter, _crc32c, _masked_crc


def test_crc32c_known_vectors():
    # RFC 3720 test vectors
    assert _crc32c(b"") == 0x0
    assert _crc32c(b"123456789") == 0xE3069283
    assert _crc32c(bytes(32)) == 0x8A9136AA
    # TFRecord masking is a pure function of the crc
    assert _masked_crc(b"123456789") == (
        (((0xE3069283 >> 15) | (0xE3069283 << 17)) + 0xA282EAD8) & 0xFFFFFFFF)


def test_events_file_round_trips_through_tensorboard(tmp_path):
    tb_loader = pytest.importorskip(
        "tensorboard.backend.event_processing.event_file_loader")

    w = TBWriter(str(tmp_path))
    w.add_scalar("train/loss", 1.5, step=1)
    w.add_scalar("train/loss", 0.75, step=2)
    w.add_scalars({"acc": 0.25, "lr": 0.03, "skipped": None}, step=2,
                  prefix="val/")
    w.close()

    events = list(tb_loader.EventFileLoader(w.path).Load())
    assert events[0].file_version == "brain.Event:2"
    # the loader's data_compat pass migrates simple_value -> scalar tensor
    # (proof TensorBoard classifies these as DATA_CLASS_SCALAR)
    scalars = [(v.tag, e.step,
                v.tensor.float_val[0] if v.tensor.float_val
                else v.simple_value)
               for e in events[1:] for v in e.summary.value]
    tags = [s[0] for s in scalars]
    assert tags == ["train/loss", "train/loss", "val/acc", "val/lr"]
    np.testing.assert_allclose([s[2] for s in scalars],
                               [1.5, 0.75, 0.25, 0.03], rtol=1e-6)
    assert [s[1] for s in scalars] == [1, 2, 2, 2]
    assert all(e.wall_time > 0 for e in events)


def test_pretrain_loop_writes_tb_scalars(tmp_path):
    """--tb_dir wiring: one epoch of the synthetic pretrain emits step/ and
    epoch/ scalar families readable by tensorboard."""
    tb_loader = pytest.importorskip(
        "tensorboard.backend.event_processing.event_file_loader")
    import os

    from cstp_tpu.config import Config
    from cstp_tpu.train.loops import run_pretrain

    cfg = Config(
        model_name="r21d", model_depth=1, sample_duration=4, sample_size=32,
        batch_size=8, compute_dtype="float32", data_backend="synthetic",
        synthetic_len=16, n_epochs=1, ckpt_every_epochs=1,
        learning_rate=0.03, result_path=str(tmp_path), task="loss_com",
        n_workers=2, log_every=1, tb_dir=str(tmp_path / "tb"),
    ).finalize()
    run_pretrain(cfg, max_steps_per_epoch=2)

    # reproducibility record: resolved flags land in the run dir as JSON
    import json
    cfg_json = tmp_path / "UCF101" / "loss_com" / "config.json"
    assert cfg_json.is_file()
    rec = json.loads(cfg_json.read_text())
    assert rec["model_name"] == "r21d" and rec["batch_size"] == 8

    tb_dir = tmp_path / "tb" / "pretrain"
    files = os.listdir(tb_dir)
    assert len(files) == 1
    tags = set()
    for e in tb_loader.EventFileLoader(str(tb_dir / files[0])).Load():
        for v in e.summary.value:
            tags.add(v.tag)
    assert "step/loss" in tags and "epoch/loss" in tags
    assert "epoch/lr" in tags and "step/loss_byol" in tags
