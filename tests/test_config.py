"""Flag-surface round-trips for reference parity + TPU-native knobs."""

import pytest

from cstp_tpu.config import Config, parse_opts


def test_reference_flag_surface_parses():
    cfg = parse_opts([
        "--dataset", "UCF101", "--task", "loss_com", "--model_name", "r21d",
        "--model_depth", "1", "--batch_size", "60", "--learning_rate", "0.03",
        "--weight_decay", "5e-4", "--n_epochs", "300",
        "--loss_weight", "0.1", "1", "1", "1", "1",
        "--sync_bn", "0", "--resnet_shortcut", "A", "--dampening", "0.2",
        "--norm_method", "imagenet", "--pb_rate", "4",
        "--temperature", "0.3", "--steps_per_epoch", "7",
    ])
    assert cfg.loss_weight == (0.1, 1.0, 1.0, 1.0, 1.0)
    assert cfg.sync_bn == 0 and cfg.resnet_shortcut == "A"
    assert cfg.dampening == 0.2 and cfg.norm_method == "imagenet"
    assert cfg.temperature == 0.3 and cfg.steps_per_epoch == 7


def test_tpu_native_flags_parse():
    cfg = parse_opts([
        "--mesh_shape", "4", "2", "--compute_dtype", "float32",
        "--ntxent_weight", "0.5", "--s2d_stem", "--model_name", "s3d",
        "--pallas_augment", "on", "--tf_i3d_ckpt", "/x/i3d.ckpt",
        "--profile_dir", "/tmp/tr", "--profile_steps", "3",
        "--data_backend", "lmdb", "--lmdb_path", "/x/shard",
    ])
    assert cfg.mesh_shape == (4, 2)
    assert cfg.ntxent_weight == 0.5 and cfg.s2d_stem
    assert cfg.pallas_augment == "on" and cfg.tf_i3d_ckpt == "/x/i3d.ckpt"
    assert cfg.profile_dir == "/tmp/tr" and cfg.profile_steps == 3
    assert cfg.data_backend == "lmdb"


def test_finalize_validation():
    with pytest.raises(AssertionError):
        Config(task="nope").finalize()
    with pytest.raises(AssertionError):
        Config(loss_weight=(1.0, 1.0)).finalize()
    c = Config(loss_weight=2).finalize()  # scalar broadcast
    assert c.loss_weight == (2.0,) * 5


def test_json_roundtrip():
    c = Config(batch_size=48, mesh_shape=(2, 1),
               loss_weight=(0.5, 1, 1, 1, 1)).finalize()
    c2 = Config.from_json(c.to_json())
    assert c2.batch_size == 48 and c2.mesh_shape == (2, 1)
    assert c2.loss_weight == (0.5, 1.0, 1.0, 1.0, 1.0)
    assert c2.arch == c.arch


def test_bare_legacy_model_name_warns_on_cli_parse():
    """Bare --model_name r21d selects the reference's LEGACY pace
    contrastive variant (models/model.py:41-43), which is deliberately not
    rebuilt — the CLI must say so loudly (VERDICT r1 #10)."""
    import warnings

    from cstp_tpu.config import parse_opts

    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        parse_opts(["--model_name", "r21d", "--task", "loss_com"])
    assert any("LEGACY" in str(x.message) for x in w)

    # the _byol spelling (the live reference model) stays silent
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        parse_opts(["--model_name", "r21d_byol", "--task", "loss_com"])
    assert not any("LEGACY" in str(x.message) for x in w)
