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


# ---------------------------------------------------------------------------
# Centralized flag-combination validation (VERDICT r4 #8): every
# documented-incompatible combo must die in finalize() at parse time —
# naming both flags — instead of after a 15-minute tunnel compile.
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("kw,needle", [
    # eval-only quant modes on training tasks (train/pretrain.py
    # _check_trainable_quant's parse-time mirror)
    (dict(quant="int8_static", task="loss_com"), "eval/serve"),
    (dict(quant="int8_calib", task="ft_all"), "eval/serve"),
    # int8_store is r21d-factorized-chain-only
    (dict(quant="int8_store", model_name="c3d"), "r21d"),
    (dict(quant="int8_store_fz", model_name="s3d"), "r21d"),
    # int8_store x chain rewrites (models/layers.py assertion's mirror)
    (dict(quant="int8_store", s2d_stem=True), "s2d_stem"),
    (dict(quant="int8_store", t_fold=1), "t_fold"),
    # fused_conv runs the stride-1 blocks FLOAT -> silent partial quant
    (dict(fused_conv=1, quant="int8"), "fused_conv"),
    (dict(fused_conv=1, quant="int8_fixed"), "fused_conv"),
    # conflicting rewrites of the same chain
    (dict(fused_conv=1, t_fold=1), "t_fold"),
    # shard_spatial needs a >1 'model' mesh axis to do anything
    (dict(shard_spatial=1, mesh_shape=(-1, 1)), "model"),
    # microbatching must divide the global batch
    (dict(batch_size=6, grad_accum=4), "grad_accum"),
])
def test_finalize_rejects_documented_incompatible_combos(kw, needle):
    with pytest.raises(ValueError) as ei:
        Config(**kw).finalize()
    msg = str(ei.value)
    assert needle in msg, msg
    # the message names every flag involved so the fix is obvious
    for flag in kw:
        assert flag.lstrip("-") in msg.replace("-", "_"), (flag, msg)


def test_finalize_accepts_the_valid_neighbours():
    """The guards must not over-reject: each rejected combo's valid
    neighbour finalizes fine."""
    Config(quant="int8_static", task="test").finalize()
    Config(quant="int8_calib", task="retrieval").finalize()
    Config(quant="int8_store", model_name="r21d").finalize()
    Config(fused_conv=1).finalize()
    Config(t_fold=1, quant="int8").finalize()
    Config(shard_spatial=1, mesh_shape=(-1, 2)).finalize()
    Config(shard_spatial=1, mesh_shape=(4, -1)).finalize()
    Config(batch_size=8, grad_accum=4).finalize()
