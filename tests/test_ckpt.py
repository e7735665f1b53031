"""Checkpoint save/restore semantics (naming, best-retention, partial load)."""

import os

import jax.numpy as jnp
import numpy as np
import pytest

from cstp_tpu import ckpt as C


def test_roundtrip(tmp_path):
    tree = {
        "params": {"conv": {"kernel": jnp.arange(6.0).reshape(2, 3)}},
        "batch_stats": {"bn": {"mean": jnp.zeros((3,))}},
        "step": jnp.asarray(7),
    }
    meta = {"arch": "r21d-1", "epoch": 3}
    path = C.save_checkpoint(str(tmp_path / C.ckpt_name(2)), tree, meta)
    got, got_meta = C.restore_checkpoint(path)
    np.testing.assert_array_equal(
        got["params"]["conv"]["kernel"], np.arange(6.0).reshape(2, 3)
    )
    assert got_meta["arch"] == "r21d-1" and got_meta["epoch"] == 3
    assert int(got["step"]) == 7


def test_partial_restore_neq_load(tmp_path):
    """Restore into a differently-shaped target: matching keys load, new
    keys keep init (reference neq_load_customized, models/model.py:11-36)."""
    saved = {"params": {"backbone": {"w": jnp.ones((2,))},
                        "old_head": {"w": jnp.full((3,), 5.0)}}}
    path = C.save_checkpoint(str(tmp_path / "save_1"), saved)
    target = {"params": {"backbone": {"w": jnp.zeros((2,))},
                         "new_head": {"w": jnp.zeros((4,))}}}
    got, _ = C.restore_checkpoint(path, target)
    np.testing.assert_array_equal(got["params"]["backbone"]["w"], np.ones((2,)))
    np.testing.assert_array_equal(got["params"]["new_head"]["w"], np.zeros((4,)))
    assert "old_head" not in got["params"]


def test_epoch_parsing_and_discovery(tmp_path):
    for e in (100, 200):
        C.save_checkpoint(str(tmp_path / C.ckpt_name(e)),
                          {"x": jnp.zeros(1)}, {"epoch": e})
    assert C.epoch_from_name("results/UCF101/loss_com/save_200") == 200
    assert C.epoch_from_name("save_17_max") == 17
    latest = C.latest_checkpoint(str(tmp_path))
    assert latest.endswith("save_200")

    # best discovery requires exactly one *_max
    with pytest.raises(FileNotFoundError):
        C.find_best_checkpoint(str(tmp_path))
    C.save_checkpoint(str(tmp_path / C.ckpt_name(5, best=True)),
                      {"x": jnp.zeros(1)}, {"epoch": 5})
    assert C.find_best_checkpoint(str(tmp_path)).endswith("save_5_max")
    C.save_checkpoint(str(tmp_path / C.ckpt_name(9, best=True)),
                      {"x": jnp.zeros(1)}, {"epoch": 9})
    with pytest.raises(ValueError):
        C.find_best_checkpoint(str(tmp_path))


def test_delete(tmp_path):
    p = C.save_checkpoint(str(tmp_path / "save_3_max"), {"x": jnp.zeros(1)})
    assert os.path.isdir(p)
    C.delete_checkpoint(p)
    assert not os.path.exists(p)
