"""Nearest-neighbor video retrieval (task ``retrieval``).

The CSTP paper evaluates R@{1,5,10,20,50} video retrieval (test clips query
the train gallery with cosine similarity of backbone features); the
reference repo ships no script for the protocol — rebuilt as
``run_retrieval`` / ``cli/main_retrieval.py``.
"""

import numpy as np
import pytest

from cstp_tpu import ckpt as ckpt_lib
from cstp_tpu.config import Config
from cstp_tpu.train.finetune import (
    create_finetune_state,
    retrieval_recalls,
)
from cstp_tpu.train.loops import run_retrieval


def test_retrieval_recalls_exact():
    """Hand-constructed neighborhoods -> exact R@k."""
    gallery = np.eye(4, dtype=np.float32)          # labels 0..3
    g_labels = np.arange(4)
    # q0 -> nearest g0 (same class): hit at k=1.
    # q1 (class 1) -> nearest g2, then g1: miss at k=1, hit at k=2+.
    # q2 (class 9, absent from gallery): never hits.
    q = np.stack([
        gallery[0],
        0.9 * gallery[2] + 0.4 * gallery[1],
        gallery[3],
    ]).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    q_labels = np.array([0, 1, 9])
    r = retrieval_recalls(q, q_labels, gallery, g_labels, topk=(1, 2, 4))
    assert r["R@1"] == pytest.approx(1 / 3)
    assert r["R@2"] == pytest.approx(2 / 3)
    assert r["R@4"] == pytest.approx(2 / 3)


def test_retrieval_recalls_chunked_matches_unchunked():
    rng = np.random.default_rng(0)
    g = rng.normal(size=(40, 8)).astype(np.float32)
    g /= np.linalg.norm(g, axis=1, keepdims=True)
    gl = rng.integers(0, 5, 40)
    q = rng.normal(size=(23, 8)).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    ql = rng.integers(0, 5, 23)
    a = retrieval_recalls(q, ql, g, gl, topk=(1, 5, 10), chunk=7)
    b = retrieval_recalls(q, ql, g, gl, topk=(1, 5, 10), chunk=512)
    assert a == b
    # k larger than the gallery degrades gracefully to full-gallery search
    full = retrieval_recalls(q, ql, g, gl, topk=(50,), chunk=512)
    assert 0.0 <= full["R@50"] <= 1.0


def _cfg(tmp_path, **kw):
    return Config(
        model_name="r21d", model_depth=1, sample_duration=4, sample_size=32,
        batch_size=4, compute_dtype="float32", data_backend="synthetic",
        synthetic_len=8, n_classes=4, n_finetune_classes=4,
        result_path=str(tmp_path), task="retrieval", retrieval_clips=2,
        n_workers=2, **kw,
    ).finalize()


def test_run_retrieval_e2e_auto_checkpoint(tmp_path):
    """Full protocol off an auto-discovered *_max finetune checkpoint
    (test.py:50-55 semantics) on the synthetic backend."""
    import jax

    cfg = _cfg(tmp_path, t_ft_task="ft_all")
    _, state, _ = create_finetune_state(cfg, jax.random.PRNGKey(0), 4)
    ckpt_dir = tmp_path / cfg.dataset / "ft_all" / "save_1_max"
    ckpt_lib.save_checkpoint(
        str(ckpt_dir),
        {"params": state.params, "batch_stats": state.batch_stats},
        {"arch": cfg.arch},
    )
    out = run_retrieval(cfg)
    ks = [1, 5, 10, 20, 50]
    vals = [out[f"R@{k}"] for k in ks]
    assert all(0.0 <= v <= 1.0 for v in vals)
    assert vals == sorted(vals), "R@k must be nondecreasing in k"
    assert out["n_gallery"] == 8 and out["n_queries"] == 8
    # identical splits on the synthetic backend: every query's own class is
    # in the gallery, so the full-gallery recall is exact. (No claim about
    # R@1 self-match: a near-collapsed feature space ties at sim≈1.0 and
    # top_k breaks ties by index — observed with trained tiny models.)
    assert vals[-1] == 1.0
    with open(out["report"]) as f:
        body = f.read()
    assert "R@50" in body and "gallery = 8" in body


def test_pretrain_checkpoint_feeds_retrieval(tmp_path):
    """--pretrained_path with a BYOL pretrain checkpoint: the online_net
    backbone overlays by name onto the retrieval model (the standard
    self-supervised evaluation path)."""
    import jax

    from cstp_tpu.train.pretrain import create_pretrain_state

    cfg = _cfg(tmp_path)
    pre_cfg = Config(
        model_name="r21d_byol", model_depth=1, sample_duration=4,
        sample_size=32, batch_size=4, compute_dtype="float32",
        data_backend="synthetic", synthetic_len=8, n_classes=4,
        result_path=str(tmp_path), task="loss_com",
    ).finalize()
    _, pre_state, _ = create_pretrain_state(pre_cfg, jax.random.PRNGKey(7))
    ckpt_dir = tmp_path / "save_2"
    ckpt_lib.save_checkpoint(
        str(ckpt_dir),
        {"params": pre_state.params, "batch_stats": pre_state.batch_stats},
        {"arch": pre_cfg.arch},
    )

    # the by-name overlay carries the pretrained backbone leaves exactly
    _, ft_state, _ = create_finetune_state(cfg, jax.random.PRNGKey(0), 4)
    tree, _ = ckpt_lib.restore_checkpoint(
        str(ckpt_dir),
        {"params": ft_state.params, "batch_stats": ft_state.batch_stats},
    )
    want = jax.tree_util.tree_leaves(pre_state.params["online_net"])
    got = jax.tree_util.tree_leaves(tree["params"]["online_net"])
    assert all(np.allclose(a, b) for a, b in zip(want, got))

    out = run_retrieval(
        _cfg(tmp_path, pretrained_path=str(ckpt_dir)))
    assert 0.0 <= out["R@1"] <= 1.0 and out["n_queries"] == 8
