"""Graceful preemption: SIGTERM -> step-boundary checkpoint -> resume.

The reference loses everything on preemption (SURVEY §5: no recovery; its
pretrain checkpoints only every 100 epochs, main_byol.py:132). Here SIGTERM
finishes the in-flight step, writes a resumable ``save_{E}``, and stops;
``--auto_resume`` / ``--task resume`` then redo the interrupted epoch.

Shapes match the e2e tests (batch 8, 4x32 f32) for persistent-cache reuse.
"""

import os
import signal

import numpy as np

from cstp_tpu.config import Config
from cstp_tpu.train import loops
from cstp_tpu.train.loops import run_finetune, run_pretrain
from cstp_tpu.utils.preemption import PreemptionGuard


def _cfg(result_path, task="loss_com", **kw):
    base = dict(
        model_name="r21d", model_depth=1, sample_duration=4, sample_size=32,
        batch_size=8, compute_dtype="float32", data_backend="synthetic",
        synthetic_len=16, n_epochs=2, ckpt_every_epochs=2,
        learning_rate=0.03, result_path=str(result_path), task=task,
        n_workers=2, log_every=0,
    )
    base.update(kw)
    return Config(**base).finalize()


# --------------------------------------------------------------------------
# PreemptionGuard unit behavior
# --------------------------------------------------------------------------

def test_guard_catches_sigterm_and_restores_handler():
    before = signal.getsignal(signal.SIGTERM)
    guard = PreemptionGuard(enabled=True)
    try:
        assert not guard.requested(1)
        os.kill(os.getpid(), signal.SIGTERM)  # caught by the guard's handler
        assert guard.requested(2)
        assert guard.requested(3)  # latched
    finally:
        guard.close()
    assert signal.getsignal(signal.SIGTERM) is before


def test_guard_disabled_installs_nothing():
    before = signal.getsignal(signal.SIGTERM)
    guard = PreemptionGuard(enabled=False)
    assert signal.getsignal(signal.SIGTERM) is before
    assert not guard.requested(1)
    guard.close()


# --------------------------------------------------------------------------
# Loop wiring: trigger at a chosen global step, assert save + resume
# --------------------------------------------------------------------------

class _TriggerAt:
    """PreemptionGuard stand-in that fires at a fixed global step."""

    def __init__(self, at):
        self.at = at

    def __call__(self, enabled=True):  # constructor signature of the real one
        self.enabled = enabled
        return self

    def requested(self, step_id):
        return self.enabled and step_id >= self.at

    def close(self):
        pass


def test_pretrain_preempt_saves_then_resume_redoes_epoch(tmp_path, monkeypatch):
    monkeypatch.setattr(loops, "PreemptionGuard", _TriggerAt(at=3))
    out = run_pretrain(_cfg(tmp_path, n_epochs=4), max_steps_per_epoch=2)
    assert out["preempted"] is True
    # 2 steps/epoch -> trigger lands on epoch 2 step 1; save_2 exists and
    # resume REDOES epoch 2 (reference filename->epoch semantics)
    assert [h["epoch"] for h in out["history"]] == [1, 2]
    log_dir = tmp_path / "UCF101" / "loss_com"
    ckpt = log_dir / "save_2"
    assert ckpt.is_dir()

    monkeypatch.setattr(loops, "PreemptionGuard", PreemptionGuard)
    res = run_pretrain(_cfg(tmp_path, n_epochs=3, auto_resume=True),
                       max_steps_per_epoch=2)
    assert res["preempted"] is False
    assert [h["epoch"] for h in res["history"]] == [2, 3]
    assert all(np.isfinite(h["loss"]) for h in res["history"])

    # the CSV must hold each epoch ONCE: the interrupted epoch's partial-
    # means row is withheld (resume appends the full-epoch row instead)
    (csv_path,) = [p for p in os.listdir(log_dir) if p.endswith(".log")]
    with open(log_dir / csv_path, newline="") as f:
        rows = [line.split("\t")[0] for line in f.read().splitlines()[1:]]
    assert rows == ["1", "2", "3"]


def test_pretrain_preempt_disabled_runs_to_completion(tmp_path, monkeypatch):
    trigger = _TriggerAt(at=1)
    monkeypatch.setattr(loops, "PreemptionGuard", trigger)
    out = run_pretrain(_cfg(tmp_path, n_epochs=1, graceful_preempt=0),
                       max_steps_per_epoch=2)
    assert out["preempted"] is False
    assert [h["epoch"] for h in out["history"]] == [1]


def test_finetune_preempt_saves_resumable_state(tmp_path, monkeypatch):
    monkeypatch.setattr(loops, "PreemptionGuard", _TriggerAt(at=3))
    cfg = _cfg(tmp_path, task="scratch", n_epochs=4, n_classes=4,
               n_finetune_classes=4)
    out = run_finetune(cfg, max_steps_per_epoch=2)
    assert out["preempted"] is True
    log_dir = tmp_path / "UCF101" / "scratch"
    # trigger at global step 3 = epoch 2 train step 1 (train 2 + val ... the
    # exact epoch is whatever the loop saved; find the single save_{E})
    saves = [d for d in os.listdir(log_dir)
             if d.startswith("save_") and not d.endswith("_max")]
    assert len(saves) == 1
    ckpt = log_dir / saves[0]

    monkeypatch.setattr(loops, "PreemptionGuard", PreemptionGuard)
    res = run_finetune(
        _cfg(tmp_path, task="resume", n_epochs=2, n_classes=4,
             n_finetune_classes=4, resume_md_path=str(ckpt)),
        max_steps_per_epoch=2,
    )
    assert res["preempted"] is False
    # meta epoch == interrupted epoch -> the epoch is redone
    first = res["history"][0]["epoch"]
    assert first == int(saves[0].split("_")[1])
