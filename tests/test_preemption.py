"""Preemption-safe shutdown (utils/preemption.py + the cps.train loop).

The reference has no failure-recovery story (SURVEY.md §5).  Here SIGTERM
latches into an epoch-boundary graceful stop that writes a FULL-CONTRACT
last.ckpt regardless of the checkpoint cadence, and ``cfg.train.resume:
"auto"`` picks the run back up.  Pinned: the signal mechanics (latch,
handler restore, second-signal escape) and the end-to-end stop->resume
flow through the production driver.
"""
import os
import signal

import numpy as np
import pytest

from vq_seg_tpu.config import Config
from vq_seg_tpu.utils.preemption import PreemptionGuard


def test_guard_latches_sigterm_and_restores_handler():
    prev = signal.getsignal(signal.SIGTERM)
    with PreemptionGuard() as g:
        assert not g.should_stop
        os.kill(os.getpid(), signal.SIGTERM)  # delivered synchronously
        assert g.should_stop
    assert signal.getsignal(signal.SIGTERM) is prev


def test_guard_second_signal_escapes():
    with PreemptionGuard() as g:
        os.kill(os.getpid(), signal.SIGTERM)
        assert g.should_stop
        with pytest.raises(KeyboardInterrupt):
            os.kill(os.getpid(), signal.SIGTERM)
    # escape path re-raises but the context exit still restores disposition
    assert signal.getsignal(signal.SIGTERM) in (
        signal.SIG_DFL, signal.default_int_handler) or callable(
        signal.getsignal(signal.SIGTERM))


def _flagship_cfg(synthetic_dataset, tmp_path, num_epochs, resume=None):
    return Config({
        "project_name": "preempt_test", "wandb_logging": False,
        "num_classes": 3, "pixel_to_label": {"0": 0, "128": 1, "255": 2},
        "resize": 32,
        "model": {"name": "vqreptunet1x1v2", "params": {
            "encoder_name": "resnet18", "num_classes": 3,
            "vq_cfg": {"num_embeddings": [0, 0, 4, 4, 4],
                       "distance": "euclidean", "kmeans_init": True},
            "margin": 0.5, "scale": 30.0}},
        "train": {"data_dir": synthetic_dataset,
                  "save_dir": str(tmp_path / "runs"),
                  "num_epochs": num_epochs, "batch_size": 1,
                  "learning_rate": 1e-4,
                  "lr_scheduler": {"name": "cosineannealing", "min_lr": 1e-7,
                                   "warmup_steps": 0},
                  "half": False, "criterion": {"name": "dice_loss"},
                  "cps_loss_weight": 1, "total_commitment_loss_weight": 1,
                  "total_prototype_loss_weight": 0.01,
                  "confidence_threshold": 0.7, "save_img": False,
                  "save_txt": True, "resume": resume,
                  # cadence that would NOT write last.ckpt at epoch 0 —
                  # the preemption path must force the full contract anyway
                  "ckpt_every": 7, "last_every": 7},
    })


def test_preempted_train_saves_full_contract_and_auto_resumes(
        synthetic_dataset, tmp_path, capsys):
    from vq_seg_tpu.training import cps
    from vq_seg_tpu.utils.ckpoints import load_full

    # a pre-latched guard: deterministic "SIGTERM arrived during epoch 0"
    guard = PreemptionGuard()
    guard.request_stop()
    cfg = _flagship_cfg(synthetic_dataset, tmp_path, num_epochs=9)
    cps.train(cfg, max_steps_per_epoch=2, preempt=guard)
    out = capsys.readouterr().out
    assert "preempted after epoch 0" in out

    runs = os.listdir(str(tmp_path / "runs"))
    assert len(runs) == 1
    last = os.path.join(str(tmp_path / "runs"), runs[0], "ckpoints", "last.ckpt")
    assert os.path.isdir(last)
    ck = load_full(last)
    # full resume contract despite the 7-epoch cadence (epoch 0 would have
    # been snapshot-only without the preemption override)
    assert ck.get("optimizer_1") is not None
    assert int(np.asarray(ck["epoch"])) == 0

    # elastic recovery: rerun with resume="auto" picks up last.ckpt
    cfg2 = _flagship_cfg(synthetic_dataset, tmp_path, num_epochs=2,
                         resume="auto")
    cps.train(cfg2, max_steps_per_epoch=2)
    out2 = capsys.readouterr().out
    assert "auto-resume:" in out2 and "last.ckpt" in out2
    assert "[Epoch1]" in out2 and "[Epoch0]" not in out2  # continues, not restarts
