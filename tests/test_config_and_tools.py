import os
import json

import jax.numpy as jnp
import numpy as np

from vq_seg_tpu.config import Config, load_config
from vq_seg_tpu.training.schedules import cosine_annealing, make_lr_schedule, warmup_poly
from vq_seg_tpu.utils.seg_tools import (
    confidence_filtered_pseudo,
    img_to_label,
    label_to_onehot,
    score_mask,
)


def test_config_attribute_access(tmp_path):
    raw = {
        "project_name": "x",
        "model": {"name": "unet", "params": {"encoder_name": "resnet50", "vq_cfg": {"num_embeddings": [0, 0, 512, 512, 512]}}},
        "train": {"lr_scheduler": {"name": "cosineannealing", "min_lr": 1e-7}},
    }
    p = tmp_path / "c.json"
    p.write_text(json.dumps(raw))
    cfg = load_config(str(p))
    assert cfg.model.params.encoder_name == "resnet50"
    assert cfg.model.params.vq_cfg.num_embeddings == [0, 0, 512, 512, 512]
    assert cfg.train.lr_scheduler.get("warmup_steps", 0) == 0
    cfg.extra = {"a": 1}
    assert isinstance(cfg.extra, Config)
    assert cfg.to_dict()["extra"] == {"a": 1}


def test_img_to_label():
    mask = jnp.asarray(np.array([[0, 128], [255, 128]], dtype=np.uint8))
    out = img_to_label(mask, {"0": 0, "128": 1, "255": 2})
    np.testing.assert_array_equal(np.asarray(out), [[0, 1], [2, 1]])


def test_onehot_and_score_mask(rng):
    t = jnp.asarray(rng.integers(0, 3, (2, 4, 4)))
    oh = label_to_onehot(t, 3)
    assert oh.shape == (2, 4, 4, 3)
    np.testing.assert_allclose(np.asarray(oh.sum(-1)), 1 + 3e-6, rtol=1e-5)

    logits = jnp.asarray(rng.normal(size=(2, 4, 4, 3)).astype(np.float32)) * 10
    m = score_mask(logits, th=0.7)
    assert m.shape == (2, 4, 4, 1)
    pseudo = jnp.argmax(logits, -1)
    filt = confidence_filtered_pseudo(logits, pseudo, th=0.7)
    # low-confidence pixels must be 255
    import jax

    prob = np.asarray(jax.nn.softmax(logits, -1).max(-1))
    np.testing.assert_array_equal(np.asarray(filt)[prob <= 0.7], 255)
    np.testing.assert_array_equal(np.asarray(filt)[prob > 0.7], np.asarray(pseudo)[prob > 0.7])


def test_cosine_annealing_formula():
    sched = cosine_annealing(1e-4, 1e-7, total_iters=1000, warmup_steps=0)
    np.testing.assert_allclose(float(sched(0)), 1e-4, rtol=1e-6)
    want_mid = 1e-7 + 0.5 * (1e-4 - 1e-7) * (1 + np.cos(np.pi * 500 / 1000))
    np.testing.assert_allclose(float(sched(500)), want_mid, rtol=1e-6)
    np.testing.assert_allclose(float(sched(1000)), 1e-7, atol=1e-12)


def test_warmup_poly_formula():
    sched = warmup_poly(0.01, lr_power=0.9, total_iters=100, warmup_steps=10)
    np.testing.assert_allclose(float(sched(5)), 0.01 * 5 / 10, rtol=1e-6)
    np.testing.assert_allclose(float(sched(50)), 0.01 * (1 - 50 / 100) ** 0.9, rtol=1e-5)


def test_make_lr_schedule_from_cfg():
    cfg = Config(
        {
            "num_epochs": 4,
            "learning_rate": 1e-4,
            "lr_scheduler": {"name": "cosineannealing", "min_lr": 1e-7, "warmup_steps": 0},
        }
    )
    sched = make_lr_schedule(cfg, steps_per_epoch=10)
    np.testing.assert_allclose(float(sched(0)), 1e-4, rtol=1e-6)


def test_profiler_trace_writes_artifacts(tmp_path):
    """utils/profiling.trace captures a jax.profiler trace directory (the
    scripts/train.py --trace flag wraps the run in exactly this context)."""
    import jax
    import jax.numpy as jnp

    from vq_seg_tpu.utils.profiling import trace

    with trace(str(tmp_path)):
        jax.jit(lambda x: x * 2)(jnp.ones((8, 8))).block_until_ready()
    found = list((tmp_path).rglob("*.xplane.pb"))
    assert found, f"no trace artifacts under {tmp_path}"


def test_train_cli_exposes_trace_flag():
    import subprocess
    import sys

    r = subprocess.run([sys.executable, "scripts/train.py", "--help"],
                       capture_output=True, text=True, timeout=120,
                       cwd=os.path.dirname(os.path.dirname(__file__)))
    assert r.returncode == 0 and "--trace" in r.stdout


def test_real_data_gate_layout_validation(tmp_path, synthetic_dataset):
    """validate_layout accepts the reference contract and rejects breakage."""
    import pytest

    from tools.real_data_gate import validate_layout

    counts = validate_layout(synthetic_dataset, {"0": 0, "128": 1, "255": 2})
    assert counts["train"]["input"] == 8 and counts["train"]["target"] == 5
    assert counts["test"]["input"] == 3

    # broken layout: missing test targets
    import shutil

    broken = tmp_path / "broken"
    shutil.copytree(synthetic_dataset, broken)
    shutil.rmtree(broken / "test" / "target")
    (broken / "test" / "target").mkdir()
    with pytest.raises(SystemExit, match="layout invalid"):
        validate_layout(str(broken), {"0": 0, "128": 1, "255": 2})


import pytest as _pytest


@_pytest.mark.slow
def test_real_data_gate_smoke(tmp_path, synthetic_dataset):
    """The turnkey gate end-to-end on synthetic data standing in for the real
    layout: shrunk flagship config -> cps.train -> official sweep -> report
    with the +-0.2 parity verdict (VERDICT r4 #5)."""
    import json

    from vq_seg_tpu.config import get_config_from_json
    from tools.real_data_gate import main as gate_main

    repo = os.path.dirname(os.path.dirname(__file__))
    cfg = get_config_from_json(os.path.join(repo, "config", "vqreptunet1x1v2.json"))
    cfg["model"]["params"]["encoder_name"] = "resnet18"
    cfg["model"]["params"]["vq_cfg"]["num_embeddings"] = [0, 0, 8, 8, 8]
    cfg["model"]["params"].pop("encoder_weights", None)
    cfg["train"]["batch_size"] = 2
    cfg["train"]["half"] = False
    cfg["wandb_logging"] = False
    shrunk = tmp_path / "cfg.json"
    shrunk.write_text(json.dumps(dict(cfg)))

    report = gate_main([
        "--data_dir", synthetic_dataset,
        "--config_path", str(shrunk),
        "--epochs", "2", "--resize", "32",
        "--save_dir", str(tmp_path / "gate_out"),
        "--expected_miou", "0.3",
    ])
    assert report["gate"] in ("PASS", "FAIL")
    assert "test_miou" in report
    assert os.path.exists(tmp_path / "gate_out" / "REAL_DATA_GATE.json")
