"""Config-zoo coverage: every reference experiment config has a shipped,
runnable counterpart (reference /root/reference/config/*.json — 40 active
files spanning CWFID/IJRR2017/rice_s_n_w x percent splits x network
variants; translated by tools/translate_configs.py).

Fast tier: every shipped config parses, carries a valid trainer mode, and
its model CONSTRUCTS from the registry (unknown model params raise at
construction).  Slow tier (-m slow): the full matrix — for every config,
1 real train step through its mapped trainer driver + 1 eval forward on the
synthetic set (inputs shrunk to 32^2 / VQ K=4 for tractability; model
family, encoder, head, loss wiring all exercised as configured)."""
import glob
import json
import os
import shutil

import numpy as np
import pytest

CONFIG_DIR = os.path.join(os.path.dirname(__file__), "..", "config")
CONFIGS = sorted(glob.glob(os.path.join(CONFIG_DIR, "*.json")))
STEMS = [os.path.splitext(os.path.basename(p))[0] for p in CONFIGS]

MODES = {"cps", "sup", "selfsup", "plaincps", "unimatch", "salientcps",
         "vqpt", "reptcps", "angularv3", "easyhard", "objcps", "supconcps",
         "semiweed"}

REF_CONFIG_DIR = "/root/reference/config"


def test_config_zoo_complete():
    """ls config/*.json covers every active reference config by name."""
    if not os.path.isdir(REF_CONFIG_DIR):
        pytest.skip("reference tree not present")
    ref = {os.path.splitext(f)[0] for f in os.listdir(REF_CONFIG_DIR)
           if f.endswith(".json")}
    assert ref <= set(STEMS), f"missing translations: {sorted(ref - set(STEMS))}"
    assert len(ref) == 40


@pytest.mark.parametrize("path", CONFIGS, ids=STEMS)
def test_config_parses_and_model_builds(path):
    from vq_seg_tpu.config import get_config_from_json
    from vq_seg_tpu.models.networks import make_model, network_dict

    cfg = get_config_from_json(path)
    assert cfg.get("mode") in MODES, cfg.get("mode")
    model = make_model(cfg.model)  # unexpected params raise here
    assert model is not None
    assert cfg.model.name in network_dict  # registry populated by make_model
    assert isinstance(dict(cfg.train.criterion), dict)


def _shrunk_cfg(path, synthetic_dataset, tmp_path):
    """The shipped config with only the knobs that make a CI run tractable
    overridden: tiny inputs, 1 epoch, synthetic data, no wandb/pretrained."""
    from vq_seg_tpu.config import get_config_from_json

    cfg = get_config_from_json(path)
    cfg["resize"] = 32
    cfg["wandb_logging"] = False
    t = cfg["train"]
    t["data_dir"] = synthetic_dataset
    t["save_dir"] = str(tmp_path / "runs")
    t["num_epochs"] = 1
    t["batch_size"] = 2
    t["half"] = False
    t["save_img"] = False
    t["save_as_tar"] = False
    t["resume"] = None
    t.pop("scan_steps", None)
    t.pop("test_every", None)
    if cfg["model"]["name"] == "semiweednet":
        t["overlap_size"] = 12  # reference default 240 assumes 448^2 inputs
    p = cfg["model"]["params"]
    ne = p.get("vq_cfg", {}).get("num_embeddings")
    if isinstance(ne, list):
        p["vq_cfg"]["num_embeddings"] = [0 if int(k) == 0 else 4 for k in ne]
    elif ne is not None:
        p["vq_cfg"]["num_embeddings"] = 4
    p.pop("encoder_weights", None)  # no pretrained weight files in CI
    if cfg.get("test"):
        cfg["test"]["data_dir"] = synthetic_dataset
        cfg["test"]["save_dir"] = str(tmp_path / "test_out")
    return cfg


def _ensure_obia_dir(synthetic_dataset):
    obia_dir = os.path.join(synthetic_dataset, "train", "obia")
    if os.path.isdir(obia_dir):
        return
    os.makedirs(obia_dir)
    tgt_dir = os.path.join(synthetic_dataset, "train", "target")
    input_dir = os.path.join(synthetic_dataset, "train", "input")
    labelled = set(os.listdir(tgt_dir))
    src = os.path.join(tgt_dir, sorted(labelled)[0])
    for f in sorted(set(os.listdir(input_dir)) - labelled)[:2]:
        shutil.copy(src, os.path.join(obia_dir, f))


def _run_one_step(cfg):
    mode = cfg["mode"]
    if mode == "cps":
        from vq_seg_tpu.training import cps

        return cps.train(cfg, max_steps_per_epoch=1)
    if mode == "sup":
        from vq_seg_tpu.training import supervised

        return supervised.train(cfg, max_steps_per_epoch=1)
    if mode == "selfsup":
        from vq_seg_tpu.training import selfsup

        return selfsup.train(cfg, max_steps_per_epoch=1)
    from vq_seg_tpu.training import variant_drivers as vd

    fn = {"plaincps": vd.train_plain_cps, "unimatch": vd.train_unimatch,
          "salientcps": vd.train_salient_cps, "vqpt": vd.train_vqpt_cps,
          "reptcps": vd.train_rept_cps, "angularv3": vd.train_angularv3_cps,
          "easyhard": vd.train_easyhard_cps, "objcps": vd.train_obj_cps,
          "supconcps": vd.train_supcon_cps, "semiweed": vd.train_semiweed}[mode]
    return fn(cfg, max_steps_per_epoch=1)


@pytest.mark.slow
@pytest.mark.parametrize("path", CONFIGS, ids=STEMS)
def test_config_zoo_matrix(path, synthetic_dataset, tmp_path):
    """1 train step through the config's mapped trainer + 1 eval forward."""
    import jax.numpy as jnp

    from vq_seg_tpu.models.networks import make_model
    from vq_seg_tpu.training.cps import CPSTrainState, unstack_cps_state

    cfg = _shrunk_cfg(path, synthetic_dataset, tmp_path)
    if cfg["train"].get("dataset") == "obia":
        _ensure_obia_dir(synthetic_dataset)
    state = _run_one_step(cfg)
    assert state is not None

    if isinstance(state, CPSTrainState):
        variables = (unstack_cps_state(state)[0] if state.variables_2 is None
                     else state.variables_1)
    else:
        variables = state.variables
    model = make_model(cfg.model)
    out = model.apply(variables, jnp.zeros((1, 32, 32, 3)), train=False)
    pred = out[0] if isinstance(out, tuple) else out
    assert np.all(np.isfinite(np.asarray(pred, dtype=np.float32)))
