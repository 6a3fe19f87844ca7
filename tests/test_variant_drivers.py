"""Smoke tests for the variant trainer DRIVERS (VERDICT #5: the jitted
steps existed but were unreachable as runnable programs)."""
import os

import numpy as np
import pytest

# each driver test runs a real (shrunk) e2e training loop — 1-2 min apiece
# on this host; the default fast run covers the same modes at unit level
# (tests/test_variants_and_tools.py), the full run adds these with --runslow
pytestmark = pytest.mark.slow

from vq_seg_tpu.config import Config


def _base_cfg(synthetic_dataset, tmp_path, model, extra_train=None):
    train = {
        "data_dir": synthetic_dataset, "save_dir": str(tmp_path / "runs"),
        "num_epochs": 1, "batch_size": 1, "learning_rate": 1e-4,
        "lr_scheduler": {"name": "cosineannealing", "min_lr": 1e-7,
                         "warmup_steps": 0},
        "half": False, "criterion": {"name": "dice_loss"},
        "cps_loss_weight": 1, "total_commitment_loss_weight": 1,
        "total_prototype_loss_weight": 0.01, "confidence_threshold": 0.7,
        "save_img": False, "save_txt": True,
    }
    train.update(extra_train or {})
    return Config({
        "project_name": "variant_test", "wandb_logging": False,
        "num_classes": 3, "pixel_to_label": {"0": 0, "128": 1, "255": 2},
        "resize": 32, "model": model, "train": train,
    })


def _vq_model(name, **extra):
    params = {"encoder_name": "resnet18", "num_classes": 3,
              "vq_cfg": {"num_embeddings": [0, 0, 4, 4, 4],
                         "distance": "euclidean", "kmeans_init": True}}
    params.update(extra)
    return {"name": name, "params": params}


def _assert_run_saved(tmp_path):
    runs = os.listdir(str(tmp_path / "runs"))
    assert len(runs) == 1
    ck = os.path.join(str(tmp_path / "runs"), runs[0], "ckpoints", "last.ckpt")
    assert os.path.isdir(ck)
    return ck


def test_plain_cps_driver(synthetic_dataset, tmp_path):
    from vq_seg_tpu.training.variant_drivers import train_plain_cps

    cfg = _base_cfg(synthetic_dataset, tmp_path, _vq_model("vqunet_v2"))
    state = train_plain_cps(cfg, max_steps_per_epoch=1)
    assert np.isfinite(float(np.asarray(
        jax_leaves_first(state.variables_1["params"]))))
    _assert_run_saved(tmp_path)


def test_unimatch_driver(synthetic_dataset, tmp_path):
    from vq_seg_tpu.training.variant_drivers import train_unimatch

    cfg = _base_cfg(synthetic_dataset, tmp_path,
                    {"name": "unimatch", "params": {
                        "encoder_name": "resnet18", "num_classes": 3}},
                    extra_train={"confidence_threshold": 0.95})
    state = train_unimatch(cfg, max_steps_per_epoch=1)
    assert state is not None
    _assert_run_saved(tmp_path)


def test_salient_cps_driver(synthetic_dataset, tmp_path):
    from PIL import Image

    from vq_seg_tpu.training.variant_drivers import train_salient_cps

    # precomputed saliency maps for every training input
    sal_dir = tmp_path / "salient"
    sal_dir.mkdir()
    rng = np.random.default_rng(0)
    for f in os.listdir(os.path.join(synthetic_dataset, "train", "input")):
        m = rng.integers(0, 256, (40, 40), dtype=np.uint8)
        Image.fromarray(m, mode="L").save(sal_dir / f)

    cfg = _base_cfg(synthetic_dataset, tmp_path,
                    _vq_model("VQUnetwithSalientloss"),
                    extra_train={"salient_dir": str(sal_dir),
                                 "auxiliary_loss_weight": 1.0})
    state = train_salient_cps(cfg, max_steps_per_epoch=1)
    assert state is not None
    _assert_run_saved(tmp_path)


def test_vqpt_driver_with_selfsup_pretrain_flow(synthetic_dataset, tmp_path):
    """The full vq_pt_unet.json flow: selfsup VQ-VAE pretrain -> frozen
    pretrained encoder + codebook -> vqptunet CPS (VERDICT #5 done gate)."""
    import jax

    from vq_seg_tpu.training import selfsup
    from vq_seg_tpu.training.variant_drivers import train_vqpt_cps

    # 1) selfsup pretraining writes encoder/codebook/decoder checkpoints
    vqvae_model = _vq_model("vqvaev2")
    del vqvae_model["params"]["num_classes"]  # vqvaev2 is a recon net
    selfsup_cfg = Config({
        "project_name": "selfsup_test", "wandb_logging": False,
        "num_classes": 3, "pixel_to_label": {"0": 0, "128": 1, "255": 2},
        "resize": 32,
        "model": vqvae_model,
        "train": {"data_dir": os.path.join(synthetic_dataset, "train", "input"),
                  "save_dir": str(tmp_path / "selfsup"), "num_epochs": 1,
                  "batch_size": 2, "learning_rate": 1e-4,
                  "lr_scheduler": {"name": "cosineannealing", "min_lr": 1e-7,
                                   "warmup_steps": 0},
                  "half": False},
    })
    selfsup.train(selfsup_cfg, max_steps_per_epoch=1)
    ckpt_dir = os.path.join(str(tmp_path / "selfsup"), "selfsup_ckpoints")
    enc_ck = os.path.join(ckpt_dir, "0ep_encoder.ckpt")
    cb_ck = os.path.join(ckpt_dir, "0ep_codebook.ckpt")
    assert os.path.isdir(enc_ck) and os.path.isdir(cb_ck)

    # 2) CPS with the pretrained frozen encoder
    cfg = _base_cfg(synthetic_dataset, tmp_path,
                    _vq_model("vqptunet", margin=0.5, scale=30.0),
                    extra_train={"pretrained": {"encoder": enc_ck,
                                                "codebook": cb_ck}})
    state = train_vqpt_cps(cfg, max_steps_per_epoch=1)
    _assert_run_saved(tmp_path)

    # frozen encoder: params unchanged after the step
    from vq_seg_tpu.utils.ckpoints import _load_tree

    enc_saved = _load_tree(enc_ck)
    enc_now = state.variables_1["params"]["core"]["encoder"]
    for a, b in zip(jax.tree_util.tree_leaves(enc_saved["params"]),
                    jax.tree_util.tree_leaves(enc_now)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_angularv3_driver(synthetic_dataset, tmp_path):
    from vq_seg_tpu.training.variant_drivers import train_angularv3_cps

    cfg = _base_cfg(synthetic_dataset, tmp_path,
                    _vq_model("vqreptunetangularv3", margin=0.5, scale=30.0))
    state = train_angularv3_cps(cfg, max_steps_per_epoch=1)
    assert state is not None
    _assert_run_saved(tmp_path)


def test_easyhard_driver(synthetic_dataset, tmp_path):
    from vq_seg_tpu.training.variant_drivers import train_easyhard_cps

    cfg = _base_cfg(synthetic_dataset, tmp_path,
                    _vq_model("vqptunet", margin=0.5, scale=30.0),
                    extra_train={"cutmix_ratio": 0.5})
    state = train_easyhard_cps(cfg, max_steps_per_epoch=2)
    assert state is not None
    _assert_run_saved(tmp_path)


def jax_leaves_first(tree):
    import jax

    return np.asarray(jax.tree_util.tree_leaves(tree)[0]).ravel()[0]


def test_objcps_driver(synthetic_dataset, tmp_path):
    from vq_seg_tpu.training.variant_drivers import train_obj_cps

    cfg = _base_cfg(synthetic_dataset, tmp_path, _vq_model("vqunet_v2"),
                    extra_train={"obj_loss_weight": 1.0,
                                 "criterion": {"name": "dice_loss"}})
    state = train_obj_cps(cfg, max_steps_per_epoch=1)
    assert state is not None
    _assert_run_saved(tmp_path)


def test_plaincps_code_usage_loss(synthetic_dataset, tmp_path):
    """deprecated/code_usage_train.py mode: the usage term shifts the loss."""
    from vq_seg_tpu.training.variant_drivers import train_plain_cps

    cfg = _base_cfg(synthetic_dataset, tmp_path, _vq_model("vqunet_v2"),
                    extra_train={"code_usage_loss_weight": 1.0})
    cfg["train"]["save_dir"] = None
    state = train_plain_cps(cfg, max_steps_per_epoch=1)
    assert state is not None


def test_supcon_cps_driver(synthetic_dataset, tmp_path):
    from vq_seg_tpu.training.variant_drivers import train_supcon_cps

    cfg = _base_cfg(synthetic_dataset, tmp_path, _vq_model("supconvqunet"),
                    extra_train={"total_sup_con_loss_weight": 1.0,
                                 "batch_size": 2})
    state = train_supcon_cps(cfg, max_steps_per_epoch=1)
    assert state is not None
    _assert_run_saved(tmp_path)


def test_semiweed_driver(synthetic_dataset, tmp_path):
    from vq_seg_tpu.training.variant_drivers import train_semiweed

    cfg = _base_cfg(synthetic_dataset, tmp_path,
                    {"name": "semiweednet", "params": {
                        "encoder_name": "resnet18", "num_classes": 3}},
                    extra_train={"overlap_size": 12, "ce_loss_weight": 1.0,
                                 "dc_loss_weight": 1.0,
                                 "criterion": {"name": "cross_entropy"}})
    state = train_semiweed(cfg, max_steps_per_epoch=1)
    assert state is not None
    _assert_run_saved(tmp_path)


def test_sup_driver_obia_and_normalized_datasets(synthetic_dataset, tmp_path):
    """cfg.train.dataset selects OBIA / normalized variants in the sup
    driver (deprecated/train_obia.py, train_IJRR_with_normalized.py)."""
    import shutil

    from vq_seg_tpu.training import supervised

    # OBIA layout: an obia/ dir with pseudo-targets for unlabeled images
    obia_dir = os.path.join(synthetic_dataset, "train", "obia")
    if not os.path.isdir(obia_dir):
        os.makedirs(obia_dir)
        tgt_dir = os.path.join(synthetic_dataset, "train", "target")
        input_dir = os.path.join(synthetic_dataset, "train", "input")
        labelled = set(os.listdir(tgt_dir))
        src = os.path.join(tgt_dir, sorted(labelled)[0])
        for f in sorted(set(os.listdir(input_dir)) - labelled)[:2]:
            shutil.copy(src, os.path.join(obia_dir, f))

    for kind in ("obia", "normalized"):
        cfg = _base_cfg(synthetic_dataset, tmp_path / kind,
                        {"name": "unet", "params": {
                            "encoder_name": "resnet18", "num_classes": 3}},
                        extra_train={"dataset": kind})
        cfg["train"]["save_dir"] = None
        state = supervised.train(cfg, max_steps_per_epoch=1)
        assert state is not None


def test_variant_driver_under_mesh(synthetic_dataset, tmp_path):
    """VERDICT r2 #5b: the variant drivers take a mesh — run one E2E with
    batches sharded over a 2-device data axis and assert a finite state
    plus the reference run layout."""
    import jax

    from vq_seg_tpu.parallel import make_mesh
    from vq_seg_tpu.training.variant_drivers import train_plain_cps

    mesh = make_mesh(n_data=2, n_model=1, devices=jax.devices()[:2])
    cfg = _base_cfg(synthetic_dataset, tmp_path, _vq_model("vqunet_v2"),
                    extra_train={"batch_size": 2})
    state = train_plain_cps(cfg, max_steps_per_epoch=1, mesh=mesh)
    assert np.isfinite(float(np.asarray(
        jax_leaves_first(state.variables_1["params"]))))
    _assert_run_saved(tmp_path)
