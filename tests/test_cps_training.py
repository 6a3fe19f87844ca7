"""CPS fused train step + init phase tests (reference
train_vqreptunet1x1v2.py semantics, SURVEY.md §3.1)."""
import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from vq_seg_tpu.losses import make_loss
from vq_seg_tpu.models.networks import make_model
from vq_seg_tpu.training.cps import (
    cps_init_phase,
    create_cps_state,
    make_cps_train_step,
)


@pytest.fixture(scope="module")
def cps_setup():
    model = make_model({"name": "vqreptunet1x1v2", "params": {
        "encoder_name": "resnet18", "num_classes": 3,
        "vq_cfg": {"num_embeddings": [0, 0, 8, 8, 8], "distance": "euclidean",
                   "kmeans_init": True},
        "margin": 0.5, "scale": 30.0,
    }})
    tx = optax.adam(1e-3)
    dice = make_loss("dice_loss", 3, ignore_index=255)
    rng = np.random.default_rng(0)
    l_img = jnp.asarray(rng.uniform(size=(2, 32, 32, 3)).astype(np.float32))
    l_target = jnp.asarray(rng.integers(0, 3, size=(2, 32, 32)).astype(np.int32))
    ul_img = jnp.asarray(rng.uniform(size=(2, 32, 32, 3)).astype(np.float32))
    state = create_cps_state(model, tx, (l_img, l_target, 0.7))
    state = cps_init_phase(model, state, l_img, l_target, 0.7)
    step = make_cps_train_step(model, tx, dice, num_classes=3,
                               confidence_threshold=0.7,
                               cps_loss_weight=1.0, commitment_loss_weight=1.0,
                               prototype_loss_weight=0.01)
    return model, state, step, (l_img, l_target, ul_img)


@pytest.fixture(scope="module")
def stacked_setup(cps_setup):
    """Stacked-state companion to cps_setup: the same tx/dice objects and ONE
    shared stacked-step jit object, so the two stacked-step tests compile it
    once (VERDICT r2 weak #5)."""
    from vq_seg_tpu.training.cps import (
        make_cps_train_step_stacked,
        stack_cps_state,
    )

    model, state, _, _ = cps_setup
    tx = optax.adam(1e-3)
    dice = make_loss("dice_loss", 3, ignore_index=255)
    stacked = stack_cps_state(_fresh(state), tx)
    sstep = make_cps_train_step_stacked(model, tx, dice, num_classes=3,
                                        confidence_threshold=0.7)
    return tx, dice, stacked, sstep


def _fresh(state):
    # the train step donates its input state; copy so tests stay independent
    return jax.tree_util.tree_map(jnp.copy, state)


def test_init_phase_sets_codebooks(cps_setup):
    model, state, step, _ = cps_setup
    cb = state.variables_1["codebook"]
    leaves = jax.tree_util.tree_leaves(cb)
    assert leaves and all(np.isfinite(np.asarray(l)).all() for l in leaves)
    # the two models are decorrelated: at least one param leaf must differ
    # (BN scales are 1-initialised in both, so check across all leaves)
    l1 = jax.tree_util.tree_leaves(state.variables_1["params"])
    l2 = jax.tree_util.tree_leaves(state.variables_2["params"])
    assert any(not np.allclose(np.asarray(a), np.asarray(b))
               for a, b in zip(l1, l2))


def test_train_step_updates_and_metrics(cps_setup):
    model, state, step, (l_img, l_target, ul_img) = cps_setup
    state = _fresh(state)
    p_before = np.asarray(jax.tree_util.tree_leaves(state.variables_1["params"])[0])
    state2, metrics, pred_sup, pred_ul = step(state, l_img, l_target, ul_img)
    assert np.isfinite(float(metrics["loss"]))
    assert 0.0 <= float(metrics["miou"]) <= 1.0
    assert pred_sup.shape == (2, 32, 32, 3)
    assert metrics["code_usage"].shape == (3,)
    p_after = np.asarray(jax.tree_util.tree_leaves(state2.variables_1["params"])[0])
    assert not np.allclose(p_before, p_after)
    assert int(state2.step) == int(state2.step)  # device scalar fetch works

    # the supervised component must come down on a fixed batch (total loss
    # includes the scale-30 prototype term, which wobbles early)
    sup = [float(metrics["sup_loss_1"])]
    for _ in range(5):
        state2, metrics, _, _ = step(state2, l_img, l_target, ul_img)
        sup.append(float(metrics["sup_loss_1"]))
    assert min(sup[1:]) < sup[0]


def test_codebook_frozen_through_training(cps_setup):
    model, state, step, (l_img, l_target, ul_img) = cps_setup
    state = _fresh(state)
    cb_before = np.asarray(jax.tree_util.tree_leaves(state.variables_1["codebook"])[0])
    state2, *_ = step(state, l_img, l_target, ul_img)
    cb_after = np.asarray(jax.tree_util.tree_leaves(state2.variables_1["codebook"])[0])
    # reference parity: euclidean codebook receives no gradient/EMA update
    # (SURVEY.md §2.1 critical behavioural facts)
    assert np.array_equal(cb_before, cb_after)


def test_fused_step_matches_stacked(cps_setup, stacked_setup):
    """The fused-pass step (sup+unsup trunks in one (model x pass)-vmapped
    forward, prototype loss applied outside) must reproduce the stacked
    step's losses, updated params, AND composed BN running stats
    (training/cps.py::make_cps_train_step_fused)."""
    from vq_seg_tpu.training.cps import make_cps_train_step_fused

    model, state, step, (l_img, l_target, ul_img) = cps_setup
    tx, dice, stacked, sstep = stacked_setup
    fresh = lambda: jax.tree_util.tree_map(jnp.copy, stacked)  # noqa: E731

    fstep = make_cps_train_step_fused(model, tx, dice, num_classes=3,
                                      confidence_threshold=0.7,
                                      proto_margin=0.5, proto_scale=30.0)
    s_new, m_s, _, _ = sstep(fresh(), l_img, l_target, ul_img)
    f_new, m_f, _, _ = fstep(fresh(), l_img, l_target, ul_img)
    for k in ("loss", "cps_loss", "sup_loss_1", "sup_loss_2",
              "commitment_loss", "prototype_loss", "miou"):
        a, b = float(m_s[k]), float(m_f[k])
        assert abs(a - b) <= 5e-3 * max(abs(a), 1e-3), (k, a, b)
    for pa, pb in zip(jax.tree_util.tree_leaves(s_new.variables_1["params"]),
                      jax.tree_util.tree_leaves(f_new.variables_1["params"])):
        np.testing.assert_allclose(np.asarray(pa), np.asarray(pb), atol=3e-3)
    # composed running stats == sequential running stats
    for sa, sb in zip(jax.tree_util.tree_leaves(s_new.variables_1["batch_stats"]),
                      jax.tree_util.tree_leaves(f_new.variables_1["batch_stats"])):
        np.testing.assert_allclose(np.asarray(sa), np.asarray(sb),
                                   atol=1e-4, rtol=1e-3)


def test_stacked_step_matches_unstacked(cps_setup, stacked_setup):
    """The vmapped two-models-as-one-batch step must reproduce the reference
    (unstacked) loss math exactly (training/cps.py::make_cps_train_step_stacked)."""
    from vq_seg_tpu.training.cps import unstack_cps_state

    model, state, step, (l_img, l_target, ul_img) = cps_setup
    _, m1, _, _ = step(_fresh(state), l_img, l_target, ul_img)

    _, _, stacked, sstep = stacked_setup
    new_stacked, m2, _, _ = sstep(
        jax.tree_util.tree_map(jnp.copy, stacked), l_img, l_target, ul_img)
    for k in ("loss", "cps_loss", "sup_loss_1", "sup_loss_2",
              "commitment_loss", "prototype_loss", "miou"):
        a, b = float(m1[k]), float(m2[k])
        # vmap batches the convs differently (accumulation order changes);
        # the scale-30 exponentials amplify that to ~0.1% on the loss
        assert abs(a - b) <= 5e-3 * max(abs(a), 1e-3), (k, a, b)
    v1, v2 = unstack_cps_state(new_stacked)
    assert jax.tree_util.tree_structure(v1) == jax.tree_util.tree_structure(
        state.variables_1)


def test_scan_steps_driver_matches_unscanned(synthetic_dataset, tmp_path):
    """cfg.train.scan_steps batches K optimizer steps into one dispatch;
    the trained parameters must match the per-step driver exactly (same
    data order, same numerics)."""
    from vq_seg_tpu.config import Config
    from vq_seg_tpu.training import cps

    def run(scan_steps, out):
        cfg = Config({
            "project_name": "scan_test", "wandb_logging": False, "num_classes": 3,
            "pixel_to_label": {"0": 0, "128": 1, "255": 2}, "resize": 32,
            "model": {"name": "vqreptunet1x1v2", "params": {
                "encoder_name": "resnet18", "num_classes": 3,
                "vq_cfg": {"num_embeddings": [0, 0, 4, 4, 4],
                           "distance": "euclidean", "kmeans_init": True},
                "margin": 0.5, "scale": 30.0}},
            "train": {"data_dir": synthetic_dataset, "save_dir": None,
                      "num_epochs": 1, "batch_size": 1, "learning_rate": 1e-4,
                      "lr_scheduler": {"name": "cosineannealing", "min_lr": 1e-7,
                                       "warmup_steps": 0},
                      "half": False, "criterion": {"name": "dice_loss"},
                      "cps_loss_weight": 1, "total_commitment_loss_weight": 1,
                      "total_prototype_loss_weight": 0.01,
                      "confidence_threshold": 0.7, "save_img": False,
                      "save_txt": False, "scan_steps": scan_steps},
        })
        return cps.train(cfg, max_steps_per_epoch=3)

    plain = run(0, "a")
    scanned = run(2, "b")  # 2-step scan + 1-step tail flush
    assert int(plain.step) == int(scanned.step) == 3
    # fp-only tolerance: scan changes reduction order; Adam can amplify a
    # ~1e-12 gradient delta into ~lr-scale param noise on isolated elements
    for pa, pb in zip(jax.tree_util.tree_leaves(plain.variables_1["params"]),
                      jax.tree_util.tree_leaves(scanned.variables_1["params"])):
        np.testing.assert_allclose(np.asarray(pa), np.asarray(pb), atol=3e-4)


def test_fused_step_rejects_ema_codebooks():
    """vq_cfg.ema=true + the fused step would silently freeze the codebook
    (the fused trunk keeps 'codebook' non-mutable), so construction must
    raise instead (VERDICT r3 weak #3)."""
    from vq_seg_tpu.training.cps import make_cps_train_step_fused

    ema_model = make_model({"name": "vqreptunet1x1v2", "params": {
        "encoder_name": "resnet18", "num_classes": 3,
        "vq_cfg": {"num_embeddings": [0, 0, 8, 8, 8], "distance": "euclidean",
                   "kmeans_init": True, "ema": True},
        "margin": 0.5, "scale": 30.0,
    }})
    tx = optax.adam(1e-3)
    dice = make_loss("dice_loss", 3, ignore_index=255)
    with pytest.raises(ValueError, match="EMA"):
        make_cps_train_step_fused(ema_model, tx, dice, num_classes=3,
                                  confidence_threshold=0.7,
                                  proto_margin=0.5, proto_scale=30.0)


@pytest.mark.slow
def test_fused_step_config_knob_through_train(tmp_path, synthetic_dataset):
    """cfg.train.fused_step=True routes cps.train through
    make_cps_train_step_fused (round-5 composition A/B: fused wins at small
    batch).  Two epochs must run and produce finite losses."""
    from vq_seg_tpu.config import Config
    from vq_seg_tpu.training import cps

    cfg = Config({
        "project_name": "fused_knob", "wandb_logging": False,
        "num_classes": 3, "pixel_to_label": {"0": 0, "128": 1, "255": 2},
        "resize": 32,
        "model": {"name": "vqreptunet1x1v2", "params": {
            "encoder_name": "resnet18", "num_classes": 3, "depth": 5,
            "vq_cfg": {"num_embeddings": [0, 0, 4, 4, 4],
                       "distance": "euclidean", "kmeans_init": True},
            "margin": 0.5, "scale": 30.0}},
        "train": {"data_dir": synthetic_dataset,
                  "save_dir": str(tmp_path / "runs"),
                  "num_epochs": 2, "batch_size": 2, "learning_rate": 1e-4,
                  "lr_scheduler": {"name": "cosineannealing", "min_lr": 1e-7,
                                   "warmup_steps": 0},
                  "half": False, "init_weights": True,
                  "bn_eps": 1e-5, "bn_momentum": 0.1,
                  "criterion": {"name": "dice_loss"}, "cps_loss_weight": 1,
                  "total_commitment_loss_weight": 1,
                  "total_prototype_loss_weight": 0.01,
                  "confidence_threshold": 0.7, "resume": None,
                  "save_img": False, "save_txt": False, "fused_step": True},
        "test": {"data_dir": synthetic_dataset,
                 "save_dir": str(tmp_path / "t"), "batch_size": 1,
                 "weights": None},
    })
    state = cps.train(cfg)
    assert state is not None
