"""Tests for trainer variants (plain CPS, UniMatch), the sweep driver,
multi-LR transform, and re-init helper."""
import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from vq_seg_tpu.models.networks import make_model
from vq_seg_tpu.training.cps import create_cps_state
from vq_seg_tpu.training.supervised import create_state
from vq_seg_tpu.training.variants import (
    make_plain_cps_train_step,
    make_unimatch_train_step,
)
from vq_seg_tpu.training.sweep import sweep
from vq_seg_tpu.utils.train_tools import multi_lr_tx, reinit_modules


def test_plain_cps_step():
    model = make_model({"name": "unet", "params": {
        "encoder_name": "resnet18", "num_classes": 3}})
    tx = optax.adam(1e-3)
    rng = np.random.default_rng(0)
    l_img = jnp.asarray(rng.uniform(size=(2, 32, 32, 3)).astype(np.float32))
    l_target = jnp.asarray(rng.integers(0, 3, size=(2, 32, 32)).astype(np.int32))
    state = create_cps_state(model, tx, (l_img,))
    step = make_plain_cps_train_step(model, tx, num_classes=3)
    state2, metrics = step(state, l_img, l_target, l_img)
    assert np.isfinite(float(metrics["loss"]))
    assert float(metrics["cps_loss"]) >= 0


@pytest.mark.slow
def test_unimatch_step():
    model = make_model({"name": "unimatch", "params": {
        "encoder_name": "resnet18", "num_classes": 3}})
    tx = optax.adam(1e-3)
    rng = np.random.default_rng(0)
    l_img = jnp.asarray(rng.uniform(size=(2, 32, 32, 3)).astype(np.float32))
    l_target = jnp.asarray(rng.integers(0, 3, size=(2, 32, 32)).astype(np.int32))
    state = create_state(model, tx, (l_img,))
    step = make_unimatch_train_step(model, tx, num_classes=3)
    state2, metrics = step(state, l_img, l_target, l_img, jax.random.PRNGKey(0))
    assert np.isfinite(float(metrics["loss"]))


def test_sweep_finds_better_params():
    cfg = {"train": {"learning_rate": 1.0, "total_commitment_loss_weight": 1.0,
                     "total_prototype_loss_weight": 1.0, "cps_loss_weight": 1.0}}

    def objective(c):
        # peak at lr=1e-4: a smooth bump
        import math

        return -abs(math.log10(c["train"]["learning_rate"]) + 4)

    best, val, hist = sweep(cfg, objective, n_trials=12, seed=0)
    assert len(hist) == 12
    assert abs(np.log10(best["train.learning_rate"]) + 4) < 1.5


def test_multi_lr_tx_scales_encoder():
    params = {"encoder": {"conv": {"kernel": jnp.ones((4,))}},
              "decoder": {"conv": {"kernel": jnp.ones((4,))}}}
    tx = multi_lr_tx(1.0, decoder_lr_times=10.0)
    state = tx.init(params)
    grads = jax.tree_util.tree_map(jnp.ones_like, params)
    updates, _ = tx.update(grads, state, params)
    enc = float(updates["encoder"]["conv"]["kernel"][0])
    dec = float(updates["decoder"]["conv"]["kernel"][0])
    assert abs(enc) < abs(dec)  # encoder moves 10x slower


def test_reinit_modules_changes_convs_only():
    key = jax.random.PRNGKey(0)
    params = {"head": {"conv": {"kernel": jnp.zeros((3, 3, 4, 4)), "bias": jnp.ones((4,))},
                       "bn": {"scale": jnp.ones((4,)), "bias": jnp.ones((4,))}},
              "enc": {"conv": {"kernel": jnp.zeros((3, 3, 4, 4))}}}
    out = reinit_modules(params, key, [("head",)])
    assert not np.allclose(np.asarray(out["head"]["conv"]["kernel"]), 0)
    assert np.allclose(np.asarray(out["head"]["conv"]["bias"]), 0)  # biases zeroed
    assert np.allclose(np.asarray(out["head"]["bn"]["scale"]), 1)  # BN untouched
    assert np.allclose(np.asarray(out["enc"]["conv"]["kernel"]), 0)  # other paths untouched
