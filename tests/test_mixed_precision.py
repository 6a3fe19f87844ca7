"""bf16 compute-dtype policy tests (the reference's AMP equivalent)."""
import jax
import jax.numpy as jnp
import numpy as np
import optax

from vq_seg_tpu.models.layers import ConvPad, compute_dtype, current_compute_dtype
from vq_seg_tpu.models.networks import make_model


def test_compute_dtype_context():
    assert current_compute_dtype() is None
    with compute_dtype(jnp.bfloat16):
        assert current_compute_dtype() == jnp.bfloat16
    assert current_compute_dtype() is None


def test_conv_emits_bf16_params_stay_f32():
    x = jnp.ones((1, 8, 8, 4))
    with compute_dtype(jnp.bfloat16):
        conv = ConvPad(8, 3, 1, 1)
        v = conv.init(jax.random.PRNGKey(0), x)
        y = conv.apply(v, x)
    assert y.dtype == jnp.bfloat16
    assert jax.tree_util.tree_leaves(v)[0].dtype == jnp.float32


def test_flagship_bf16_step_close_to_f32():
    from vq_seg_tpu.losses import make_loss
    from vq_seg_tpu.training.cps import (
        cps_init_phase,
        create_cps_state,
        make_cps_train_step,
    )

    model = make_model({"name": "vqreptunet1x1v2", "params": {
        "encoder_name": "resnet18", "num_classes": 3,
        "vq_cfg": {"num_embeddings": [0, 0, 8, 8, 8], "distance": "euclidean",
                   "kmeans_init": True},
        "margin": 0.5, "scale": 30.0}})
    tx = optax.adam(1e-3)
    dice = make_loss("dice_loss", 3, ignore_index=255)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(size=(2, 32, 32, 3)).astype(np.float32))
    gt = jnp.asarray(rng.integers(0, 3, size=(2, 32, 32)).astype(np.int32))

    losses = {}
    for half in (False, True):
        ctx = compute_dtype(jnp.bfloat16) if half else compute_dtype(None)
        with ctx:
            state = create_cps_state(model, tx, (x, gt, 0.7))
            state = cps_init_phase(model, state, x, gt, 0.7)
            step = make_cps_train_step(model, tx, dice, num_classes=3,
                                       confidence_threshold=0.7, remat=not half)
            _, m, _, _ = step(state, x, gt, x)
            losses[half] = float(m["loss"])
    assert np.isfinite(losses[True])
    # bf16 and f32 losses agree to a few percent on a fresh model
    assert abs(losses[True] - losses[False]) / abs(losses[False]) < 0.1
