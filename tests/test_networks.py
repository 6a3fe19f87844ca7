"""Registry network construction + forward smoke tests (tiny shapes).

Covers the reference model zoo surface (models/networks/__init__.py:9-51):
all 38 entries construct; representative architectures run a forward.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vq_seg_tpu.models.networks import _load_all, make_model, network_dict

VQ8 = {"num_embeddings": [0, 0, 8, 8, 8], "distance": "euclidean", "kmeans_init": False}


def test_registry_complete():
    _load_all()
    expected = {
        "unet", "unetoriginal", "vqunet_v1", "vqunet_v2", "vqptunet", "vqeuptunet",
        "vqashunet", "vqashunetv2", "VQUnetwithSalientloss", "vqatunet",
        "vqnedptunet", "supconvqunet", "vqreptunet1x1", "vqreptunetdouble1x1",
        "vqreptunet1x1v2", "vqretemptunet", "vqreeuptunet", "vqreptunet",
        "vqpatchunet", "vqimdbnet", "vqcanet", "vqcanetv2", "vqcanetv3",
        "vqcanetv4", "drsavqunet", "vqreptunetangular", "vqreptunetangularv3",
        "vqonlyptunet1x1", "nopt", "scheme6", "deeplabv3", "deeplabv3plus",
        "unimatch", "semiweednet", "fcn32s", "vqsegheadnet", "vqvaev2", "vqvaev1",
    }
    assert expected <= set(network_dict), expected - set(network_dict)


def _mk(name, **extra):
    params = {"encoder_name": "resnet18", "num_classes": 3, **extra}
    return make_model({"name": name, "params": params})


def test_all_constructible():
    _load_all()
    for name in network_dict:
        if name in ("unet", "unetoriginal", "deeplabv3", "deeplabv3plus", "unimatch",
                    "semiweednet", "fcn32s"):
            m = _mk(name) if name != "unetoriginal" else make_model(
                {"name": name, "params": {"num_classes": 3}})
        elif name in ("vqvaev1", "vqvaev2"):
            m = make_model({"name": name, "params": {"encoder_name": "resnet18",
                                                     "vq_cfg": VQ8}})
        else:
            m = _mk(name, vq_cfg=VQ8)
        assert m is not None


def test_plain_unet_forward():
    m = _mk("unet")
    x = jnp.zeros((1, 32, 32, 3))
    v = m.init({"params": jax.random.PRNGKey(0)}, x)
    out = m.apply(v, x, train=False)
    # decoder works at input/2; the x2 head upsample restores input size
    assert out.shape == (1, 32, 32, 3)


def test_vqunet_v2_forward_contract():
    m = _mk("vqunet_v2", vq_cfg=VQ8)
    x = jnp.zeros((1, 32, 32, 3))
    v = m.init({"params": jax.random.PRNGKey(0)}, x)
    out, commit, usage = m.apply(v, x, train=False)
    assert out.shape == (1, 32, 32, 3)
    assert usage.shape == (3,)  # one per non-identity VQ stage
    # softmax head activation
    assert np.allclose(np.asarray(out).sum(-1), 1.0, atol=1e-4)


def test_vqsegheadnet_forward():
    m = _mk("vqsegheadnet", vq_cfg=VQ8)
    x = jnp.zeros((1, 32, 32, 3))
    v = m.init({"params": jax.random.PRNGKey(0)}, x, train=True)
    score, commit, usage, head_commit, head_usage = m.apply(v, x, train=False)
    assert score.shape == (1, 32, 32, 3)
    assert np.isfinite(float(head_usage))


def test_vqvaev2_reconstruction_shape():
    m = make_model({"name": "vqvaev2",
                    "params": {"encoder_name": "resnet18", "vq_cfg": VQ8}})
    x = jnp.zeros((2, 32, 32, 3))
    v = m.init({"params": jax.random.PRNGKey(0)}, x)
    recon, commit, usage = m.apply(v, x, train=False)
    # stage-1 grid 16x16 -> stride-2 transposed conv -> 32x32
    assert recon.shape == (2, 32, 32, 3)


@pytest.mark.slow
def test_deeplabv3plus_forward():
    m = _mk("deeplabv3plus")
    x = jnp.zeros((1, 32, 32, 3))
    v = m.init({"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
               x, train=False)
    out, aux = m.apply(v, x, train=False)
    assert out.shape == (1, 32, 32, 3)
    assert aux is None


def test_convnext_encoder_forward():
    """ConvNeXt support (broken/config-only in the reference — SURVEY §2.2)."""
    from vq_seg_tpu.models.encoders import make_encoder

    enc, ch = make_encoder("convnext_tiny", depth=4)
    assert ch == (3, 96, 192, 384, 768)
    x = jnp.zeros((1, 64, 64, 3))
    v = enc.init({"params": jax.random.PRNGKey(0)}, x)
    feats = enc.apply(v, x)
    assert [f.shape[1] for f in feats] == [64, 16, 8, 4, 2]


def test_convnext_unet():
    m = make_model({"name": "unet", "params": {
        "encoder_name": "convnext_tiny", "num_classes": 3, "depth": 4,
        "upsampling": 4}})
    x = jnp.zeros((1, 32, 32, 3))
    v = m.init({"params": jax.random.PRNGKey(0)}, x)
    out = m.apply(v, x, train=False)
    assert out.shape == (1, 32, 32, 3)  # stride-4 decoder end, x4 head


def test_subpixel_tail_contract():
    """Tuned-profile decoder tail (modules/decoder.py::UnetDecoder
    subpixel_tail): same output/param-surface contract as the reference
    layout — identical logits shape, trains a CPS step, and the tail block
    runs at half resolution with 4x channels (+9.2% measured at 512^2,
    BASELINE.md round-3 levers)."""
    import optax

    from vq_seg_tpu.losses import make_loss
    from vq_seg_tpu.training.cps import (
        cps_init_phase,
        create_cps_state,
        make_cps_train_step_stacked,
        stack_cps_state,
    )

    base = _mk("vqreptunet1x1v2", vq_cfg=VQ8, margin=0.5, scale=30.0)
    sub = _mk("vqreptunet1x1v2", vq_cfg=VQ8, margin=0.5, scale=30.0,
              subpixel_tail=True)
    x = jnp.zeros((1, 32, 32, 3))
    gt = jnp.zeros((1, 32, 32), jnp.int32)
    vb = base.init({"params": jax.random.PRNGKey(0)}, x, gt, 0.7, train=True)
    vs = sub.init({"params": jax.random.PRNGKey(0)}, x, gt, 0.7, train=True)
    ob = base.apply(vb, x, train=False)
    os_ = sub.apply(vs, x, train=False)
    assert ob[0].shape == os_[0].shape == (1, 32, 32, 3)
    # the tail block carries 4x channels in the subpixel layout
    blk = "block4"
    cb = vb["params"]["core"]["decoder"][blk]["ConvBNReLU_1"]["ConvPad_0"]["Conv_0"]["kernel"]
    cs = vs["params"]["core"]["decoder"][blk]["ConvBNReLU_1"]["ConvPad_0"]["Conv_0"]["kernel"]
    assert cs.shape[-1] == 4 * cb.shape[-1], (cb.shape, cs.shape)

    tx = optax.adam(1e-3)
    dice = make_loss("dice_loss", 3, ignore_index=255)
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.uniform(size=(2, 32, 32, 3)).astype(np.float32))
    tgt = jnp.asarray(rng.integers(0, 3, size=(2, 32, 32)).astype(np.int32))
    st = create_cps_state(sub, tx, (img, tgt, 0.7))
    st = cps_init_phase(sub, st, img, tgt, 0.7)
    st = stack_cps_state(st, tx)
    step = make_cps_train_step_stacked(sub, tx, dice, num_classes=3,
                                       confidence_threshold=0.7)
    _, m, _, _ = step(st, img, tgt, img)
    assert np.isfinite(float(m["loss"]))
