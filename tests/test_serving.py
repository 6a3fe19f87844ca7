"""Serving/inference path (vq_seg_tpu/serving.py::Predictor).

Pins: exactness of the f32 predictor vs the raw eval forward, the
official-protocol output upsample, partial-batch padding, the pipelined
stream, checkpoint round-trip, and that the bf16 profile stays close to f32.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vq_seg_tpu.models.layers import resize_bilinear
from vq_seg_tpu.models.networks import make_model
from vq_seg_tpu.serving import Predictor

HW = 32


@pytest.fixture(scope="module")
def setup():
    model = make_model({"name": "vqreptunet1x1v2", "params": {
        "encoder_name": "resnet18", "num_classes": 3,
        "vq_cfg": {"num_embeddings": [0, 0, 4, 4, 4], "distance": "euclidean",
                   "kmeans_init": True},
        "margin": 0.5, "scale": 30.0,
    }})
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.uniform(size=(2, HW, HW, 3)).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), x0)
    imgs = rng.integers(0, 256, size=(2, HW, HW, 3)).astype(np.uint8)
    return model, variables, imgs


def _ref_logits(model, variables, imgs):
    x = jnp.asarray(imgs, jnp.float32) / 255.0
    out = model.apply(variables, x, train=False)
    return out[0] if isinstance(out, tuple) else out


def test_f32_predictor_matches_eval_forward(setup):
    model, variables, imgs = setup
    pred = Predictor(model, variables, input_hw=(HW, HW), batch_size=2,
                     half=False)
    want = np.asarray(jnp.argmax(_ref_logits(model, variables, imgs), -1))
    got = pred(imgs)
    assert got.dtype == np.uint8 and got.shape == (2, HW, HW)
    np.testing.assert_array_equal(got, want)


def test_output_upsample_matches_official_protocol(setup):
    """output_hw follows the evaluator: bilinear score upsample to native
    size BEFORE argmax (test_detailviz.py:107-145)."""
    model, variables, imgs = setup
    native = (HW * 2, HW * 2)
    pred = Predictor(model, variables, input_hw=(HW, HW), batch_size=2,
                     output_hw=native, half=False)
    logits = _ref_logits(model, variables, imgs)
    want = np.asarray(jnp.argmax(resize_bilinear(logits, native), -1))
    got = pred(imgs)
    assert got.shape == (2, *native)
    np.testing.assert_array_equal(got, want)


def test_partial_batch_padding(setup):
    """A final batch smaller than the serving batch is padded internally and
    returns exactly the real rows (eval mode has no cross-batch coupling)."""
    model, variables, imgs = setup
    pred = Predictor(model, variables, input_hw=(HW, HW), batch_size=2,
                     half=False)
    full = pred(imgs)
    one = pred(imgs[:1])
    assert one.shape == (1, HW, HW)
    np.testing.assert_array_equal(one[0], full[0])


def test_predict_stream_matches_sequential(setup):
    model, variables, imgs = setup
    pred = Predictor(model, variables, input_hw=(HW, HW), batch_size=2,
                     half=False)
    rng = np.random.default_rng(1)
    batches = [rng.integers(0, 256, size=(2, HW, HW, 3)).astype(np.uint8)
               for _ in range(3)] + [imgs[:1]]  # partial tail batch
    seq = [pred(b) for b in batches]
    piped = list(pred.predict_stream(batches))
    assert len(piped) == len(seq)
    for a, b in zip(piped, seq):
        np.testing.assert_array_equal(a, b)


def test_bf16_profile_close_to_f32(setup):
    model, variables, imgs = setup
    f32 = Predictor(model, variables, input_hw=(HW, HW), batch_size=2,
                    half=False)
    bf16 = Predictor(model, variables, input_hw=(HW, HW), batch_size=2,
                     half=True)
    a, b = f32(imgs), bf16(imgs)
    agreement = float(np.mean(a == b))
    # random-init logits are nearly tied, so exactness is not expected;
    # gross breakage (layout/cast bugs) drops agreement towards 1/3
    assert agreement >= 0.8, agreement


@pytest.mark.slow
def test_int8_predictor_close_to_f32(setup):
    model, variables, imgs = setup
    f32 = Predictor(model, variables, input_hw=(HW, HW), batch_size=2,
                    half=False)
    q8 = Predictor(model, variables, input_hw=(HW, HW), batch_size=2,
                   quant="int8")
    # weights really are stored int8 (not just recast)
    kernels = [a for a in jax.tree_util.tree_leaves(q8._vars["params"])
               if a.ndim >= 2]
    assert kernels and all(k.dtype == jnp.int8 for k in kernels)
    agreement = float(np.mean(f32(imgs) == q8(imgs)))
    assert agreement >= 0.8, agreement


def test_int8_predictor_rejects_unknown_quant(setup):
    model, variables, _ = setup
    with pytest.raises(ValueError):
        Predictor(model, variables, input_hw=(HW, HW), quant="int4")


def test_mesh_sharded_predictor_matches_single(setup):
    """Multi-chip serving: the batch shards over the mesh's data axis and
    weights replicate; eval has no cross-sample coupling, so the sharded
    labels equal the single-device labels exactly."""
    from vq_seg_tpu.parallel import make_mesh

    model, variables, imgs = setup
    single = Predictor(model, variables, input_hw=(HW, HW), batch_size=8,
                       half=False)
    mesh = make_mesh(n_data=4, n_model=2)
    sharded = Predictor(model, variables, input_hw=(HW, HW), batch_size=8,
                        half=False, mesh=mesh)
    rng = np.random.default_rng(3)
    big = rng.integers(0, 256, size=(8, HW, HW, 3)).astype(np.uint8)
    np.testing.assert_array_equal(sharded(big), single(big))
    # partial final batch still pads to the global batch and unpads
    np.testing.assert_array_equal(sharded(big[:5]), single(big)[:5])
    with pytest.raises(ValueError):
        Predictor(model, variables, input_hw=(HW, HW), batch_size=6,
                  half=False, mesh=mesh)


def test_spatial_sharded_predictor_matches_single(setup):
    """Batch-1 latency mode: image rows shard over the data axis and GSPMD
    inserts the conv halo exchanges; labels must equal the single-device
    predictor exactly."""
    from vq_seg_tpu.parallel import make_mesh

    model, variables, imgs = setup
    single = Predictor(model, variables, input_hw=(HW, HW), batch_size=1,
                       half=False)
    mesh = make_mesh(n_data=4, n_model=2)
    spatial = Predictor(model, variables, input_hw=(HW, HW), batch_size=1,
                        half=False, mesh=mesh, spatial=True)
    np.testing.assert_array_equal(spatial(imgs[:1]), single(imgs[:1]))
    with pytest.raises(ValueError):  # H=32 not divisible by 5... use bad mesh
        Predictor(model, variables, input_hw=(HW + 1, HW), batch_size=1,
                  half=False, mesh=mesh, spatial=True)
    with pytest.raises(ValueError):
        Predictor(model, variables, input_hw=(HW, HW), batch_size=1,
                  half=False, spatial=True)


def test_from_checkpoint_roundtrip(setup, tmp_path):
    model, variables, imgs = setup
    from vq_seg_tpu.config import Config
    from vq_seg_tpu.utils.ckpoints import _save_tree

    path = str(tmp_path / "last.ckpt")
    _save_tree(path, {"model_1": variables})
    cfg = Config({"resize": HW, "model": {
        "name": "vqreptunet1x1v2", "params": {
            "encoder_name": "resnet18", "num_classes": 3,
            "vq_cfg": {"num_embeddings": [0, 0, 4, 4, 4],
                       "distance": "euclidean", "kmeans_init": True},
            "margin": 0.5, "scale": 30.0}}})
    pred = Predictor.from_checkpoint(cfg, path, batch_size=2, half=False)
    direct = Predictor(model, variables, input_hw=(HW, HW), batch_size=2,
                       half=False)
    np.testing.assert_array_equal(pred(imgs), direct(imgs))
