"""Segmentation / angular / VQ head behavioural tests
(reference models/modules/segmentation_head.py, vq_segmentation_head.py)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vq_seg_tpu.models.modules.heads import (
    AngularSegmentationHead,
    AngularSegmentationHeadv2,
    AngularSegmentationHeadv3,
    SegmentationHead,
    VQSegmentationHead,
)


@pytest.fixture
def feat(rng):
    return jnp.asarray(rng.normal(size=(2, 8, 8, 16)).astype(np.float32))


def test_segmentation_head_upsamples(feat):
    head = SegmentationHead(out_channels=3, upsampling=2,
                            activation=lambda x: jax.nn.softmax(x, axis=-1))
    v = head.init(jax.random.PRNGKey(0), feat)
    out = head.apply(v, feat)
    assert out.shape == (2, 16, 16, 3)
    assert np.allclose(np.asarray(out).sum(-1), 1.0, atol=1e-5)


def test_angular_head_v1(feat, rng):
    gt = jnp.asarray(rng.integers(0, 3, size=(2, 16, 16)).astype(np.int32))
    head = AngularSegmentationHead(num_classes=3, embedding_dim=16, out_channels=16,
                                   scale=30.0, margin=0.5, pt_init="normal")
    v = head.init({"params": jax.random.PRNGKey(0)}, feat, gt, train=True)
    pred, loss = head.apply(v, feat, gt, train=True)
    assert pred.shape == (2, 16, 16, 3)  # x2 upsample
    assert np.isfinite(float(loss)) and float(loss) > 0
    pred_eval, loss_eval = head.apply(v, feat, None, train=False)
    assert float(loss_eval) == 0.0


def test_angular_head_v2_includes_commitment(feat, rng):
    gt = jnp.asarray(rng.integers(0, 3, size=(2, 8, 8)).astype(np.int32))
    head = AngularSegmentationHeadv2(num_classes=3, out_channels=16,
                                     scale=30.0, margin=0.5, pt_init="normal")
    v = head.init({"params": jax.random.PRNGKey(0)}, feat, gt, train=True)
    pred, loss = head.apply(v, feat, gt, train=True)
    assert pred.shape == (2, 16, 16, 3)
    assert np.isfinite(float(loss))
    # the class-embedding receives gradient (live weight, v2 semantics)
    g = jax.grad(lambda vv: head.apply(vv, feat, gt, train=True)[1])(v)
    assert float(jnp.abs(g["params"]["embedding"]).max()) > 0


def test_angular_head_v3_pseudo_label_path(feat, rng):
    score = jnp.asarray(rng.normal(size=(2, 8, 8, 3)).astype(np.float32))
    head = AngularSegmentationHeadv3(num_classes=3, out_channels=16,
                                     scale=30.0, margin=0.5, pt_init="normal")
    v = head.init({"params": jax.random.PRNGKey(0)}, feat, score,
                  split="unlabeled", th=0.5, train=True)
    pred, loss = head.apply(v, feat, score, split="unlabeled", th=0.5, train=True)
    assert pred.shape == (2, 8, 8, 3)
    assert np.isfinite(float(loss))


def test_vq_segmentation_head_scores(feat):
    head = VQSegmentationHead(dim=16, num_embeddings=3, kmeans_init=False,
                              distance="euclidean")
    v = head.init({"params": jax.random.PRNGKey(0)}, feat, train=True)
    quant, score, idx, commit, usage = head.apply(v, feat, train=True)
    assert score.shape == (2, 8, 8, 3)
    assert np.allclose(np.asarray(score).sum(-1), 1.0, atol=1e-5)  # softmaxed
    assert idx.shape == (2, 8, 8)
    assert 0 <= float(usage) <= 100
    assert np.isfinite(float(commit))
    # cosine variant
    head_c = VQSegmentationHead(dim=16, num_embeddings=3, kmeans_init=False,
                                distance="cosine")
    vc = head_c.init({"params": jax.random.PRNGKey(0)}, feat, train=True)
    _, score_c, _, _, _ = head_c.apply(vc, feat, train=True)
    assert score_c.shape == (2, 8, 8, 3)
