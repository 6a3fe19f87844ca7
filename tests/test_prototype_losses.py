"""Prototype-loss family behavioural tests (reference prototype.py semantics)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vq_seg_tpu.models.modules.prototype import (
    EuclideanPrototypeLoss,
    NEDPrototypeLoss,
    OnlyCWPrototypeLoss,
    PrototypeLoss,
    ReliablePrototypeLoss,
    ReliablePrototypeLossv2,
    StableTemperaturedPrototypeLoss,
    arcface_phi,
    entropy_mask,
    orthogonal_loss_fn,
)


@pytest.fixture
def feat_gt(rng):
    x = jnp.asarray(rng.normal(size=(2, 8, 8, 16)).astype(np.float32))
    gt = jnp.asarray(rng.integers(0, 3, size=(2, 8, 8)).astype(np.int32))
    return x, gt


def _init_apply(mod, args, **kw):
    key = jax.random.PRNGKey(0)
    variables = mod.init({"params": key, "kmeans": key}, *args, **kw)
    return variables, mod.apply(variables, *args, **kw)


def test_arcface_phi_easy_margin():
    cos = jnp.asarray([0.9, -0.5])
    phi = arcface_phi(cos, 0.5, True)
    # cos(theta+m) for positive cosine; passthrough for negative
    theta = np.arccos(0.9)
    assert abs(float(phi[0]) - np.cos(theta + 0.5)) < 1e-5
    assert float(phi[1]) == pytest.approx(-0.5)


def test_prototype_loss_finite_and_detached(feat_gt):
    x, gt = feat_gt
    mod = PrototypeLoss(num_classes=3, embedding_dim=16, pt_init="normal",
                        margin=0.5, scale=30.0)
    variables, loss = _init_apply(mod, (x, gt))
    assert np.isfinite(float(loss))
    # v1 prototypes are detached — no grad on embedding
    g = jax.grad(lambda v: mod.apply(v, x, gt))(variables)
    assert float(jnp.abs(g["params"]["embedding"]).max()) == 0.0


def test_v2_prototypes_receive_grad(feat_gt):
    x, gt = feat_gt
    mod = ReliablePrototypeLossv2(num_classes=3, embedding_dim=16, pt_init="normal",
                                  margin=0.5, scale=30.0)
    variables = mod.init({"params": jax.random.PRNGKey(0)}, x, gt, 0.7)
    g = jax.grad(lambda v: mod.apply(v, x, gt, 0.7))(variables)
    assert float(jnp.abs(g["params"]["embedding"]).max()) > 0.0


def test_v2_score_map_confidence_masking(feat_gt):
    x, _ = feat_gt
    mod = ReliablePrototypeLossv2(num_classes=3, embedding_dim=16, pt_init="normal",
                                  margin=0.5, scale=30.0)
    flat_logits = jnp.zeros((2, 8, 8, 3))  # uniform scores: max prob = 1/3
    variables = mod.init({"params": jax.random.PRNGKey(0)}, x, flat_logits, 0.7)
    loss = mod.apply(variables, x, flat_logits, 0.7)
    # all pixels below threshold -> mask zeroes the mean entirely
    assert float(loss) == 0.0


def test_kmeans_init_phase_overwrites_embedding(feat_gt):
    x, gt = feat_gt
    mod = ReliablePrototypeLossv2(num_classes=3, embedding_dim=16, pt_init="kmeans",
                                  margin=0.5, scale=30.0)
    key = jax.random.PRNGKey(0)
    variables = mod.init({"params": key}, x, gt, 0.7)
    before = variables["params"]["embedding"]
    _, mut = mod.apply(variables, x, gt, 0.7, init_protos=True,
                       mutable=["params"], rngs={"kmeans": key})
    after = mut["params"]["embedding"]
    assert not np.allclose(np.asarray(before), np.asarray(after))
    # kmeans means live in feature space: each prototype near data manifold
    assert np.isfinite(np.asarray(after)).all()


def test_entropy_mask_percentile(rng):
    e = jnp.asarray(np.arange(100, dtype=np.float32))
    m = np.asarray(entropy_mask(e, 30.0))
    assert m.sum() == 30  # keep lowest 30% (<= percentile)


def test_reliable_loss_uses_entropy_filter(feat_gt, rng):
    x, gt = feat_gt
    entropy = jnp.asarray(rng.uniform(size=(128,)).astype(np.float32))
    mod = ReliablePrototypeLoss(num_classes=3, embedding_dim=16, pt_init="normal",
                                margin=0.5, scale=30.0)
    variables = mod.init({"params": jax.random.PRNGKey(0)}, x, gt, 80.0, entropy)
    l80 = float(mod.apply(variables, x, gt, 80.0, entropy))
    l0 = float(mod.apply(variables, x, gt, 0.0, entropy))
    assert np.isfinite(l80)
    assert abs(l0) < abs(l80)  # masking everything shrinks the mean


def test_euclidean_prototype_pull(feat_gt):
    x, gt = feat_gt
    mod = EuclideanPrototypeLoss(num_classes=3, embedding_dim=16, pt_init="normal")
    variables, loss = _init_apply(mod, (x, gt))
    assert float(loss) > 0


def test_only_cw_masks_background(feat_gt):
    x, _ = feat_gt
    gt_bg = jnp.zeros((2, 8, 8), jnp.int32)  # everything background
    entropy = jnp.zeros((128,))
    mod = OnlyCWPrototypeLoss(num_classes=3, embedding_dim=16, pt_init="normal",
                              margin=0.5, scale=30.0)
    variables = mod.init({"params": jax.random.PRNGKey(0)}, x, gt_bg, 100.0, entropy)
    loss = mod.apply(variables, x, gt_bg, 100.0, entropy)
    assert float(loss) == 0.0  # bg-only batch contributes nothing


def test_stable_temperatured_runs(feat_gt, rng):
    x, gt = feat_gt
    entropy = jnp.asarray(rng.uniform(size=(128,)).astype(np.float32))
    mod = StableTemperaturedPrototypeLoss(num_classes=3, embedding_dim=16,
                                          pt_init="normal", t=0.1)
    _, loss = _init_apply(mod, (x, gt, 80.0, entropy))
    assert np.isfinite(float(loss))


def test_ned_class_means_init(feat_gt):
    x, gt = feat_gt
    mod = NEDPrototypeLoss(num_classes=3, embedding_dim=16, pt_init="class_means")
    key = jax.random.PRNGKey(0)
    variables = mod.init({"params": key}, x, gt)
    _, mut = mod.apply(variables, x, gt, init_protos=True, mutable=["params"])
    emb = np.asarray(mut["params"]["embedding"])
    # class-mean init: prototype k equals the mean of class-k features
    flat_x = np.asarray(x).reshape(-1, 16)
    flat_gt = np.asarray(gt).reshape(-1)
    for k in range(3):
        if (flat_gt == k).any():
            assert np.allclose(emb[k], flat_x[flat_gt == k].mean(0), atol=1e-5)


def test_orthogonal_loss_zero_for_orthonormal():
    t = jnp.eye(4)
    assert abs(float(orthogonal_loss_fn(t))) < 1e-6
