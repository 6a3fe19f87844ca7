"""VQ core op tests: k-means behaviour, assignment semantics, STE gradients,
and the VectorQuantizer module contract (vs reference vq_img.py formulas)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vq_seg_tpu.ops import code_usage_percent, kmeans, vq_assign_xla
from vq_seg_tpu.ops.kmeans import l2norm
from vq_seg_tpu.ops.vq import commitment_loss, quantize_ste
from vq_seg_tpu.models.modules.vector_quantizer import (
    VectorQuantizer,
    VQIdentity,
    make_vq_module,
)


def test_vq_assign_matches_bruteforce(rng):
    x = jnp.asarray(rng.normal(size=(64, 16)).astype(np.float32))
    cb = jnp.asarray(rng.normal(size=(8, 16)).astype(np.float32))
    idx, q, counts = vq_assign_xla(x, cb, metric="euclidean")
    d = np.linalg.norm(np.asarray(x)[:, None, :] - np.asarray(cb)[None], axis=-1)
    np.testing.assert_array_equal(np.asarray(idx), d.argmin(-1))
    np.testing.assert_allclose(np.asarray(q), np.asarray(cb)[d.argmin(-1)])
    np.testing.assert_array_equal(np.asarray(counts), np.bincount(d.argmin(-1), minlength=8))


def test_vq_assign_cosine(rng):
    x = l2norm(jnp.asarray(rng.normal(size=(32, 8)).astype(np.float32)))
    cb = l2norm(jnp.asarray(rng.normal(size=(4, 8)).astype(np.float32)))
    idx, q, counts = vq_assign_xla(x, cb, metric="cosine")
    sims = np.asarray(x) @ np.asarray(cb).T
    np.testing.assert_array_equal(np.asarray(idx), sims.argmax(-1))


def test_code_usage_percent():
    counts = jnp.asarray([3, 0, 0, 1])
    np.testing.assert_allclose(float(code_usage_percent(counts)), 50.0)


def test_kmeans_recovers_separated_clusters(rng):
    centers = np.array([[10, 0], [-10, 0], [0, 10]], dtype=np.float32)
    pts = np.concatenate([centers[i] + rng.normal(scale=0.1, size=(50, 2)) for i in range(3)])
    # K=8 > 3 clusters so every cluster receives at least one sampled seed
    # (K=#clusters can miss a cluster under random init — same as reference)
    means, bins = kmeans(jax.random.PRNGKey(0), jnp.asarray(pts.astype(np.float32)), 8, 10)
    means = np.asarray(means)
    for c in centers:
        assert np.min(np.linalg.norm(means - c, axis=-1)) < 0.2
    # every mean sits inside one of the tight clusters
    d_to_center = np.min(np.linalg.norm(means[:, None] - centers[None], axis=-1), axis=-1)
    assert np.all(d_to_center < 0.5)
    assert int(np.asarray(bins).sum()) == 150


def test_kmeans_zero_bin_keeps_old_mean(rng):
    # 2 points, 4 clusters: at least 2 bins are zero; their means must stay
    # at sampled positions (i.e. remain equal to one of the inputs)
    pts = jnp.asarray(np.array([[0.0, 0.0], [100.0, 100.0]], dtype=np.float32))
    means, bins = kmeans(jax.random.PRNGKey(1), pts, 4, 5)
    means = np.asarray(means)
    for m in means:
        assert np.min(np.linalg.norm(np.asarray(pts) - m, axis=-1)) < 1e-5


def test_ste_gradient_flows_to_input():
    x = jnp.ones((4, 3)) * 2.0
    q = jnp.zeros((4, 3))

    def f(x):
        return jnp.sum(quantize_ste(x, q) ** 2)

    g = jax.grad(f)(x)
    # value is q (=0) but gradient is d/dx sum(x^2-ish path) = 2*value_of_ste = 0?
    # STE: out = x + sg(q - x); d out/d x = I, so grad = 2*out = 0 here.
    np.testing.assert_allclose(np.asarray(g), 0.0, atol=1e-6)

    def f2(x):
        return jnp.sum(quantize_ste(x, q))

    g2 = jax.grad(f2)(x)
    np.testing.assert_allclose(np.asarray(g2), 1.0)


def test_commitment_loss_grad_only_encoder():
    x = jnp.asarray(np.random.default_rng(0).normal(size=(8, 4)).astype(np.float32))
    q = quantize_ste(x, jnp.zeros_like(x))
    loss, g = jax.value_and_grad(lambda x: commitment_loss(x, quantize_ste(x, jnp.zeros_like(x))))(x)
    np.testing.assert_allclose(float(loss), float(jnp.mean(x**2)), rtol=1e-6)
    # d/dx mean((0 - x)^2) = 2x/n ... through the non-detached x branch only
    np.testing.assert_allclose(np.asarray(g), 2 * np.asarray(x) / x.size, rtol=1e-5)


@pytest.mark.parametrize("distance", ["euclidean", "cosine"])
def test_vector_quantizer_module(distance, rng):
    vq = VectorQuantizer(dim=8, num_embeddings=16, distance=distance, kmeans_init=True)
    x = jnp.asarray(rng.normal(size=(2, 4, 4, 8)).astype(np.float32))
    variables = vq.init(jax.random.PRNGKey(0), x)
    assert variables["codebook"]["embedding"].shape == (16, 8)

    # explicit kmeans init phase
    (_, _, _, _), upd = vq.apply(
        variables, x, train=True, init_codebook=True,
        mutable=["codebook"], rngs={"kmeans": jax.random.PRNGKey(1)},
    )
    variables = {**variables, **upd}

    q, idx, loss, usage = vq.apply(variables, x, train=True)
    assert q.shape == x.shape
    assert idx.shape == (2, 4, 4)
    assert float(loss) >= 0
    assert 0 <= float(usage) <= 100
    # eval: loss must be 0, no STE
    q_e, _, loss_e, _ = vq.apply(variables, x, train=False)
    assert float(loss_e) == 0.0
    if distance == "euclidean":
        # eval-mode quantized values must be rows of the codebook
        cb = np.asarray(variables["codebook"]["embedding"])
        flat = np.asarray(q_e).reshape(-1, 8)
        d = np.linalg.norm(flat[:, None] - cb[None], axis=-1).min(-1)
        np.testing.assert_allclose(d, 0.0, atol=1e-5)


def test_vq_module_gradients_ste(rng):
    """End-to-end: grads flow to upstream params, none to the codebook."""
    vq = VectorQuantizer(dim=4, num_embeddings=8)
    x = jnp.asarray(rng.normal(size=(1, 2, 2, 4)).astype(np.float32))
    variables = vq.init(jax.random.PRNGKey(0), x)

    def loss_fn(x):
        q, _, commit, _ = vq.apply(variables, x, train=True)
        return jnp.sum(q) + commit

    g = jax.grad(loss_fn)(x)
    assert np.abs(np.asarray(g)).sum() > 0  # STE passes gradient through


def test_make_vq_module_list():
    mods = make_vq_module(
        {"num_embeddings": [0, 0, 32, 32, 32], "distance": "euclidean", "kmeans_init": True},
        encoder_channels=(3, 64, 256, 512, 1024, 2048),
        depth=5,
    )
    assert isinstance(mods[0], VQIdentity) and isinstance(mods[1], VQIdentity)
    assert mods[2].dim == 512 and mods[4].dim == 2048
    mods_int = make_vq_module({"num_embeddings": 16}, (3, 64, 128, 256, 512, 512), 5)
    assert all(isinstance(m, VectorQuantizer) for m in mods_int)
    with pytest.raises(ValueError):
        make_vq_module({"num_embeddings": [0, -1, 2, 3, 4]}, (3, 1, 2, 3, 4, 5), 5)
