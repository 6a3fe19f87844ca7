"""Pallas-vs-XLA VQ kernel parity — runs only on a real TPU backend.

The CI suite runs on the virtual CPU mesh (conftest forces cpu), so these
are skipped there; run them on hardware with:

    env JAX_PLATFORMS='' python -m pytest tests/test_pallas_tpu.py --no-header -q -p no:cacheprovider -o addopts=''
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.skipif(jax.default_backend() != "tpu",
                                reason="needs a real TPU backend")


@pytest.mark.parametrize("n,c,k", [(1000, 512, 512), (12544, 2048, 512), (4096, 1024, 256)])
@pytest.mark.parametrize("metric", ["euclidean", "cosine"])
def test_pallas_matches_xla(n, c, k, metric):
    from vq_seg_tpu.ops.kmeans import l2norm
    from vq_seg_tpu.ops.vq import vq_assign_xla
    from vq_seg_tpu.ops.vq_pallas import vq_assign_pallas

    x = jax.random.normal(jax.random.PRNGKey(0), (n, c))
    cb = jax.random.normal(jax.random.PRNGKey(1), (k, c))
    if metric == "cosine":
        x, cb = l2norm(x), l2norm(cb)
    i1, q1, c1 = vq_assign_xla(x, cb, metric=metric)
    i2, q2, c2 = vq_assign_pallas(x, cb, metric=metric)
    assert bool((i1 == i2).all())
    assert float(jnp.max(jnp.abs(q1 - q2))) == 0.0
    assert bool((c1 == c2).all())


def test_pallas_rejects_unaligned():
    from vq_seg_tpu.ops.vq_pallas import vq_assign_pallas

    with pytest.raises(ValueError):
        vq_assign_pallas(jnp.zeros((10, 100)), jnp.zeros((512, 100)))
    with pytest.raises(ValueError):
        vq_assign_pallas(jnp.zeros((10, 512)), jnp.zeros((128, 512)))  # K too small


def test_pallas_under_vmap_matches_xla():
    """The stacked CPS step vmaps the models — the kernel must batch
    correctly (Mosaic custom call survives vmap; parity per slice)."""
    from vq_seg_tpu.ops.vq import vq_assign, vq_assign_xla

    x = jax.random.normal(jax.random.PRNGKey(0), (2, 1000, 512))
    cb = jax.random.normal(jax.random.PRNGKey(1), (2, 512, 512))
    idx, quant, counts = jax.vmap(lambda a, b: vq_assign(a, b))(x, cb)
    for m in range(2):
        i_ref, q_ref, c_ref = vq_assign_xla(x[m], cb[m])
        assert bool((idx[m] == i_ref).all())
        assert float(jnp.max(jnp.abs(quant[m] - q_ref))) == 0.0
        assert bool((counts[m] == c_ref).all())
    hlo = jax.jit(jax.vmap(lambda a, b: vq_assign(a, b))).lower(x, cb).as_text()
    assert "tpu_custom_call" in hlo or "mosaic" in hlo.lower()
