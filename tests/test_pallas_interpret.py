"""Pallas VQ kernel logic on CPU via interpret mode (VERDICT r2 weak #8).

The hardware constraints (K >= 256, 128-lane alignment, ops/vq_pallas.py:94)
mean the regular CPU suite and the multichip dryrun (K=8) only ever hit the
XLA fallback — the kernel body (grid accumulation, padded-row masking,
pl.when zero-init, argmin/argmax paths) was covered by one TPU-only timing
test.  ``interpret=True`` executes the SAME kernel through the Pallas
interpreter on CPU, so its logic is pinned here against the XLA reference
path (ops/vq.py:45, contract from reference vector_quantizer/vq_img.py:167-175).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest


@pytest.mark.parametrize("n,c,k", [
    (1000, 128, 256),   # padded final tile (1000 % 256 != 0) — mask path
    (512, 256, 512),    # exact tiles, multi-step grid accumulation
    (100, 128, 256),    # single partially-valid tile
])
@pytest.mark.parametrize("metric", ["euclidean", "cosine"])
def test_interpret_matches_xla(n, c, k, metric):
    from vq_seg_tpu.ops.kmeans import l2norm
    from vq_seg_tpu.ops.vq import vq_assign_xla
    from vq_seg_tpu.ops.vq_pallas import _vq_assign_pallas_impl

    x = jax.random.normal(jax.random.PRNGKey(0), (n, c))
    cb = jax.random.normal(jax.random.PRNGKey(1), (k, c))
    if metric == "cosine":
        x, cb = l2norm(x), l2norm(cb)
    i1, q1, c1 = vq_assign_xla(x, cb, metric=metric)
    i2, q2, c2 = _vq_assign_pallas_impl(x, cb, metric, interpret=True)
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))
    assert float(jnp.max(jnp.abs(q1 - q2))) == 0.0
    # usage counts: padded rows must not leak into the histogram
    np.testing.assert_array_equal(np.asarray(c1), np.asarray(c2))
    assert int(jnp.sum(c2)) == n


def test_interpret_duplicate_codes_tie_break():
    """Argmin ties (duplicate codebook rows) must pick the FIRST index,
    matching jnp.argmin semantics in the XLA path."""
    from vq_seg_tpu.ops.vq import vq_assign_xla
    from vq_seg_tpu.ops.vq_pallas import _vq_assign_pallas_impl

    cb = jax.random.normal(jax.random.PRNGKey(2), (256, 128))
    cb = cb.at[128].set(cb[7])  # duplicate row -> exact tie
    x = jnp.tile(cb[7][None], (300, 1)) + 0.0
    i1, _, c1 = vq_assign_xla(x, cb)
    i2, _, c2 = _vq_assign_pallas_impl(x, cb, "euclidean", interpret=True)
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))
    np.testing.assert_array_equal(np.asarray(c1), np.asarray(c2))
