"""Multi-device data-parallel tests on the virtual 8-device CPU mesh —
the TPU-native substitute for multi-node testing (SURVEY.md §4)."""
import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from vq_seg_tpu.parallel import batch_sharding, make_mesh, replicated


def test_mesh_axes():
    mesh = make_mesh()
    assert mesh.axis_names == ("data", "model")
    assert mesh.devices.size == 8


def test_batch_sharding_lays_out_axis0():
    mesh = make_mesh()
    x = jnp.zeros((8, 4, 4, 3))
    xs = jax.device_put(x, batch_sharding(mesh))
    assert len(xs.sharding.device_set) == 8


def test_data_parallel_step_matches_single_device():
    """A jitted DP loss/grad over the mesh must equal the single-device
    result (GSPMD inserts the all-reduce; numerics identical up to fp)."""
    mesh = make_mesh()

    def loss_fn(w, x, y):
        pred = x @ w
        return jnp.mean((pred - y) ** 2)

    k = jax.random.PRNGKey(0)
    w = jax.random.normal(k, (16, 4))
    x = jax.random.normal(jax.random.PRNGKey(1), (8, 16))
    y = jax.random.normal(jax.random.PRNGKey(2), (8, 4))

    g_single = jax.grad(loss_fn)(w, x, y)
    with mesh:
        ws = jax.device_put(w, replicated(mesh))
        xs = jax.device_put(x, batch_sharding(mesh))
        ys = jax.device_put(y, batch_sharding(mesh))
        g_sharded = jax.jit(jax.grad(loss_fn))(ws, xs, ys)
    assert np.allclose(np.asarray(g_single), np.asarray(g_sharded), atol=1e-5)


@pytest.mark.slow
def test_dryrun_multichip_cps():
    import __graft_entry__ as g

    g.dryrun_multichip(8)
