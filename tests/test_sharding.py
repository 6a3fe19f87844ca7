"""Multi-device data-parallel tests on the virtual 8-device CPU mesh —
the TPU-native substitute for multi-node testing (SURVEY.md §4).

The four production-step equivalence tests share one module-scoped flagship
setup (model, initialised stacked state, compiled single-device step): the
state build costs ~25 s and the shared jit object lets the in-process
executable cache serve every test's single-device reference, so the module
pays those once instead of four times (VERDICT r2 weak #5).
"""
import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from vq_seg_tpu.parallel import batch_sharding, make_mesh, replicated

# every test here compiles GSPMD programs over the 8-device virtual mesh
# (~7 min for the module even warm) — excluded from the default fast run
pytestmark = pytest.mark.multidevice


@pytest.fixture(scope="module")
def flagship():
    """Flagship (resnet18-trunk) CPS setup for the mesh equivalence tests:
    returns (model, tx, dice, fresh, step) where ``fresh()`` copies the
    initialised STACKED state (the step donates its input) and ``step`` is
    the shared single-device stacked train step."""
    from types import SimpleNamespace

    from vq_seg_tpu.losses import make_loss
    from vq_seg_tpu.models.networks import make_model
    from vq_seg_tpu.training.cps import (
        cps_init_phase,
        create_cps_state,
        make_cps_train_step_stacked,
        stack_cps_state,
    )

    model = make_model({"name": "vqreptunet1x1v2", "params": {
        "encoder_name": "resnet18", "num_classes": 3,
        "vq_cfg": {"num_embeddings": [0, 0, 4, 4, 4], "distance": "euclidean",
                   "kmeans_init": True},
        "margin": 0.5, "scale": 30.0,
    }})
    tx = optax.adam(1e-3)
    dice = make_loss("dice_loss", 3, ignore_index=255)
    rng = np.random.default_rng(0)
    l_img = jnp.asarray(rng.uniform(size=(4, 32, 32, 3)).astype(np.float32))
    l_tgt = jnp.asarray(rng.integers(0, 3, size=(4, 32, 32)).astype(np.int32))

    state = create_cps_state(model, tx, (l_img, l_tgt, 0.7))
    state = cps_init_phase(model, state, l_img, l_tgt, 0.7)
    state = stack_cps_state(state, tx)
    step = make_cps_train_step_stacked(model, tx, dice, num_classes=3,
                                       confidence_threshold=0.7)
    return SimpleNamespace(
        model=model, tx=tx, dice=dice, step=step,
        fresh=lambda: jax.tree_util.tree_map(jnp.copy, state))


def _batch(seed, batch=4, hw=32):
    rng = np.random.default_rng(seed)
    return (jnp.asarray(rng.uniform(size=(batch, hw, hw, 3)).astype(np.float32)),
            jnp.asarray(rng.integers(0, 3, size=(batch, hw, hw)).astype(np.int32)),
            jnp.asarray(rng.uniform(size=(batch, hw, hw, 3)).astype(np.float32)))


def test_mesh_axes():
    mesh = make_mesh()
    assert mesh.axis_names == ("data", "model", "space")
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


def test_stacked_cps_step_multi_device_matches_single(flagship):
    """VERDICT #3: the PRODUCTION (stacked) flagship CPS step on the
    8-device mesh — batch over 'data', model pair over 'model' — must
    reproduce single-device loss and updated params within fp tolerance
    (GSPMD preserves semantics; only reduction orders differ)."""
    l_img, l_tgt, ul_img = _batch(0)
    single, m_single, _, _ = flagship.step(flagship.fresh(), l_img, l_tgt, ul_img)

    # production DP layout: params replicated, batch over the data axis.
    # (Sharding the stacked pair axis over the 'model' axis trips an XLA
    # grouped-conv partitioning limit on the 3-channel head — the vmapped
    # 1x1 conv becomes feature_group_count=2 with 3 output features.)
    mesh = make_mesh(n_data=4, n_model=2)
    rep = replicated(mesh)
    with mesh:
        st = flagship.fresh()
        vars_sh = jax.tree_util.tree_map(lambda a: jax.device_put(a, rep),
                                         st.variables_1)
        st = st.replace(variables_1=vars_sh,
                        opt_state_1=jax.jit(flagship.tx.init)(vars_sh["params"]),
                        step=jax.device_put(st.step, rep))
        bsh = batch_sharding(mesh)
        sharded, m_sharded, _, _ = flagship.step(
            st, jax.device_put(l_img, bsh), jax.device_put(l_tgt, bsh),
            jax.device_put(ul_img, bsh))

    for k in ("loss", "cps_loss", "sup_loss_1", "commitment_loss",
              "prototype_loss", "miou"):
        a, b = float(m_single[k]), float(m_sharded[k])
        assert abs(a - b) <= 2e-3 * max(abs(a), 1e-3), (k, a, b)
    # updated parameters agree leaf-by-leaf.  Tolerance note: Adam normalises
    # near-zero gradients to +-lr, so a reduction-order sign flip on a ~1e-12
    # gradient yields a +-2*lr param delta — measured on 0.0014% of elements.
    # Anything beyond ~3*lr would indicate a real semantic divergence.
    for pa, pb in zip(jax.tree_util.tree_leaves(single.variables_1["params"]),
                      jax.tree_util.tree_leaves(sharded.variables_1["params"])):
        np.testing.assert_allclose(np.asarray(pa), np.asarray(pb), atol=3e-3)


def test_spatial_sharded_step_matches_single(flagship):
    """Spatial partitioning (SURVEY §2.9's documented extension): image ROWS
    shard over the ``space`` mesh axis and GSPMD inserts the conv halo
    exchanges — the production stacked step must reproduce the single-device
    result with batch over 'data' x rows over 'space'.  64² inputs so every
    encoder stage (down to the 2-row deepest map) crosses shard boundaries,
    exercising halos through reflect-pad convs, pool, BN, VQ, bilinear
    decoder resizes, and the flattening losses."""
    rng = np.random.default_rng(7)
    hw = 64
    l_img = jnp.asarray(rng.uniform(size=(4, hw, hw, 3)).astype(np.float32))
    l_tgt = jnp.asarray(rng.integers(0, 3, size=(4, hw, hw)).astype(np.int32))
    ul_img = jnp.asarray(rng.uniform(size=(4, hw, hw, 3)).astype(np.float32))

    single, m_single, _, _ = flagship.step(flagship.fresh(), l_img, l_tgt, ul_img)

    mesh = make_mesh(n_data=2, n_model=1, n_space=2,
                     devices=jax.devices()[:4])
    rep = replicated(mesh)
    with mesh:
        st = flagship.fresh()
        vars_sh = jax.tree_util.tree_map(lambda a: jax.device_put(a, rep),
                                         st.variables_1)
        st = st.replace(variables_1=vars_sh,
                        opt_state_1=jax.jit(flagship.tx.init)(vars_sh["params"]),
                        step=jax.device_put(st.step, rep))
        bsh = batch_sharding(mesh)  # P("data", "space") — rows sharded
        xs = jax.device_put(l_img, bsh)
        assert len(xs.sharding.device_set) == 4
        sharded, m_sharded, _, _ = flagship.step(
            st, xs, jax.device_put(l_tgt, bsh), jax.device_put(ul_img, bsh))

    for k in ("loss", "cps_loss", "sup_loss_1", "commitment_loss",
              "prototype_loss", "miou"):
        a, b = float(m_single[k]), float(m_sharded[k])
        assert abs(a - b) <= 2e-3 * max(abs(a), 1e-3), (k, a, b)
    for pa, pb in zip(jax.tree_util.tree_leaves(single.variables_1["params"]),
                      jax.tree_util.tree_leaves(sharded.variables_1["params"])):
        np.testing.assert_allclose(np.asarray(pa), np.asarray(pb), atol=3e-3)


def test_pairsharded_cps_step_matches_stacked(flagship):
    """VERDICT r2 #4: the shard_map pair-sharded production step (each CPS
    branch on its own model-axis device group, ppermute swaps, data as a
    GSPMD auto axis) reproduces the stacked step's metrics and updated
    params on the 8-device mesh."""
    from vq_seg_tpu.training.cps import (
        make_cps_train_step_pairsharded,
        shard_pair_state,
    )

    l_img, l_tgt, ul_img = _batch(1)
    single, m_single, ps_single, _ = flagship.step(
        flagship.fresh(), l_img, l_tgt, ul_img)

    mesh = make_mesh(n_data=4, n_model=2)
    build = make_cps_train_step_pairsharded(
        flagship.model, flagship.tx, flagship.dice, mesh, num_classes=3,
        confidence_threshold=0.7)
    with mesh:
        st = shard_pair_state(flagship.fresh(), mesh)
        step = build(st)
        bsh = batch_sharding(mesh)
        pair, m_pair, ps_pair, _ = step(
            st, jax.device_put(l_img, bsh), jax.device_put(l_tgt, bsh),
            jax.device_put(ul_img, bsh))

    for k in ("loss", "cps_loss", "sup_loss_1", "sup_loss_2",
              "commitment_loss", "prototype_loss", "miou", "code_usage"):
        a = np.asarray(m_single[k], dtype=np.float64)
        b = np.asarray(m_pair[k], dtype=np.float64)
        np.testing.assert_allclose(a, b, rtol=2e-3, atol=1e-3, err_msg=k)
    np.testing.assert_allclose(np.asarray(ps_single), np.asarray(ps_pair),
                               atol=1e-3)
    # updated params agree leaf-by-leaf (same Adam-near-zero caveat as the
    # DP test above)
    for pa, pb in zip(jax.tree_util.tree_leaves(single.variables_1["params"]),
                      jax.tree_util.tree_leaves(pair.variables_1["params"])):
        np.testing.assert_allclose(np.asarray(pa), np.asarray(pb), atol=3e-3)


def test_scan_steps_under_mesh(flagship):
    """scan_steps x --data_parallel (VERDICT r2 weak #3): K pre-staged
    sharded batches stack via make_sharded_stack without leaving the mesh
    layout, and the scanned multi-step matches the single-device result."""
    from vq_seg_tpu.training.cps import make_cps_multi_step, make_sharded_stack

    K = 2
    batches = [_batch(10 + i) for i in range(K)]
    l_imgs = [b[0] for b in batches]
    l_tgts = [b[1] for b in batches]
    ul_imgs = [b[2] for b in batches]

    multi = make_cps_multi_step(flagship.step, K)

    plain_stack = make_sharded_stack(None)
    single, m_single, _, _ = multi(
        flagship.fresh(), plain_stack(*l_imgs), plain_stack(*l_tgts),
        plain_stack(*ul_imgs))

    mesh = make_mesh(n_data=4, n_model=2)
    with mesh:
        rep = replicated(mesh)
        st = flagship.fresh()
        st = st.replace(
            variables_1=jax.tree_util.tree_map(
                lambda a: jax.device_put(a, rep), st.variables_1),
            opt_state_1=jax.jit(flagship.tx.init)(
                jax.tree_util.tree_map(lambda a: jax.device_put(a, rep),
                                       st.variables_1)["params"]),
            step=jax.device_put(st.step, rep))
        bsh = batch_sharding(mesh)
        stack = make_sharded_stack(mesh)
        xs = stack(*[jax.device_put(a, bsh) for a in l_imgs])
        ts = stack(*[jax.device_put(a, bsh) for a in l_tgts])
        us = stack(*[jax.device_put(a, bsh) for a in ul_imgs])
        # the K axis carries the per-batch data sharding (no gather)
        assert len(xs.sharding.device_set) == 8
        sharded, m_sharded, _, _ = multi(st, xs, ts, us)

    for k in ("loss", "cps_loss", "miou"):
        a, b = float(m_single[k]), float(m_sharded[k])
        assert abs(a - b) <= 2e-3 * max(abs(a), 1e-3), (k, a, b)
    for pa, pb in zip(jax.tree_util.tree_leaves(single.variables_1["params"]),
                      jax.tree_util.tree_leaves(sharded.variables_1["params"])):
        np.testing.assert_allclose(np.asarray(pa), np.asarray(pb), atol=6e-3)


def test_zero_sharded_optimizer_matches_replicated(flagship):
    """ZeRO-1 (SURVEY §2.9): Adam moments sharded over the data axis via
    parallel/zero.py must (a) reproduce the replicated-moment step exactly,
    (b) actually cut per-chip optimizer bytes, and (c) stay sharded across
    donated steps (GSPMD layout propagation)."""
    from vq_seg_tpu.parallel import opt_bytes_per_chip, shard_opt_state

    l_img, l_tgt, ul_img = _batch(3)
    single, m_single, _, _ = flagship.step(flagship.fresh(), l_img, l_tgt, ul_img)

    # production mesh shape: --zero composes with --data_parallel, which
    # builds n_model=1 (scripts/train.py:76).  A 4x2 mesh with an idle model
    # axis additionally deadlocks XLA's CPU in-process communicator on the
    # per-model-group subgroup all-reduces ZeRO adds — a CPU-runtime
    # limitation, not a layout bug (the same 4x2 mesh works without ZeRO,
    # test_production_step_* above).
    mesh = make_mesh(n_data=4, n_model=1)
    rep = replicated(mesh)
    with mesh:
        st = flagship.fresh()
        vars_sh = jax.tree_util.tree_map(lambda a: jax.device_put(a, rep),
                                         st.variables_1)
        opt_rep = jax.jit(flagship.tx.init)(vars_sh["params"])
        rep_bytes = opt_bytes_per_chip(opt_rep)
        opt_zero = shard_opt_state(opt_rep, mesh)
        zero_bytes = opt_bytes_per_chip(opt_zero)
        # moments dominate the state; sharding 4-ways should cut per-chip
        # bytes well below the replicated footprint
        assert zero_bytes < 0.5 * rep_bytes, (zero_bytes, rep_bytes)
        st = st.replace(variables_1=vars_sh, opt_state_1=opt_zero,
                        step=jax.device_put(st.step, rep))
        bsh = batch_sharding(mesh)
        sharded, m_sharded, _, _ = flagship.step(
            st, jax.device_put(l_img, bsh), jax.device_put(l_tgt, bsh),
            jax.device_put(ul_img, bsh))
        # the donated step keeps the ZeRO layout (no silent re-replication)
        assert opt_bytes_per_chip(sharded.opt_state_1) < 0.5 * rep_bytes

    for k in ("loss", "cps_loss", "sup_loss_1", "miou"):
        a, b = float(m_single[k]), float(m_sharded[k])
        assert abs(a - b) <= 2e-3 * max(abs(a), 1e-3), (k, a, b)
    for pa, pb in zip(jax.tree_util.tree_leaves(single.variables_1["params"]),
                      jax.tree_util.tree_leaves(sharded.variables_1["params"])):
        np.testing.assert_allclose(np.asarray(pa), np.asarray(pb), atol=3e-3)


@pytest.mark.slow
def test_dryrun_multichip_cps():
    import __graft_entry__ as g

    g.dryrun_multichip(8)


def test_multihost_helpers_single_process():
    """parallel/distributed.py on a single process: host_shard slicing and
    make_global_batch == batch-sharded device_put."""
    from vq_seg_tpu.parallel import make_mesh
    from vq_seg_tpu.parallel.distributed import (
        host_shard,
        make_global_batch,
        shard_host_batch_fn,
    )

    items = [f"im{i}.png" for i in range(10)]
    # explicit multi-host slicing is deterministic and partitions exactly
    shards = [host_shard(items, process_index=i, process_count=4) for i in range(4)]
    assert sorted(sum(shards, [])) == sorted(items)
    assert shards[0] == ["im0.png", "im4.png", "im8.png"]
    # single-process: identity
    assert host_shard(items) == items

    mesh = make_mesh()
    batch = np.arange(8 * 4, dtype=np.float32).reshape(8, 4)
    arr = make_global_batch(batch, mesh)
    assert arr.shape == (8, 4)
    assert len(arr.sharding.device_set) == 8
    np.testing.assert_array_equal(np.asarray(arr), batch)
    put = shard_host_batch_fn(mesh)
    np.testing.assert_array_equal(np.asarray(put(batch)), batch)


def test_resolve_mesh_cli_semantics():
    """scripts/train.py parallelism flags (VERDICT r2 #5): per-device batch
    scaling, gcd clamp for reference batch-4 configs, and the pair axis."""
    import os
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))
    from train import resolve_mesh

    from vq_seg_tpu.config import Config

    # no flags -> no mesh
    assert resolve_mesh(Config({"train": {"batch_size": 4}})) is None

    # per-device batch: global = batch x n_data, every chip used
    cfg = Config({"train": {"batch_size": 2}})
    mesh = resolve_mesh(cfg, data_parallel=True, per_device_batch=True)
    assert dict(mesh.shape) == {"data": 8, "model": 1, "space": 1}
    assert cfg.train.batch_size == 16

    # global-batch semantics: data axis clamps to gcd(batch, devices)
    cfg = Config({"train": {"batch_size": 4}})
    mesh = resolve_mesh(cfg, data_parallel=True)
    assert dict(mesh.shape) == {"data": 4, "model": 1, "space": 1}
    assert cfg.train.batch_size == 4  # untouched

    # pair parallelism halves the data axis
    cfg = Config({"train": {"batch_size": 4}})
    mesh = resolve_mesh(cfg, data_parallel=True, per_device_batch=True,
                        pair_parallel=True)
    assert dict(mesh.shape) == {"data": 4, "model": 2, "space": 1}
    assert cfg.train.batch_size == 16

    # spatial sharding: rows over the space axis, composing with data
    cfg = Config({"resize": 64, "train": {"batch_size": 2}})
    mesh = resolve_mesh(cfg, data_parallel=True, spatial=4)
    assert dict(mesh.shape) == {"data": 2, "model": 1, "space": 4}
    # H must divide the space axis
    cfg = Config({"resize": 63, "train": {"batch_size": 2}})
    with pytest.raises(SystemExit):
        resolve_mesh(cfg, data_parallel=True, spatial=4)
