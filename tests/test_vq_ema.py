"""Opt-in EMA codebook updates (vq_cfg.ema).

The reference constructor stores ``decay`` but implements no EMA — its
codebook is frozen at the k-means init (SURVEY.md §2.1, vq_img.py:199).
``ema=True`` makes that knob live with the standard VQ-VAE appendix-A.1
update.  Pinned here:

  * the update matches the hand-computed EMA formula (Laplace-smoothed
    running mean), and the SAME forward's assignment still used the
    pre-update codebook;
  * ``ema=False`` (the parity default) leaves the codebook bitwise frozen
    even when the step declares the collection mutable;
  * the production stacked CPS step propagates the update end-to-end;
  * EMA adapts the codebook toward a shifted feature distribution (the
    failure mode a frozen codebook cannot recover from).
"""
import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from vq_seg_tpu.models.modules.vector_quantizer import VectorQuantizer


def _init_train(vq, x):
    variables = vq.init(jax.random.PRNGKey(0), x)
    (_, _, _, _), upd = vq.apply(
        variables, x, train=True, init_codebook=True,
        mutable=["codebook"], rngs={"kmeans": jax.random.PRNGKey(1)})
    return {**variables, **upd}


def test_ema_update_matches_formula(rng):
    k, c, decay = 4, 8, 0.6
    vq = VectorQuantizer(dim=c, num_embeddings=k, kmeans_init=True,
                         ema=True, decay=decay)
    x = jnp.asarray(rng.normal(size=(2, 3, 3, c)).astype(np.float32))
    variables = _init_train(vq, x)
    cb0 = np.asarray(variables["codebook"]["embedding"])
    cs0 = np.asarray(variables["codebook"]["cluster_size"])
    ea0 = np.asarray(variables["codebook"]["embed_avg"])
    np.testing.assert_allclose(cs0, 1.0)  # unit mass at init
    np.testing.assert_allclose(ea0, cb0, atol=1e-6)

    (q, idx, _, _), mut = vq.apply(variables, x, train=True,
                                   mutable=["codebook"])
    # assignment/quantize used the PRE-update codebook
    flat_idx = np.asarray(idx).reshape(-1)
    np.testing.assert_allclose(
        np.asarray(q).reshape(-1, c), cb0[flat_idx], atol=1e-5)

    # hand-computed EMA
    flat = np.asarray(x).reshape(-1, c)
    counts = np.bincount(flat_idx, minlength=k).astype(np.float32)
    sums = np.zeros((k, c), np.float32)
    np.add.at(sums, flat_idx, flat)
    cs1 = decay * cs0 + (1 - decay) * counts
    ea1 = decay * ea0 + (1 - decay) * sums
    n = cs1.sum()
    smoothed = (cs1 + vq.eps) / (n + k * vq.eps) * n
    cb1 = ea1 / smoothed[:, None]

    np.testing.assert_allclose(np.asarray(mut["codebook"]["cluster_size"]),
                               cs1, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(mut["codebook"]["embed_avg"]),
                               ea1, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(mut["codebook"]["embedding"]),
                               cb1, rtol=1e-5, atol=1e-6)


def test_ema_off_keeps_codebook_frozen(rng):
    vq = VectorQuantizer(dim=4, num_embeddings=8, kmeans_init=True)
    x = jnp.asarray(rng.normal(size=(1, 4, 4, 4)).astype(np.float32))
    variables = _init_train(vq, x)
    cb0 = np.asarray(variables["codebook"]["embedding"])
    # the train steps always declare "codebook" mutable; off must be a no-op
    _, mut = vq.apply(variables, x, train=True, mutable=["codebook"])
    np.testing.assert_array_equal(np.asarray(mut["codebook"]["embedding"]), cb0)
    assert "cluster_size" not in mut["codebook"]  # no EMA state when off


def test_ema_no_update_in_eval_or_nonmutable(rng):
    vq = VectorQuantizer(dim=4, num_embeddings=8, kmeans_init=True, ema=True)
    x = jnp.asarray(rng.normal(size=(1, 4, 4, 4)).astype(np.float32))
    variables = _init_train(vq, x)
    cb0 = np.asarray(variables["codebook"]["embedding"])
    # eval mode: mutable but train=False — frozen
    _, mut = vq.apply(variables, x, train=False, mutable=["codebook"])
    np.testing.assert_array_equal(np.asarray(mut["codebook"]["embedding"]), cb0)
    # non-mutable apply (e.g. the fused experimental step): silently frozen
    out = vq.apply(variables, x, train=True)
    assert len(out) == 4


def test_ema_gradients_unaffected(rng):
    """The EMA statistics path must not leak into AD: upstream grads with
    ema on == off (same codebook values before the first update)."""
    x = jnp.asarray(rng.normal(size=(1, 4, 4, 4)).astype(np.float32))
    grads = []
    for ema in (False, True):
        vq = VectorQuantizer(dim=4, num_embeddings=8, kmeans_init=True, ema=ema)
        variables = _init_train(vq, x)

        def loss_fn(x):
            (q, _, commit, _), _ = vq.apply(variables, x, train=True,
                                            mutable=["codebook"])
            return jnp.sum(q * q) + commit

        grads.append(np.asarray(jax.grad(loss_fn)(x)))
    np.testing.assert_allclose(grads[0], grads[1], atol=1e-6)


def test_ema_adapts_to_shifted_distribution(rng):
    """A frozen codebook initialised on one distribution stays wrong for a
    shifted one; EMA tracks the shift (quantization error shrinks)."""
    c = 4
    vq = VectorQuantizer(dim=c, num_embeddings=8, kmeans_init=True,
                         ema=True, decay=0.5)
    x0 = jnp.asarray(rng.normal(size=(2, 4, 4, c)).astype(np.float32))
    variables = _init_train(vq, x0)

    shifted = x0 + 5.0  # the init clusters are all ~5 sigma away
    def qerr(v):
        q, _, _, _ = vq.apply(v, shifted, train=False)
        return float(jnp.mean((q - shifted) ** 2))

    err_before = qerr(variables)
    for _ in range(20):
        _, mut = vq.apply(variables, shifted, train=True, mutable=["codebook"])
        variables = {**variables, **mut}
    err_after = qerr(variables)
    assert err_after < 0.1 * err_before, (err_before, err_after)


@pytest.mark.parametrize("distance", ["cosine"])
def test_ema_cosine_keeps_codebook_normalised(distance, rng):
    vq = VectorQuantizer(dim=6, num_embeddings=4, kmeans_init=True,
                         ema=True, distance=distance)
    x = jnp.asarray(rng.normal(size=(1, 4, 4, 6)).astype(np.float32))
    variables = _init_train(vq, x)
    _, mut = vq.apply(variables, x, train=True, mutable=["codebook"])
    norms = np.linalg.norm(np.asarray(mut["codebook"]["embedding"]), axis=-1)
    np.testing.assert_allclose(norms, 1.0, atol=1e-5)


def test_restart_requires_ema():
    with pytest.raises(ValueError, match="restart_threshold requires ema"):
        VectorQuantizer(dim=4, num_embeddings=8,
                        restart_threshold=0.1).init(
            jax.random.PRNGKey(0), jnp.zeros((1, 2, 2, 4)))


def test_restart_revives_dead_codes(rng):
    """A code pinned far from the data never gets assigned; its EMA mass
    decays below the threshold and the restart reseeds it at the batch
    feature with the largest quantization residual."""
    k, c, decay = 4, 8, 0.5
    vq = VectorQuantizer(dim=c, num_embeddings=k, kmeans_init=True,
                         ema=True, decay=decay, restart_threshold=0.3)
    x = jnp.asarray(rng.normal(size=(2, 3, 3, c)).astype(np.float32))
    variables = _init_train(vq, x)
    # plant a dead code far from every feature — embedding AND its EMA
    # average, else the EMA itself pulls the code straight back to the data
    for name in ("embedding", "embed_avg"):
        arr = np.asarray(variables["codebook"][name]).copy()
        arr[0] = 100.0
        variables["codebook"][name] = jnp.asarray(arr)

    v = variables
    revived_at = None
    for i in range(4):  # mass 1.0 decays 0.5 -> 0.25 < 0.3 at step 2
        (_, idx, _, _), mut = vq.apply(v, x, train=True, mutable=["codebook"])
        if revived_at is None:
            assert not np.any(np.asarray(idx) == 0)  # dead until revived
        v = {**v, **mut}
        if revived_at is None and float(
                np.asarray(v["codebook"]["cluster_size"])[0]) > 0.9:
            revived_at = i  # restart resets the mass to exactly 1.0
    assert revived_at == 1, revived_at
    new_cb = np.asarray(v["codebook"]["embedding"])
    flat = np.asarray(x).reshape(-1, c)
    # revived: sits near an actual batch feature (post-revival EMA steps
    # drift it slightly), nowhere near the planted outlier at 100
    d = np.linalg.norm(flat - new_cb[0], axis=-1)
    assert d.min() < 0.5, d.min()
    assert float(np.asarray(v["codebook"]["cluster_size"])[0]) >= 0.5
    # and it is the worst-covered feature given the live codebook
    (_, idx2, _, _) = vq.apply(v, x, train=False)
    assert np.any(np.asarray(idx2) == 0)  # the code participates again


def test_restart_noop_when_all_codes_alive(rng):
    k, c = 4, 8
    x = jnp.asarray(rng.normal(size=(2, 4, 4, c)).astype(np.float32))
    cbs = []
    for th in (0.0, 1e-6):
        vq = VectorQuantizer(dim=c, num_embeddings=k, kmeans_init=True,
                             ema=True, decay=0.5, restart_threshold=th)
        v = _init_train(vq, x)
        for _ in range(3):
            _, mut = vq.apply(v, x, train=True, mutable=["codebook"])
            v = {**v, **mut}
        cbs.append(np.asarray(v["codebook"]["embedding"]))
    np.testing.assert_allclose(cbs[0], cbs[1], atol=1e-6)


def test_ema_update_matches_under_data_sharded_batch(rng):
    """segment_sum/bincount over a GSPMD-sharded batch must reduce over the
    data axis: the mutated codebook from a mesh-sharded apply equals the
    single-device one (the module docstring's replication claim, pinned)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from vq_seg_tpu.parallel import make_mesh

    k, c = 4, 8
    vq = VectorQuantizer(dim=c, num_embeddings=k, kmeans_init=True,
                         ema=True, decay=0.6, restart_threshold=0.1)
    x = jnp.asarray(rng.normal(size=(8, 4, 4, c)).astype(np.float32))
    variables = _init_train(vq, x)

    fn = jax.jit(lambda v, x: vq.apply(v, x, train=True, mutable=["codebook"]))
    _, mut_single = fn(variables, x)

    mesh = make_mesh(n_data=4)
    xs = jax.device_put(x, NamedSharding(mesh, P("data")))
    vs = jax.device_put(variables, NamedSharding(mesh, P()))
    _, mut_mesh = fn(vs, xs)

    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6),
        mut_single, mut_mesh)


def test_ema_state_checkpoint_roundtrip(tmp_path, rng):
    """cluster_size/embed_avg ride in the codebook collection: a save/load
    through the reference-contract checkpoint restores them exactly."""
    from vq_seg_tpu.utils.ckpoints import load_ckpoints, save_ckpoints

    vq = VectorQuantizer(dim=4, num_embeddings=8, kmeans_init=True, ema=True)
    x = jnp.asarray(rng.normal(size=(1, 4, 4, 4)).astype(np.float32))
    variables = _init_train(vq, x)
    _, mut = vq.apply(variables, x, train=True, mutable=["codebook"])
    variables = {**variables, **mut}

    path = str(tmp_path / "3ep.ckpt")
    save_ckpoints(variables, variables, 3, 0, None, None, path,
                  async_save=False, include_optimizers=False)
    restored = load_ckpoints(path, istrain=False)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        variables["codebook"], restored["codebook"])


def test_ema_through_stacked_cps_step():
    """End-to-end: vq_cfg.ema flows through make_model -> the production
    stacked step updates the per-stage codebooks (and only with ema on)."""
    from vq_seg_tpu.losses import make_loss
    from vq_seg_tpu.models.networks import make_model
    from vq_seg_tpu.training.cps import (
        cps_init_phase,
        create_cps_state,
        make_cps_train_step_stacked,
        stack_cps_state,
    )

    rng = np.random.default_rng(0)
    l_img = jnp.asarray(rng.uniform(size=(2, 32, 32, 3)).astype(np.float32))
    l_tgt = jnp.asarray(rng.integers(0, 3, size=(2, 32, 32)).astype(np.int32))
    ul_img = jnp.asarray(rng.uniform(size=(2, 32, 32, 3)).astype(np.float32))

    changed = {}
    for ema in (False, True):
        model = make_model({"name": "vqreptunet1x1v2", "params": {
            "encoder_name": "resnet18", "num_classes": 3,
            "vq_cfg": {"num_embeddings": [0, 0, 4, 4, 4],
                       "distance": "euclidean", "kmeans_init": True,
                       "ema": ema, "decay": 0.8},
            "margin": 0.5, "scale": 30.0,
        }})
        tx = optax.adam(1e-3)
        dice = make_loss("dice_loss", 3, ignore_index=255)
        state = create_cps_state(model, tx, (l_img, l_tgt, 0.7))
        state = cps_init_phase(model, state, l_img, l_tgt, 0.7)
        state = stack_cps_state(state, tx)
        before = jax.tree_util.tree_map(
            np.asarray, state.variables_1["codebook"])
        step = make_cps_train_step_stacked(model, tx, dice, num_classes=3,
                                           confidence_threshold=0.7)
        new_state, metrics, _, _ = step(state, l_img, l_tgt, ul_img)
        assert np.isfinite(float(metrics["loss"]))
        after = jax.tree_util.tree_map(
            np.asarray, new_state.variables_1["codebook"])
        deltas = jax.tree_util.tree_map(
            lambda a, b: float(np.abs(a - b).max()), before, after)
        changed[ema] = max(jax.tree_util.tree_leaves(deltas))
    assert changed[False] == 0.0  # parity: frozen without ema
    assert changed[True] > 1e-6   # ema moves the codebooks
