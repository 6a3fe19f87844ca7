"""Packed checkpoint fetch + light snapshots (round-3 production-run fixes).

The production run at 448^2 exposed the tunneled device->host fetch as the
dominant checkpoint cost (~1.5 GB state, ~1000 leaves, 0.5-3 MB/s through
the axon relay — BASELINE.md round 3).  Fixes under test:

  * ``_to_host`` packs same-dtype leaves into ONE device array under jit
    and fetches once per dtype group (utils/ckpoints.py) — must be
    bit-exact vs the leaf-wise path for mixed shapes/dtypes.
  * ``fetch_ckpt_tree`` + ``save_ckpoints(prefetched=...)`` share one fetch
    between a snapshot and last.ckpt written in the same epoch.
  * ``include_optimizers=False`` (cfg.train.light_snapshots) writes
    model-only snapshots; ``load_ckpoints(istrain=True)`` on one raises a
    clear error pointing at last.ckpt.
"""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vq_seg_tpu.utils import ckpoints as ck


def _tree(scale=1):
    # mixed dtypes + shapes; total > _PACK_THRESHOLD_BYTES when scale big
    k = jax.random.PRNGKey(0)
    ks = jax.random.split(k, 4)
    return {
        "w": jax.random.normal(ks[0], (scale, 257, 33)),
        "b": jax.random.normal(ks[1], (129,)),
        "bf": jax.random.normal(ks[2], (scale, 64)).astype(jnp.bfloat16),
        "idx": jax.random.randint(ks[3], (scale, 7), 0, 100, jnp.int32),
        "step": jnp.int32(7),
        "py_scalar": 3,
    }


def test_packed_to_host_bit_exact():
    big = _tree(scale=1200)  # ~41 MB float32 -> packed path
    total = sum(l.nbytes for l in jax.tree_util.tree_leaves(big)
                if isinstance(l, jax.Array))
    assert total > ck._PACK_THRESHOLD_BYTES
    packed = ck._to_host(big)
    leafwise = jax.tree_util.tree_map(np.asarray, big)
    for p, l in zip(jax.tree_util.tree_leaves(packed),
                    jax.tree_util.tree_leaves(leafwise)):
        assert np.asarray(p).dtype == np.asarray(l).dtype
        np.testing.assert_array_equal(np.asarray(p), np.asarray(l))


def test_small_tree_stays_leafwise():
    small = _tree(scale=2)
    out = ck._to_host(small)
    for p, l in zip(jax.tree_util.tree_leaves(out),
                    jax.tree_util.tree_leaves(small)):
        np.testing.assert_array_equal(np.asarray(p), np.asarray(l))


def test_chunked_fetch_flat_bit_exact():
    """_fetch_flat pipelines ~32 MB chunks; the tail chunk overlaps
    (dynamic_slice clamps) — must reassemble bit-exactly for divisible,
    non-divisible, and sub-chunk sizes across dtypes."""
    import vq_seg_tpu.utils.ckpoints as ckm

    old = ckm._FETCH_CHUNK_BYTES
    ckm._FETCH_CHUNK_BYTES = 4096  # force many chunks on tiny arrays
    try:
        k = jax.random.PRNGKey(1)
        for dtype, size in ((jnp.float32, 1024), (jnp.float32, 5000),
                            (jnp.float32, 4096 // 4 * 3),  # sub-chunk
                            (jnp.bfloat16, 7001), (jnp.int32, 2048)):
            a = (jax.random.normal(k, (size,)).astype(dtype)
                 if dtype != jnp.int32
                 else jax.random.randint(k, (size,), 0, 1000, dtype))
            got = ckm._fetch_flat(a)
            np.testing.assert_array_equal(got, np.asarray(a))
    finally:
        ckm._FETCH_CHUNK_BYTES = old


def test_light_fetch_skips_optimizers():
    m1 = {"params": {"w": jnp.arange(6.0)}}
    m2 = {"params": {"w": jnp.arange(6.0) + 1}}
    o1 = {"mu": jnp.ones((4,))}
    light = ck.fetch_ckpt_tree(m1, m2, 3, 1, o1, o1, include_optimizers=False)
    assert "optimizer_1" not in light and "optimizer_2" not in light
    # a light prefetch cannot be written as a full contract
    with pytest.raises(ValueError, match="include_optimizers"):
        ck.save_ckpoints(m1, m2, 3, 1, o1, o1, "/tmp/never.ckpt",
                         async_save=False, prefetched=light)


def test_ckpt_cadence_decoupled():
    """cfg.train.last_every decouples the full-contract last.ckpt from
    light snapshots (training/cps.py::ckpt_cadence)."""
    from vq_seg_tpu.config import Config
    from vq_seg_tpu.training.cps import ckpt_cadence

    # reference defaults: last every epoch, snapshots every 10
    cfg = Config({"train": {}})
    assert ckpt_cadence(cfg, 3, 400) == (False, True, False)
    assert ckpt_cadence(cfg, 20, 400) == (True, True, False)

    # production validation profile: light snapshots at 100, full
    # last.ckpt only at the end
    cfg = Config({"train": {"ckpt_every": 100, "last_every": 400,
                            "light_snapshots": True}})
    assert ckpt_cadence(cfg, 100, 400) == (True, False, True)
    assert ckpt_cadence(cfg, 150, 400) == (False, False, True)
    assert ckpt_cadence(cfg, 399, 400) == (True, True, True)  # final: both


def test_prefetched_and_light_snapshots(tmp_path):
    m1 = {"params": {"w": jnp.arange(6.0).reshape(2, 3)}}
    m2 = {"params": {"w": jnp.arange(6.0).reshape(2, 3) + 1}}
    o1 = {"mu": jnp.ones((4,))}
    o2 = {"mu": jnp.ones((4,)) * 2}
    host = ck.fetch_ckpt_tree(m1, m2, 3, 1, o1, o2)
    snap = os.path.join(str(tmp_path), "0ep.ckpt")
    last = os.path.join(str(tmp_path), "last.ckpt")
    ck.save_ckpoints(m1, m2, 3, 1, o1, o2, snap, async_save=False,
                     prefetched=host, include_optimizers=False)
    ck.save_ckpoints(m1, m2, 3, 1, o1, o2, last, async_save=False,
                     prefetched=host)

    full = ck.load_full(last)
    assert set(full) == {"model_1", "model_2", "epoch", "batch_idx",
                         "optimizer_1", "optimizer_2"}
    np.testing.assert_array_equal(full["optimizer_2"]["mu"], np.ones((4,)) * 2)

    light = ck.load_full(snap)
    assert "optimizer_1" not in light and "optimizer_2" not in light
    np.testing.assert_array_equal(light["model_1"]["params"]["w"],
                                  np.arange(6.0).reshape(2, 3))
    # eval path works on a light snapshot...
    np.testing.assert_array_equal(
        np.asarray(ck.load_ckpoints(snap, istrain=False)["params"]["w"]),
        np.arange(6.0).reshape(2, 3))
    # ...resume refuses it with a pointer at last.ckpt
    with pytest.raises(ValueError, match="light"):
        ck.load_ckpoints(snap, istrain=True)
    # resume from last.ckpt unaffected
    _m2, ep, bi, _o1, _o2 = ck.load_ckpoints(last, istrain=True)
    assert int(ep) == 3 and int(bi) == 1


def test_latest_ckpt_auto_resume(tmp_path):
    """cfg.train.resume="auto" target resolution: newest run dir that has a
    ckpoints/last.ckpt wins; runs without one (including the fresh run dir
    the trainer just created) are skipped; empty/missing save_dir -> None."""
    assert ck.latest_ckpt(str(tmp_path / "nope")) is None
    assert ck.latest_ckpt(str(tmp_path)) is None

    for i, age in [(0, 100), (1, 50)]:
        d = tmp_path / f"proj_hybrid_{i}" / "ckpoints" / "last.ckpt"
        d.mkdir(parents=True)
        t = 1_700_000_000 - age
        os.utime(d, (t, t))
    # a fresh run dir with no checkpoint yet must not shadow older runs
    (tmp_path / "proj_hybrid_2" / "ckpoints").mkdir(parents=True)

    got = ck.latest_ckpt(str(tmp_path))
    assert got == str(tmp_path / "proj_hybrid_1" / "ckpoints" / "last.ckpt")
