"""Worker for the 2-process distributed test (tests/test_multiprocess.py).

Each process: 4 virtual CPU devices; jax.distributed.initialize against a
localhost coordinator; build the GLOBAL 8-device mesh; assemble the global
batch from this host's local slice (parallel/distributed.py
make_global_batch); run ONE stacked flagship CPS train step; dump a digest
of the (replicated) updated params for cross-process / vs-single-process
comparison.

Usage: python tests/_mp_worker.py <coordinator> <num_processes> <process_id> <out_json>
"""
import json
import os
import sys

os.environ.pop("PALLAS_AXON_POOL_IPS", None)
os.environ["XLA_FLAGS"] = ("--xla_force_host_platform_device_count=4"
                           # AVX2 cap so persistent-cache entries round-trip
                           # (see tests/conftest.py) + raised collective
                           # rendezvous timeouts for loaded hosts
                           " --xla_cpu_max_isa=AVX2"
                           " --xla_cpu_collective_timeout_seconds=900"
                           " --xla_cpu_collective_call_terminate_timeout_seconds=900")
os.environ["JAX_PLATFORMS"] = "cpu"

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# persistent compile cache shared with the suite: the 8-device GSPMD CPS
# program takes ~50 s to compile per worker; cached HLO makes repeat runs
# (and the driver dryrun's embedded smoke) near-instant
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(__file__), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np  # noqa: E402
import optax  # noqa: E402


def digest(tree):
    out = {}
    for path, leaf in jax.tree_util.tree_leaves_with_path(tree):
        key = jax.tree_util.keystr(path)
        out[key] = [float(np.sum(np.abs(np.asarray(leaf, dtype=np.float64)))),
                    list(np.shape(leaf))]
    return out


def main(coordinator, num_processes, process_id, out_json):
    from vq_seg_tpu.parallel.distributed import initialize, make_global_batch

    initialize(coordinator_address=coordinator, num_processes=num_processes,
               process_id=process_id)
    assert jax.process_count() == num_processes, jax.process_count()
    assert len(jax.devices()) == 4 * num_processes, len(jax.devices())

    import jax.numpy as jnp

    from vq_seg_tpu.losses import make_loss
    from vq_seg_tpu.models.networks import make_model
    from vq_seg_tpu.parallel import make_mesh
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

    # deterministic GLOBAL batch; this host contributes its contiguous slice
    rng = np.random.default_rng(7)
    g_img = rng.uniform(size=(8, 16, 16, 3)).astype(np.float32)
    g_tgt = rng.integers(0, 3, size=(8, 16, 16)).astype(np.int32)
    g_ul = rng.uniform(size=(8, 16, 16, 3)).astype(np.float32)
    lo = process_id * 4

    mesh = make_mesh(n_data=4 * num_processes, n_model=1, devices=jax.devices())

    # init runs replicated on identical host data on every process (same
    # seeds -> identical params); k-means init on the full global batch
    l_host = jnp.asarray(g_img)
    t_host = jnp.asarray(g_tgt)
    state = create_cps_state(model, tx, (l_host, t_host, 0.7))
    state = cps_init_phase(model, state, l_host, t_host, 0.7)
    state = stack_cps_state(state, tx)

    step = make_cps_train_step_stacked(model, tx, dice, num_classes=3,
                                       confidence_threshold=0.7)
    with mesh:
        li = make_global_batch(g_img[lo:lo + 4], mesh)
        ti = make_global_batch(g_tgt[lo:lo + 4], mesh)
        ui = make_global_batch(g_ul[lo:lo + 4], mesh)
        new_state, metrics, _, _ = step(state, li, ti, ui)
        jax.block_until_ready(new_state.variables_1["params"])

    out = dict(process_id=process_id,
               loss=float(metrics["loss"]), miou=float(metrics["miou"]),
               params=digest(new_state.variables_1["params"]))
    with open(out_json, "w") as f:
        json.dump(out, f)
    print(f"worker {process_id} ok loss={out['loss']:.6f}")


if __name__ == "__main__":
    main(sys.argv[1], int(sys.argv[2]), int(sys.argv[3]), sys.argv[4])
