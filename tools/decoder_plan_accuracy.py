"""Equal-accuracy check for the narrow decoder plan (VERDICT #6: "measure an
equal-accuracy narrower plan behind a config flag, defaults unchanged").

Trains the flagship CPS loop on the rule-based synthetic set (the
BASELINE.md learning-loop sanity data: class = argmax of smoothed RGB) with
the reference decoder plan vs the narrow plans, and reports final train/test
mIoU side by side.

    python tools/decoder_plan_accuracy.py [--epochs 60]
"""
from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np
import optax

# persistent compile cache shared with the test suite: the three variant
# programs are shape-identical across seeds, so every seed after the first
# runs compile-free (the multi-seed gate spawns one process per seed).
# AVX2 cap so XLA:CPU cache entries pass the load-time host-feature check
# (see tests/conftest.py) — set before the backend client is created.
if "xla_cpu_max_isa" not in os.environ.get("XLA_FLAGS", ""):
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                               + " --xla_cpu_max_isa=AVX2").strip()
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "..", "tests", ".jax_cache"))
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=60)
    ap.add_argument("--hw", type=int, default=64)
    ap.add_argument("--only", default=None,
                    help="comma-separated variant names to run")
    ap.add_argument("--seed", type=int, default=0,
                    help="init + data seed (run several for a noise band)")
    args = ap.parse_args()

    import tools.parity_run as pr
    from vq_seg_tpu.losses import make_loss
    from vq_seg_tpu.metrics.measurement import confusion_matrix, miou
    from vq_seg_tpu.models.networks import make_model
    from vq_seg_tpu.training.cps import (
        cps_init_phase,
        create_cps_state,
        make_cps_train_step_stacked,
        stack_cps_state,
        unstack_cps_state,
    )

    old_hw = pr.HW
    pr.HW = args.hw
    try:
        (l_img, l_gt), ul_img, (t_img, t_gt) = pr.make_synthetic(seed=args.seed)
    finally:
        pr.HW = old_hw
    jl, jg, ju = map(jnp.asarray, (l_img, l_gt, ul_img))

    plans = {
        "reference (enc//2 reversed)": None,
        "dec_512": (512, 256, 128, 64, 32),
        "dec_256": (256, 128, 64, 48, 32),
        # round-3 lever: same channel plan, tail block in subpixel space
        # (modules/decoder.py::UnetDecoder.subpixel_tail; +9.2% at 512^2)
        "subpixel_tail": "subpixel",
        # the tuned-profile candidate: narrow plan + subpixel tail together
        "dec_256_subpixel": ((256, 128, 64, 48, 32), "subpixel"),
    }
    results = {}
    for name, plan in plans.items():
        if args.only and name not in args.only.split(","):
            continue
        params = {"encoder_name": "resnet18", "num_classes": 3,
                  "vq_cfg": {"num_embeddings": [0, 0, 8, 8, 8],
                             "distance": "euclidean", "kmeans_init": True},
                  "margin": 0.5, "scale": 30.0}
        if plan == "subpixel":
            params["subpixel_tail"] = True
        elif isinstance(plan, tuple) and plan and plan[-1] == "subpixel":
            params["decoder_channels"] = list(plan[0])
            params["subpixel_tail"] = True
        elif plan is not None:
            params["decoder_channels"] = list(plan)
        model = make_model({"name": "vqreptunet1x1v2", "params": params})
        tx = optax.adam(1e-4)
        dice = make_loss("dice_loss", 3, ignore_index=255)
        state = create_cps_state(model, tx, (jl, jg, 0.7),
                                 rngs_seed=args.seed)
        state = cps_init_phase(model, state, jl, jg, 0.7)
        state = stack_cps_state(state, tx)
        step = make_cps_train_step_stacked(model, tx, dice, num_classes=3,
                                           confidence_threshold=0.7, remat=False)
        m = None
        for _ in range(args.epochs):
            state, m, _, _ = step(state, jl, jg, ju)
        v1, _ = unstack_cps_state(state)
        test_ms = []
        for i in range(t_img.shape[0]):
            pred = model.apply(v1, jnp.asarray(t_img[i:i + 1]), train=False)[0]
            conf = confusion_matrix(pred, jnp.asarray(t_gt[i:i + 1]), num_classes=3)
            test_ms.append(float(miou(conf)[0]))
        results[name] = {"train_miou": round(float(m["miou"]), 4),
                         "test_miou": round(float(np.mean(test_ms)), 4),
                         "final_loss": round(float(m["loss"]), 4)}
        print(json.dumps({name: results[name]}), flush=True)
    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
