"""Multi-seed accuracy gate for the throughput decoder variants.

VERDICT r3 weak #1 / next-round #4: the round-3 "equal accuracy" claims for
the narrow decoder plan and the subpixel tail rested on 3 seeds of the
rule-based argmax-RGB synthetic set — a ±0.03 band certifying a +0.006
mean.  This gate:

  * runs >=8 seeds per variant,
  * on TWO families (tools/synthetic_data.py): the legacy ``argmax`` set
    and the hard ``weedfield`` set (texture-defined classes, CWFID-like
    imbalance, occlusion, native-scale rendering) where the argmax-RGB
    shortcut scores ~0.58 instead of 1.0,
  * and reports paired per-seed test-mIoU deltas vs the reference plan
    with mean / band / sign counts.

TPU-first: all seeds train SIMULTANEOUSLY — per-seed states are stacked on
a leading axis and the whole (epochs-scan of the CPS step) is ``jax.vmap``ed
over it, so 8 seeds compile once and cost barely more than one run
(resnet18 at 64^2 is tiny next to the chip).

    python tools/accuracy_gate.py --family weedfield --seeds 8 --epochs 150
"""
from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax
import jax.numpy as jnp
import numpy as np
import optax

VARIANTS = {
    "reference": {},
    "dec_256": {"decoder_channels": [256, 128, 64, 48, 32]},
    "dec_256_subpixel": {"decoder_channels": [256, 128, 64, 48, 32],
                         "subpixel_tail": True},
}


def run_variant(name, extra, data_per_seed, seeds, epochs):
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

    params = {"encoder_name": "resnet18", "num_classes": 3,
              "vq_cfg": {"num_embeddings": [0, 0, 8, 8, 8],
                         "distance": "euclidean", "kmeans_init": True},
              "margin": 0.5, "scale": 30.0, **extra}
    model = make_model({"name": "vqreptunet1x1v2", "params": params})
    tx = optax.adam(1e-4)
    dice = make_loss("dice_loss", 3, ignore_index=255)
    step = make_cps_train_step_stacked(model, tx, dice, num_classes=3,
                                       confidence_threshold=0.7, remat=False)

    # per-seed state init (host loop: init is one-off and cheap), then
    # stack every leaf on a leading seed axis
    states, ls, gs, us = [], [], [], []
    for s in seeds:
        (l_img, l_gt), ul_img, _ = data_per_seed[s]
        jl, jg, ju = map(jnp.asarray, (l_img, l_gt, ul_img))
        st = create_cps_state(model, tx, (jl, jg, 0.7), rngs_seed=s)
        st = cps_init_phase(model, st, jl, jg, 0.7, seed=s)
        states.append(stack_cps_state(st, tx))
        ls.append(jl), gs.append(jg), us.append(ju)
    vstate = jax.tree_util.tree_map(lambda *a: jnp.stack(a), *states)
    vl, vg, vu = jnp.stack(ls), jnp.stack(gs), jnp.stack(us)

    def train_one(state, l, g, u):
        def body(s, _):
            s, m, _, _ = step(s, l, g, u)
            return s, m["miou"]
        s, mious = jax.lax.scan(body, state, None, length=epochs)
        return s, mious[-1]

    trained, train_miou = jax.jit(jax.vmap(train_one))(vstate, vl, vg, vu)

    # eval: batch the per-seed test sets through a vmapped forward
    t_imgs = jnp.stack([jnp.asarray(data_per_seed[s][2][0]) for s in seeds])
    t_gts = np.stack([data_per_seed[s][2][1] for s in seeds])

    def eval_one(state, imgs):
        v1, _ = unstack_cps_state(state)
        return model.apply(v1, imgs, train=False)[0]

    preds = jax.jit(jax.vmap(eval_one))(trained, t_imgs)
    test_mious = []
    for i, s in enumerate(seeds):
        conf = confusion_matrix(preds[i], jnp.asarray(t_gts[i]), num_classes=3)
        test_mious.append(float(miou(conf)[0]))
    return {"train_miou": np.asarray(train_miou).round(4).tolist(),
            "test_miou": [round(m, 4) for m in test_mious]}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--family", default="weedfield",
                    choices=["argmax", "weedfield"])
    ap.add_argument("--seeds", type=int, default=8)
    ap.add_argument("--epochs", type=int, default=150)
    ap.add_argument("--hw", type=int, default=64)
    ap.add_argument("--variants", default=",".join(VARIANTS))
    args = ap.parse_args()

    from tools.synthetic_data import make_argmax, make_weedfield

    gen = make_weedfield if args.family == "weedfield" else make_argmax
    seeds = list(range(args.seeds))
    data = {s: gen(hw=args.hw, seed=s, n_lab=8, n_unlab=8, n_test=8)
            for s in seeds}

    results = {}
    for name in args.variants.split(","):
        results[name] = run_variant(name, VARIANTS[name], data, seeds,
                                    args.epochs)
        print(json.dumps({name: results[name]}), flush=True)

    report = {"family": args.family, "hw": args.hw, "epochs": args.epochs,
              "seeds": args.seeds, "results": results}
    if "reference" in results:
        ref = np.array(results["reference"]["test_miou"])
        report["paired_deltas"] = {}
        for name in results:
            if name == "reference":
                continue
            d = np.array(results[name]["test_miou"]) - ref
            report["paired_deltas"][name] = {
                "per_seed": d.round(4).tolist(),
                "mean": round(float(d.mean()), 4),
                "min": round(float(d.min()), 4),
                "max": round(float(d.max()), 4),
                "n_worse": int((d < 0).sum()), "n_better": int((d > 0).sum()),
            }
    print(json.dumps(report, indent=1))
    out = f"/tmp/accuracy_gate_{args.family}.json"
    with open(out, "w") as f:
        json.dump(report, f, indent=1)
    print("wrote", out)


if __name__ == "__main__":
    main()
