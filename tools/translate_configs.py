"""Translate the reference experiment-config zoo to the repo schema.

The reference's capability envelope is encoded in its 40 active config files
(/root/reference/config/*.json — datasets x percent splits x network
variants).  This tool regenerates config/*.json from them so every reference
experiment has a runnable counterpart:

  * content is preserved verbatim (model name/params, resize, epochs, batch,
    LR schedule, loss weights, wandb lists, ...) — paths are the exceptions:
    save dirs move under ./runs/ (the reference wrote to a mounted GDrive);
  * ``criterion`` is normalised to the ``{"name": ...}`` dict form (the
    reference mixes bare strings and dicts across configs; the repo loader
    reads ``criterion.name``);
  * a top-level ``"mode"`` key records the trainer family that consumed the
    config in the reference (the deprecated/ trainer-zoo script it was run
    with — scripts/train.py defaults --mode from it);
  * family-specific knob renames are mapped where the repo factored them
    into model params (vqashv2's seghead-commit/angular weight ratio).

Run:  python tools/translate_configs.py  [--ref /root/reference/config]
"""
from __future__ import annotations

import argparse
import json
import os

# config stem -> trainer mode (scripts/train.py).  Derived from which
# reference trainer script consumed each config family:
#   sup       deprecated/train_sup.py, only_supervised_train.py, train_obia.py
#   plaincps  deprecated/train_CPS.py, train_match.py (similarity-transform
#             variant of plain CPS), train_vqatunet.py, train_drsavqunet.py,
#             train_vqseghead.py, ...
#   objcps    deprecated/train_with_test_object_loss.py
#   vqpt      deprecated/train_vq_pt_unet.py, train_vqash.py, train_vqash_v2.py
#   reptcps   deprecated/train_with_test_pt_pseudo_entropy_reg.py family
#   cps       train_vqreptunet1x1v2.py (the active flagship)
MODE = {
    "CWFID_Unet": "sup",
    "IJRR2017_Unet": "sup",
    "rice_s_n_w_Unet": "sup",
    "only_sup_kmeans": "sup",
    "obia_CWFID": "sup",
    "cps_vqv2": "plaincps",
    "cps_vqv2_kmeans_init": "plaincps",
    "cps_vqv2_kmeans_with_imagenet_weights": "plaincps",
    "cps_vqv2_match": "plaincps",
    "drsavqunet": "plaincps",
    "vq_": "plaincps",
    "vqatunet": "plaincps",
    "vqcanet": "plaincps",
    "vqcanet_convnext": "plaincps",
    "vqcanetv2": "plaincps",
    "vqcanetv3": "plaincps",
    "vqcanetv4": "plaincps",
    "vqpatchunet": "plaincps",
    "vqsegheadnet": "plaincps",
    "vqcanet_obj_loss": "objcps",
    "vqimdbnet": "objcps",
    "semiweednet": "semiweed",
    "sup_con_loss": "supconcps",
    "vq_eu_pt_unet": "vqpt",
    "vq_nedpt_unet": "vqpt",
    "vq_pt_unet": "vqpt",
    "vqash": "vqpt",
    "vqash_deep": "vqpt",
    "vqashv2": "vqpt",
    "vq_pt_unet_easyhard": "easyhard",
    "vqreptunet": "reptcps",
    "vqreptunet1x1": "reptcps",
    "vqreptunet1x1_IJRR2017": "reptcps",
    "vqreptunet1x1_rice_s_n_w": "reptcps",
    "vqreptunetdouble1x1": "reptcps",
    "vqretemptunet": "reptcps",
    "vqreeuptunet": "reptcps",
    "vqreptunetangular": "reptcps",
    "vqreptunet1x1v2": "cps",
    "vqreptunetangularv3": "angularv3",
}


def translate(ref: dict, stem: str) -> dict:
    out = {"mode": MODE[stem]}
    out.update(json.loads(json.dumps(ref)))  # deep copy, preserve order
    train = out["train"]

    crit = train.get("criterion")
    if isinstance(crit, str):
        train["criterion"] = {"name": crit}

    ds = os.path.basename(os.path.dirname(train["data_dir"].rstrip("/"))) or "runs"
    train["save_dir"] = f"./runs/{ds}"
    test = out.get("test")
    if test:
        test["save_dir"] = f"./runs/{ds}_test"
        test["weights"] = f"./runs/{ds}/"

    if stem == "obia_CWFID":
        # train_obia.py read OBIADataset over the same dir layout
        train["dataset"] = "obia"
    if stem == "vqashv2":
        # the repo folds the v2 head's commitment pull into the angular loss
        # at a configurable ratio; the driver then applies the angular weight
        aw = float(train.get("total_angular_loss_weight", 1) or 1)
        scw = float(train.get("total_seghead_commit_loss_weight", 1) or 1)
        out["model"]["params"]["seghead_commit_weight"] = scw / aw
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ref", default="/root/reference/config")
    ap.add_argument("--out", default=os.path.join(os.path.dirname(__file__), "..", "config"))
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)
    n = 0
    for fn in sorted(os.listdir(args.ref)):
        if not fn.endswith(".json"):
            continue
        stem = fn[:-5]
        if stem not in MODE:
            raise SystemExit(f"no mode mapping for {fn}")
        with open(os.path.join(args.ref, fn)) as f:
            ref = json.load(f)
        out = translate(ref, stem)
        with open(os.path.join(args.out, fn), "w") as f:
            json.dump(out, f, indent=2)
            f.write("\n")
        n += 1
    print(f"translated {n} configs -> {os.path.abspath(args.out)}")


if __name__ == "__main__":
    main()
