"""Turnkey real-dataset parity gate (VERDICT r4 missing #1).

Every accuracy number in this repo was measured on rule-based synthetic
imagery because the reference's datasets (CWFID / IJRR2017 / rice_s_n_w —
/root/reference/data/dataset.py:15-62, sampling.py:10-72) are not present in
this environment.  This tool is the one-command gate to run THE MOMENT a
user mounts real data: reference-config training, the official
checkpoint-sweep evaluation, and the parity-bounds report, end to end.

Expected layout (the reference semi_sup_data contract, dataset.py:29-36):

    {data_dir}/train/input/*.png     all train images
    {data_dir}/train/target/*.png    masks for the LABELED subset only
                                     (input minus target = unlabeled split)
    {data_dir}/test/input/*.png
    {data_dir}/test/target/*.png
    mask pixels: 0=background, 128=weed, 255=crop (config pixel_to_label)

Usage:

    python tools/real_data_gate.py --data_dir /data/semi_sup_data/CWFID/num30 \
        [--config_path config/vqreptunet1x1v2.json] [--epochs 400] \
        [--expected_miou 0.61]        # the reference's measured mIoU, if known
        [--skip_train]                # sweep an existing run only

The gate: best-checkpoint test mIoU within +-0.2 of --expected_miou
(BASELINE.json north_star).  Without --expected_miou the report still runs
and records the absolute numbers for a later comparison.

Smoke test (synthetic data standing in for the real layout):
tests/test_config_and_tools.py::test_real_data_gate_smoke.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time
from glob import glob

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

GATE_BAND = 0.2  # BASELINE.json north_star: mIoU parity +-0.2


def validate_layout(data_dir, pixel_to_label):
    """Check the directory contract before burning hours of training."""
    problems = []
    counts = {}
    for split in ("train", "test"):
        inp = sorted(glob(os.path.join(data_dir, split, "input", "*.png")))
        tgt = sorted(glob(os.path.join(data_dir, split, "target", "*.png")))
        counts[split] = {"input": len(inp), "target": len(tgt)}
        if not inp:
            problems.append(f"{split}/input has no .png files")
        if not tgt:
            problems.append(f"{split}/target has no .png files")
        tgt_names = {os.path.basename(p) for p in tgt}
        inp_names = {os.path.basename(p) for p in inp}
        orphans = tgt_names - inp_names
        if orphans:
            problems.append(f"{split}/target has masks without images: "
                            f"{sorted(orphans)[:5]}...")
        if split == "test" and tgt_names != inp_names:
            problems.append("test/ must be fully labeled (target == input set)")
    if counts["train"]["target"] == counts["train"]["input"]:
        print("note: train/ is fully labeled — no unlabeled split; the CPS "
              "unsupervised branch will recycle labeled images")
    # sample one mask and verify the pixel alphabet
    masks = glob(os.path.join(data_dir, "train", "target", "*.png"))
    if masks:
        import numpy as np
        from PIL import Image

        vals = set(np.unique(np.asarray(Image.open(masks[0]).convert("L"))).tolist())
        allowed = {int(k) for k in pixel_to_label}
        if not vals <= allowed:
            problems.append(f"mask {os.path.basename(masks[0])} has pixel values "
                            f"{sorted(vals - allowed)} outside pixel_to_label "
                            f"{sorted(allowed)}")
    if problems:
        raise SystemExit("dataset layout invalid:\n  - " + "\n  - ".join(problems))
    return counts


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--data_dir", required=True)
    ap.add_argument("--config_path",
                    default=os.path.join(os.path.dirname(__file__), "..",
                                         "config", "vqreptunet1x1v2.json"))
    ap.add_argument("--epochs", type=int, default=None,
                    help="override cfg.train.num_epochs (default: config's 400)")
    ap.add_argument("--resize", type=int, default=None)
    ap.add_argument("--expected_miou", type=float, default=None,
                    help="reference-framework test mIoU on the same data; "
                         "gate = within +-0.2")
    ap.add_argument("--save_dir", default=None,
                    help="run output root (default {data_dir}/vq_seg_tpu_runs)")
    ap.add_argument("--skip_train", action="store_true",
                    help="only sweep checkpoints already in save_dir")
    ap.add_argument("--ckpt_every", type=int, default=None,
                    help="snapshot cadence (default: config / driver default)")
    args = ap.parse_args(argv)

    from vq_seg_tpu.config import get_config_from_json

    cfg = get_config_from_json(args.config_path)
    cfg.wandb_logging = False
    save_root = args.save_dir or os.path.join(args.data_dir, "vq_seg_tpu_runs")
    cfg.train.data_dir = args.data_dir
    cfg.train.save_dir = os.path.join(save_root, "train")
    cfg.test.data_dir = args.data_dir
    cfg.test.save_dir = os.path.join(save_root, "test")
    if args.epochs is not None:
        cfg.train.num_epochs = args.epochs
    if args.resize is not None:
        cfg.resize = args.resize
    if args.ckpt_every is not None:
        cfg.train.ckpt_every = args.ckpt_every

    counts = validate_layout(args.data_dir, cfg.pixel_to_label)
    n_lab = counts["train"]["target"]
    n_unlab = counts["train"]["input"] - n_lab
    print(f"dataset ok: {n_lab} labeled + {n_unlab} unlabeled train, "
          f"{counts['test']['input']} test")

    report = {"data_dir": args.data_dir, "config": os.path.abspath(args.config_path),
              "counts": counts, "epochs": int(cfg.train.num_epochs),
              "resize": cfg.resize}

    if not args.skip_train:
        from vq_seg_tpu.training import cps

        t0 = time.time()
        cps.train(cfg)
        report["train_wall_s"] = round(time.time() - t0, 1)

    runs = sorted(glob(os.path.join(cfg.train.save_dir, "*", "ckpoints")))
    if not runs:
        raise SystemExit(f"no checkpoint dirs under {cfg.train.save_dir}")
    ck_dir = runs[-1]
    from scripts.test import test as sweep

    cfg.test.weights = ck_dir
    t1 = time.time()
    best = sweep(cfg, save_img=False)
    report["sweep_wall_s"] = round(time.time() - t1, 1)
    if best is None:
        raise SystemExit("checkpoint sweep produced no result")
    report["best_ckpt"] = best[0]
    report.update({k: (round(float(v), 4) if k != "iou_by_class" else
                       [round(float(x), 4) for x in v])
                   for k, v in best[1].items()})
    if args.expected_miou is not None:
        delta = float(best[1]["test_miou"]) - args.expected_miou
        report["expected_miou"] = args.expected_miou
        report["delta"] = round(delta, 4)
        report["gate_band"] = GATE_BAND
        report["gate"] = "PASS" if abs(delta) <= GATE_BAND else "FAIL"
    out = os.path.join(save_root, "REAL_DATA_GATE.json")
    os.makedirs(save_root, exist_ok=True)
    with open(out, "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps(report))
    print(f"report -> {out}")
    return report


if __name__ == "__main__":
    main()
