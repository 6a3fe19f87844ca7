"""Long-run learning-loop validation on the real TPU: the PRODUCTION
cps.train() driver end-to-end (RAM-cached loader, checkpoint cadence,
official-protocol test probes) on the rule-based synthetic set (class =
argmax of smoothed RGB — the BASELINE.md sanity data), for hundreds of
epochs.

    python tools/synthetic_convergence.py [--epochs 300] [--hw 64]

Writes the dataset to a temp dir as PNGs so the whole input pipeline is
exercised, then reports the final train/test mIoU trajectory summary.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
from PIL import Image


def write_dataset(root, hw, n_lab=6, n_unlab=6, n_test=6):
    from tools.parity_run import make_synthetic

    import tools.parity_run as pr

    old_hw = pr.HW
    pr.HW = hw
    try:
        (l_img, l_gt), ul_img, (t_img, t_gt) = make_synthetic(n_lab, n_unlab, n_test)
    finally:
        pr.HW = old_hw
    # pixel values 0/128/255 per the reference mask contract
    lut = np.asarray([0, 128, 255], np.uint8)
    for split in ("train", "test"):
        os.makedirs(f"{root}/{split}/input", exist_ok=True)
        os.makedirs(f"{root}/{split}/target", exist_ok=True)
    for i in range(l_img.shape[0]):
        Image.fromarray((l_img[i] * 255).astype(np.uint8)).save(f"{root}/train/input/lab{i}.png")
        Image.fromarray(lut[l_gt[i]], mode="L").save(f"{root}/train/target/lab{i}.png")
    for i in range(ul_img.shape[0]):
        Image.fromarray((ul_img[i] * 255).astype(np.uint8)).save(f"{root}/train/input/unl{i}.png")
    for i in range(t_img.shape[0]):
        Image.fromarray((t_img[i] * 255).astype(np.uint8)).save(f"{root}/test/input/t{i}.png")
        Image.fromarray(lut[t_gt[i]], mode="L").save(f"{root}/test/target/t{i}.png")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=300)
    ap.add_argument("--hw", type=int, default=64)
    args = ap.parse_args()

    from vq_seg_tpu.config import Config
    from vq_seg_tpu.training import cps

    root = tempfile.mkdtemp(prefix="synth_conv_")
    write_dataset(root, args.hw)
    cfg = Config({
        "project_name": "synth_convergence", "wandb_logging": False,
        "num_classes": 3, "pixel_to_label": {"0": 0, "128": 1, "255": 2},
        "resize": args.hw,
        "model": {"name": "vqreptunet1x1v2", "params": {
            "encoder_name": "resnet18", "num_classes": 3,
            "vq_cfg": {"num_embeddings": [0, 0, 8, 8, 8],
                       "distance": "euclidean", "kmeans_init": True},
            "margin": 0.5, "scale": 30.0}},
        "train": {"data_dir": root, "save_dir": os.path.join(root, "runs"),
                  "num_epochs": args.epochs, "batch_size": 2,
                  "learning_rate": 1e-4,
                  "lr_scheduler": {"name": "cosineannealing", "min_lr": 1e-7,
                                   "warmup_steps": 0},
                  "half": True, "criterion": {"name": "dice_loss"},
                  "cps_loss_weight": 1, "total_commitment_loss_weight": 1,
                  "total_prototype_loss_weight": 0.01,
                  "confidence_threshold": 0.7, "save_img": False,
                  "save_txt": True, "test_every": 25,
                  # the tunneled chip makes the 270MB device->host state
                  # fetch the dominant per-epoch cost — relax the last.ckpt
                  # cadence (the 10-epoch snapshots still happen)
                  "ckpt_every": 50},
        "test": {"data_dir": root, "save_dir": os.path.join(root, "testout"),
                 "batch_size": 1, "weights": None},
    })
    state = cps.train(cfg)
    runs = os.listdir(os.path.join(root, "runs"))
    run_dir = os.path.join(root, "runs", runs[0])
    ck = os.path.join(run_dir, "ckpoints", "last.ckpt")
    print(json.dumps({"run_dir": run_dir, "last_ckpt": os.path.isdir(ck),
                      "epochs": args.epochs}))


if __name__ == "__main__":
    main()
