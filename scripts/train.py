"""CLI trainer (reference train_vqreptunet1x1v2.py:276-282 surface).

    python scripts/train.py --config_path config/vqreptunet1x1v2.json

Dispatches on config: CPS semi-supervised for the flagship nets (default),
``--mode sup`` for supervised, ``--mode selfsup`` for VQ-VAE pretraining.
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from vq_seg_tpu.config import get_config_from_json  # noqa: E402


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--config_path", default="./config/vqreptunet1x1v2.json")
    parser.add_argument("--mode", default="cps", choices=["cps", "sup", "selfsup"])
    parser.add_argument("--max_steps_per_epoch", type=int, default=None)
    parser.add_argument("--data_parallel", action="store_true",
                        help="shard batches over all local devices")
    opt = parser.parse_args()
    cfg = get_config_from_json(opt.config_path)

    mesh = None
    if opt.data_parallel:
        from vq_seg_tpu.parallel import make_mesh

        mesh = make_mesh()

    if opt.mode == "cps":
        from vq_seg_tpu.training import cps

        cps.train(cfg, max_steps_per_epoch=opt.max_steps_per_epoch, mesh=mesh)
    elif opt.mode == "sup":
        from vq_seg_tpu.training import supervised

        supervised.train(cfg, max_steps_per_epoch=opt.max_steps_per_epoch, mesh=mesh)
    else:
        from vq_seg_tpu.training import selfsup

        selfsup.train(cfg, max_steps_per_epoch=opt.max_steps_per_epoch)


if __name__ == "__main__":
    main()
