"""CLI trainer (reference train_vqreptunet1x1v2.py:276-282 surface).

    python scripts/train.py --config_path config/vqreptunet1x1v2.json

Modes (the reference's trainer-script envelope as one CLI):
  cps        flagship confidence-masked CPS (train_vqreptunet1x1v2.py)
  sup        supervised (deprecated/train_sup.py)
  selfsup    VQ-VAE codebook pretraining (deprecated/self_sup_train.py)
  plaincps   plain CPS (deprecated/train_CPS.py)
  unimatch   UniMatch (deprecated/train_UniMatch.py)
  salientcps CPS + saliency aux decoders (deprecated/train_salient_loss.py)
  vqpt       (x, gt) prototype-net CPS, optional VQ-VAE-pretrained frozen
             encoder via cfg.train.pretrained (deprecated/train_vq_pt_unet.py)
  angularv3  angular-head self-training CPS with the per-epoch unreliable
             threshold ramp (deprecated/train_angularv3.py)
  easyhard   easy-view pseudo labels, CutMix'd hard training views
             (deprecated/train_vqpt_easyhard_aug.py)
  objcps     plain CPS + binary object loss (train_with_test_object_loss.py)
  supconcps  CPS + labeled supervised-contrastive aux (train_supcon_unet.py)
  semiweed   SemiWeedNet contrastive semi-sup (semiweednet_train.py)
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from vq_seg_tpu.config import get_config_from_json  # noqa: E402


def resolve_mesh(cfg, data_parallel=False, per_device_batch=False,
                 pair_parallel=False, spatial=1, devices=None):
    """Build the training mesh from the CLI parallelism flags.

    Returns None when no parallelism was requested.  With
    ``per_device_batch`` the config's ``batch_size`` is treated as
    PER-DEVICE (the TPU-native convention) and scaled in place to the
    global batch; otherwise the data axis is clamped to
    gcd(batch, devices) so the reference's batch-4 configs run (with idle
    chips + a warning) instead of crashing on jax's divisibility rule.
    ``spatial`` > 1 additionally shards image ROWS over a ``space`` mesh
    axis (GSPMD halo-exchange convs) — chips = data x model x space.
    """
    if not (data_parallel or pair_parallel or spatial > 1):
        return None
    import math

    import jax

    from vq_seg_tpu.parallel import make_mesh

    devices = list(devices if devices is not None else jax.devices())
    n_dev = len(devices)
    n_model = 2 if pair_parallel else 1
    n_space = max(1, int(spatial))
    if n_space > 1:
        resize = cfg.resize if isinstance(cfg.resize, int) else cfg.resize[0]
        if resize % n_space:
            raise SystemExit(f"--spatial {n_space} must divide resize {resize}")
        if n_space * n_model > n_dev:
            raise SystemExit(f"--spatial {n_space} x model {n_model} needs "
                             f"more than the {n_dev} visible devices")
    avail = n_dev // (n_model * n_space)
    if pair_parallel and avail < 1:
        raise SystemExit("--pair_parallel needs >= 2 devices")
    if not data_parallel:
        n_data = 1
    elif per_device_batch:
        # TPU-native semantics: batch_size is per-device; global batch
        # scales with the mesh so no chip idles
        n_data = avail
        cfg.train.batch_size = int(cfg.train.batch_size) * n_data
        print(f"--per_device_batch: global batch = {cfg.train.batch_size} "
              f"over {n_data} data-axis devices")
    else:
        # the data axis must divide the global batch (jax sharding rule);
        # clamp to gcd(batch, devices) and warn about idle chips rather
        # than crash on the reference's batch-4 configs
        n_data = math.gcd(int(cfg.train.batch_size), avail)
        if n_data * n_model < n_dev:
            print(f"--data_parallel: batch {cfg.train.batch_size} shards "
                  f"over {n_data} of {avail} devices (data axis must "
                  f"divide the batch; use --per_device_batch or raise "
                  f"batch_size to use all chips)")
    return make_mesh(n_data=n_data, n_model=n_model, n_space=n_space,
                     devices=devices[:n_data * n_model * n_space])


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--config_path", default="./config/vqreptunet1x1v2.json")
    parser.add_argument("--mode", default=None,
                        choices=["cps", "sup", "selfsup", "plaincps", "unimatch",
                                 "salientcps", "vqpt", "reptcps", "angularv3",
                                 "easyhard", "objcps", "supconcps", "semiweed"],
                        help="trainer family; defaults to the config's "
                             "top-level \"mode\" key, else cps")
    parser.add_argument("--max_steps_per_epoch", type=int, default=None)
    parser.add_argument("--data_parallel", action="store_true",
                        help="shard batches over all local devices")
    parser.add_argument("--per_device_batch", action="store_true",
                        help="with --data_parallel: treat cfg.train.batch_size "
                             "as PER-DEVICE (global batch = batch_size x "
                             "n_data, the TPU-native convention) so every "
                             "chip is used regardless of the config's batch")
    parser.add_argument("--zero", action="store_true",
                        help="with --data_parallel: ZeRO-1 — shard the Adam "
                             "moments over the data axis instead of "
                             "replicating them (parallel/zero.py)")
    parser.add_argument("--pair_parallel", action="store_true",
                        help="cps mode: place each CPS model on its own "
                             "device group (model axis of 2, shard_map pair "
                             "step); composes with --data_parallel")
    parser.add_argument("--spatial", type=int, default=1,
                        help="shard image ROWS over N devices (GSPMD "
                             "halo-exchange convs) — use chips beyond what "
                             "the batch can fill, or fit a resize too large "
                             "for one chip's HBM; composes with "
                             "--data_parallel / --pair_parallel "
                             "(chips = data x model x space)")
    parser.add_argument("--trace", default=None, metavar="DIR",
                        help="capture a jax.profiler trace of the run into "
                             "DIR (view with TensorBoard / xprof; keep "
                             "num_epochs small — trace whole-run)")
    opt = parser.parse_args()
    cfg = get_config_from_json(opt.config_path)
    if opt.zero:
        cfg.train.zero_opt = True
    if opt.mode is None:
        # the shipped config zoo carries its trainer family (config/*.json
        # "mode"); explicit --mode always wins
        opt.mode = cfg.get("mode") or "cps"

    mesh = resolve_mesh(cfg, data_parallel=opt.data_parallel,
                        per_device_batch=opt.per_device_batch,
                        pair_parallel=opt.pair_parallel,
                        spatial=opt.spatial)

    def run():
        if opt.mode == "cps":
            from vq_seg_tpu.training import cps

            cps.train(cfg, max_steps_per_epoch=opt.max_steps_per_epoch, mesh=mesh)
        elif opt.mode == "sup":
            from vq_seg_tpu.training import supervised

            supervised.train(cfg, max_steps_per_epoch=opt.max_steps_per_epoch, mesh=mesh)
        elif opt.mode == "selfsup":
            from vq_seg_tpu.training import selfsup

            selfsup.train(cfg, max_steps_per_epoch=opt.max_steps_per_epoch)
        else:
            from vq_seg_tpu.training import variant_drivers

            fn = {"plaincps": variant_drivers.train_plain_cps,
                  "unimatch": variant_drivers.train_unimatch,
                  "salientcps": variant_drivers.train_salient_cps,
                  "vqpt": variant_drivers.train_vqpt_cps,
                  "reptcps": variant_drivers.train_rept_cps,
                  "angularv3": variant_drivers.train_angularv3_cps,
                  "easyhard": variant_drivers.train_easyhard_cps,
                  "objcps": variant_drivers.train_obj_cps,
                  "supconcps": variant_drivers.train_supcon_cps,
                  "semiweed": variant_drivers.train_semiweed}[opt.mode]
            fn(cfg, max_steps_per_epoch=opt.max_steps_per_epoch, mesh=mesh)

    if opt.trace:
        from vq_seg_tpu.utils.profiling import trace

        with trace(opt.trace):
            run()
        print(f"profiler trace written to {opt.trace}")
    else:
        run()


if __name__ == "__main__":
    main()
