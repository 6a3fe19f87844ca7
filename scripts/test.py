"""CLI evaluator (reference test_detailviz.py:31-169 surface).

    python scripts/test.py --config_path config/X.json

Behaviour parity (SURVEY.md §3.4): ``cfg.test.weights`` may be ONE
checkpoint or a DIRECTORY — directories are swept and the best test-mIoU
checkpoint wins (test_detailviz.py:60-72).  Per image (batch 1): forward,
take tuple[0], bilinear-resize the score map to the native mask size, score
with confusion-matrix acc/mIoU/per-class IoU/P/R/F1, and emit TP/FP detail
visualisations + results.txt.
"""
from __future__ import annotations

import argparse
import os
import sys
from glob import glob

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from vq_seg_tpu.config import get_config_from_json  # noqa: E402
from vq_seg_tpu.data import BaseDataset, Loader  # noqa: E402
from vq_seg_tpu.metrics import Measurement  # noqa: E402
from vq_seg_tpu.models.networks import make_model  # noqa: E402
from vq_seg_tpu.models.layers import resize_bilinear  # noqa: E402
from vq_seg_tpu.utils import visualize  # noqa: E402
from vq_seg_tpu.utils.ckpoints import load_full  # noqa: E402
from vq_seg_tpu.utils.seg_tools import img_to_label  # noqa: E402


def _restore_model_vars(path):
    ck = load_full(path)
    return ck.get("model_1", ck)


def make_forward(model):
    """ONE jitted eval forward shared across a whole checkpoint sweep.

    Building this inside the per-checkpoint loop re-traces and re-compiles
    for every ``.ckpt`` (a fresh ``jax.jit`` object has an empty cache) —
    ~45 s/compile through a tunneled chip, ~30 min of pure recompiles on a
    40-checkpoint directory sweep (reference sweep semantics
    test_detailviz.py:60-72).  Same fix as training/cps.py make_eval_fn."""

    @jax.jit
    def forward(vs, img):
        out = model.apply(vs, img, train=False)
        return out[0] if isinstance(out, tuple) else out

    return forward


def test_loop(cfg, model, weights_path, measurement, save_dir=None, save_img=False,
              use_crf=False, forward=None):
    test_dataset = BaseDataset(os.path.join(cfg.test.data_dir, "test"), "labelled",
                               batch_size=1, resize=cfg.resize, target_resize=False)
    loader = Loader(test_dataset, 1, shuffle=False)
    try:
        variables = _restore_model_vars(weights_path)
    except Exception as e:  # corrupt checkpoint -> skip (test_detailviz.py:88-92)
        print(f"skip {weights_path}: {e}")
        return None

    if forward is None:
        forward = make_forward(model)

    crf = None
    if use_crf:
        # dense-CRF refinement before scoring (reference deprecated/test _crf.py)
        from vq_seg_tpu.utils.crf import DenseCRF

        crf = DenseCRF()

    sums = np.zeros(6)
    iou_sums = None
    n = 0
    img_rows = []
    for batch in loader:
        img = jnp.asarray(batch["img"])
        mask = np.asarray(batch["target"])  # native size
        pred = forward(variables, img)
        if pred.shape[1:3] != mask.shape[1:3]:
            pred = resize_bilinear(pred, mask.shape[1:3])
        if crf is not None:
            img_full = (img if img.shape[1:3] == mask.shape[1:3]
                        else resize_bilinear(img, mask.shape[1:3]))
            prob = jax.nn.softmax(pred[0], axis=-1)
            pred = crf(img_full[0], prob)[None]
        label = np.asarray(img_to_label(jnp.asarray(mask), cfg.pixel_to_label))
        acc, miou_v, iou_list, precision_v, recall_v, f1 = measurement.measure(
            np.asarray(pred), label)
        sums += np.array([acc, miou_v, precision_v, recall_v, f1, 0.0])
        iou_sums = np.array(iou_list) if iou_sums is None else iou_sums + np.array(iou_list)
        n += 1
        if save_img and save_dir is not None:
            viz1, viz2 = visualize.make_test_detailed_img(
                np.asarray(img if img.shape[1:3] == mask.shape[1:3]
                           else resize_bilinear(img, mask.shape[1:3])),
                np.asarray(pred), label)
            img_rows.append((batch["filename"][0], viz1[::2, ::2], viz2[::2, ::2]))
    result = dict(test_acc=sums[0] / n, test_miou=sums[1] / n,
                  test_precision=sums[2] / n, test_recall=sums[3] / n,
                  test_f1score=sums[4] / n,
                  iou_by_class=(iou_sums / n).tolist())
    if save_dir is not None:
        os.makedirs(save_dir, exist_ok=True)
        with open(os.path.join(save_dir, "results.txt"), "a") as f:
            f.write(f"{weights_path}\n" + "".join(
                f"  {k}: {v}\n" for k, v in result.items()))
        if save_img:
            img_dir = os.path.join(save_dir, "imgs")
            os.makedirs(img_dir, exist_ok=True)
            for fn, v1, v2 in img_rows:
                stem, ext = os.path.splitext(fn)
                visualize.save_img(img_dir, stem + "_v1" + ext, v1)
                visualize.save_img(img_dir, stem + "_v2" + ext, v2)
    return result


def test(cfg, save_img=None, use_crf=False):
    model = make_model(cfg.model)
    measurement = Measurement(cfg.num_classes)
    weights = cfg.test.weights
    run_name = os.path.basename(os.path.normpath(weights))
    save_dir = os.path.join(cfg.test.save_dir, run_name)
    save_img = cfg.test.get("save_img", True) if save_img is None else save_img

    if os.path.isdir(weights) and not os.path.exists(os.path.join(weights, "_METADATA")):
        candidates = sorted(glob(os.path.join(weights, "*.ckpt")))
    else:
        candidates = [weights]
    logger = None
    if cfg.get("wandb_logging"):
        from vq_seg_tpu.utils.logger import TestLogger, dict_to_table_log

        logger = TestLogger(cfg, run_name, offline_dir=save_dir)
    best = None
    forward = make_forward(model)  # compile ONCE for the whole sweep
    for ck in candidates:
        res = test_loop(cfg, model, ck, measurement, save_dir=save_dir, save_img=save_img,
                        use_crf=use_crf, forward=forward)
        if res is None:
            continue
        print(ck, {k: round(float(v), 4) for k, v in res.items() if k != "iou_by_class"})
        if logger is not None:
            logger.log_dict.update({k: v for k, v in res.items() if k != "iou_by_class"})
            logger.table_update("results", list(res.keys()),
                                [[str(v) for v in res.values()]])
            logger.logging()
        if best is None or res["test_miou"] > best[1]["test_miou"]:
            best = (ck, res)
    if best is not None:
        print("best:", best[0], best[1])
    if logger is not None:
        logger.finish()
    return best


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--config_path", required=True)
    parser.add_argument("--crf", action="store_true",
                        help="dense-CRF refinement before scoring")
    opt = parser.parse_args()
    cfg = get_config_from_json(opt.config_path)
    test(cfg, use_crf=opt.crf)
