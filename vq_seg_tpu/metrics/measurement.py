"""Confusion-matrix segmentation metrics, jit-friendly.

Functional jnp re-design of the reference's numpy ``Measurement``
(measurement.py:7-91).  The reference computed these on host numpy every step
(a device->host sync per iteration, train_vqreptunet1x1v2.py:205); here every
metric is a pure jnp function so it runs on-device inside the jitted train
step and only the final scalars are fetched.

Semantics preserved exactly (for parity gating):
  * per-image confusion matrix binned as ``num_classes * gt + pred``
    (measurement.py:12-31)
  * mIoU = mean over classes of (mean over batch of per-image IoU), with
    +1e-8 in the denominator; images missing a class contribute IoU 0
    (measurement.py:53-62)
  * precision/recall averaged per-class over the batch with +1e-7 (precision
    only) in the denominator (measurement.py:64-80)
  * f1 = 2PR/(P+R) (measurement.py:78-80)
  * accuracy: mean per-image pixel accuracy; with ignore_idx, a global
    accuracy over non-ignored pixels (measurement.py:33-51)
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def _labels_of(pred: jnp.ndarray) -> jnp.ndarray:
    """Accept either class scores (N,H,W,C) or labels (N,H,W)."""
    if pred.ndim == 4:
        return jnp.argmax(pred, axis=-1)
    return pred


@partial(jax.jit, static_argnames=("num_classes",))
def confusion_matrix(pred, target, *, num_classes: int) -> jnp.ndarray:
    """Per-image confusion matrix, (N, num_classes, num_classes).

    pred: (N,H,W,C) scores or (N,H,W) labels; target: (N,H,W) int labels.
    """
    pred_label = _labels_of(pred)
    n = pred_label.shape[0]
    cats = (num_classes * target.astype(jnp.int32) + pred_label.astype(jnp.int32)).reshape(n, -1)
    onehot = jax.nn.one_hot(cats, num_classes * num_classes, dtype=jnp.float32)
    conf = onehot.sum(axis=1)
    return conf.reshape(n, num_classes, num_classes)


def miou(conf_mat: jnp.ndarray):
    """(miou, per-class iou list) from (N,K,K) confusion matrices."""
    sum_col = jnp.sum(conf_mat, axis=-2)  # predicted-as-k totals
    sum_row = jnp.sum(conf_mat, axis=-1)  # gt-k totals
    diag = jnp.diagonal(conf_mat, axis1=-2, axis2=-1)
    iou_per_class = jnp.mean(diag / (sum_col + sum_row - diag + 1e-8), axis=0)
    return jnp.mean(iou_per_class), iou_per_class


def precision(conf_mat: jnp.ndarray):
    sum_col = jnp.sum(conf_mat, axis=-2)
    diag = jnp.diagonal(conf_mat, axis1=-2, axis2=-1)
    per_class = jnp.mean(diag / (sum_col + 1e-7), axis=0)
    return jnp.mean(per_class), per_class


def recall(conf_mat: jnp.ndarray):
    sum_row = jnp.sum(conf_mat, axis=-1)
    diag = jnp.diagonal(conf_mat, axis1=-2, axis2=-1)
    per_class = jnp.mean(diag / sum_row, axis=0)
    return jnp.mean(per_class), per_class


def f1score(recall_v, precision_v):
    return 2 * recall_v * precision_v / (recall_v + precision_v)


def accuracy(pred, target, ignore_idx: int | None = None):
    pred_label = _labels_of(pred)
    n = pred_label.shape[0]
    p = pred_label.reshape(n, -1)
    t = target.reshape(n, -1)
    if ignore_idx is None:
        return jnp.mean(jnp.sum(p == t, axis=-1) / p.shape[-1])
    keep = t != ignore_idx
    correct = jnp.sum((p == t) & keep)
    total = jnp.sum(keep)
    return correct / total


class Measurement:
    """Object API mirroring the reference ``Measurement`` (measurement.py:7).

    Accepts numpy or jnp arrays; `pred` is channel-LAST here (N,H,W,C) —
    pass ``channel_axis=1`` for reference-layout (N,C,H,W) arrays.
    """

    def __init__(self, num_classes: int, ignore_idx: int | None = None, channel_axis: int = -1):
        self.num_classes = num_classes
        self.ignore_idx = ignore_idx
        self.channel_axis = channel_axis

    def _to_nhwc(self, pred):
        pred = jnp.asarray(pred)
        if pred.ndim == 4 and self.channel_axis in (1, -3):
            pred = jnp.moveaxis(pred, 1, -1)
        return pred

    def _make_confusion_matrix(self, pred, target):
        return np.asarray(
            confusion_matrix(self._to_nhwc(pred), jnp.asarray(target), num_classes=self.num_classes)
        )

    def miou(self, conf_mat):
        m, lst = miou(jnp.asarray(conf_mat, dtype=jnp.float32))
        return float(m), [float(x) for x in lst]

    def precision(self, conf_mat):
        m, lst = precision(jnp.asarray(conf_mat, dtype=jnp.float32))
        return float(m), np.asarray(lst)

    def recall(self, conf_mat):
        m, lst = recall(jnp.asarray(conf_mat, dtype=jnp.float32))
        return float(m), np.asarray(lst)

    def f1score(self, recall_v, precision_v):
        return 2 * recall_v * precision_v / (recall_v + precision_v)

    def accuracy(self, pred, target):
        return float(accuracy(self._to_nhwc(pred), jnp.asarray(target), self.ignore_idx))

    def measure(self, pred, target):
        conf_mat = self._make_confusion_matrix(pred, target)
        acc = self.accuracy(pred, target)
        miou_v, iou_list = self.miou(conf_mat)
        precision_v, _ = self.precision(conf_mat)
        recall_v, _ = self.recall(conf_mat)
        f1 = self.f1score(recall_v, precision_v)
        return acc, miou_v, iou_list, precision_v, recall_v, f1

    __call__ = measure
