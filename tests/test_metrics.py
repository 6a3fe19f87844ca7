"""Golden tests for metrics against the reference numpy formulas
(measurement.py:7-91), re-derived by hand here (no reference code imported)."""
import jax.numpy as jnp
import numpy as np

from vq_seg_tpu.metrics import Measurement, confusion_matrix, miou


def _np_conf(pred_label, target, k):
    n = pred_label.shape[0]
    cats = (k * target + pred_label).reshape(n, -1)
    out = np.stack([np.bincount(c, minlength=k * k) for c in cats]).reshape(n, k, k)
    return out


def test_confusion_matrix_matches_numpy(rng):
    k = 3
    pred = rng.random((4, k, 8, 8)).astype(np.float32)  # reference layout NCHW
    target = rng.integers(0, k, (4, 8, 8))
    pred_nhwc = np.moveaxis(pred, 1, -1)
    got = np.asarray(confusion_matrix(jnp.asarray(pred_nhwc), jnp.asarray(target), num_classes=k))
    want = _np_conf(pred.argmax(1), target, k)
    np.testing.assert_allclose(got, want)


def test_miou_formula(rng):
    k = 3
    conf = rng.integers(0, 50, (5, k, k)).astype(np.float32)
    m, ious = miou(jnp.asarray(conf))
    # reference formula: per-class mean over batch of diag/(col+row-diag+1e-8)
    want_ious = []
    for i in range(k):
        col = conf.sum(-2)[:, i]
        row = conf.sum(-1)[:, i]
        want_ious.append(np.mean(conf[:, i, i] / (col + row - conf[:, i, i] + 1e-8)))
    np.testing.assert_allclose(np.asarray(ious), want_ious, rtol=1e-6)
    np.testing.assert_allclose(float(m), np.mean(want_ious), rtol=1e-6)


def test_measure_end_to_end(rng):
    k = 3
    meas = Measurement(k, channel_axis=1)
    pred = rng.random((2, k, 16, 16)).astype(np.float32)
    target = rng.integers(0, k, (2, 16, 16))
    acc, m, iou_list, p, r, f1 = meas.measure(pred, target)
    assert 0 <= acc <= 1 and 0 <= m <= 1
    assert len(iou_list) == k
    np.testing.assert_allclose(f1, 2 * r * p / (r + p), rtol=1e-6)
    # accuracy equals plain mean equality rate
    want_acc = np.mean(pred.argmax(1) == target)
    np.testing.assert_allclose(acc, want_acc, rtol=1e-6)


def test_perfect_prediction_is_miou_1():
    k = 3
    target = np.tile(np.arange(k, dtype=np.int64).repeat(4)[None, :, None], (2, 1, 6))
    pred = np.eye(k, dtype=np.float32)[target]  # NHWC scores
    conf = confusion_matrix(jnp.asarray(pred), jnp.asarray(target), num_classes=k)
    m, _ = miou(conf)
    np.testing.assert_allclose(float(m), 1.0, atol=1e-6)
