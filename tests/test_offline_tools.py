"""Offline tooling tests: SLIC, saliency (RBD/FT), OBIA, dense CRF."""
import numpy as np
import pytest


@pytest.fixture
def toy_image(rng):
    """Two coloured squares on a dark background."""
    img = np.zeros((48, 48, 3), np.float32) + 0.1
    img[8:20, 8:20] = [0.9, 0.1, 0.1]
    img[28:44, 28:44] = [0.1, 0.8, 0.2]
    img += rng.normal(scale=0.01, size=img.shape).astype(np.float32)
    return np.clip(img, 0, 1)


def test_slic_segments(toy_image):
    from vq_seg_tpu.tools.slic import slic

    labels = slic(toy_image, n_segments=16, n_iters=4)
    assert labels.shape == toy_image.shape[:2]
    assert labels.min() >= 0
    assert 4 <= len(np.unique(labels)) <= 64
    # the red square should be covered by superpixels that don't leak much
    red = labels[10:18, 10:18]
    dominant = np.bincount(red.ravel()).argmax()
    outside = (labels == dominant) & ~np.pad(np.ones((12, 12), bool), ((8, 28), (8, 28)))
    assert outside.mean() < 0.05


def test_saliency_ft_highlights_objects(toy_image):
    from vq_seg_tpu.tools.saliency import get_saliency_ft

    sal = get_saliency_ft(toy_image)
    assert sal.shape == toy_image.shape[:2]
    assert sal[10:18, 10:18].mean() > sal[:6, :6].mean()


def test_saliency_rbd_runs(toy_image):
    from vq_seg_tpu.tools.saliency import get_saliency_rbd

    sal = get_saliency_rbd(toy_image, n_segments=24)
    assert sal.shape == toy_image.shape[:2]
    assert 0 <= sal.min() and sal.max() <= 1
    # objects (non-boundary) more salient than the background border
    assert sal[30:42, 30:42].mean() > sal[:4].mean()


def test_lbp_and_obia(toy_image, rng):
    from vq_seg_tpu.tools.obia import OBIAPseudoLabeler, lbp_8

    codes = lbp_8((toy_image.mean(-1) * 255).astype(np.uint8))
    assert codes.shape == toy_image.shape[:2]

    mask = np.zeros((48, 48), np.int64)
    mask[8:20, 8:20] = 1
    mask[28:44, 28:44] = 2
    labeler = OBIAPseudoLabeler(n_segments=32, n_estimators=16).fit([toy_image], [mask])
    pred = labeler.predict(toy_image)
    assert pred.shape == mask.shape
    assert (pred == mask).mean() > 0.8  # easy case: should mostly recover


def test_dense_crf_sharpens(toy_image):
    import jax.numpy as jnp

    from vq_seg_tpu.utils.crf import DenseCRF

    h, w = toy_image.shape[:2]
    gt = np.zeros((h, w), np.int64)
    gt[8:20, 8:20] = 1
    gt[28:44, 28:44] = 2
    prob = np.full((h, w, 3), 1 / 3, np.float32)
    noisy = np.where(np.random.default_rng(0).uniform(size=(h, w)) < 0.85, gt,
                     np.random.default_rng(1).integers(0, 3, (h, w)))
    for k in range(3):
        prob[..., k] = np.where(noisy == k, 0.6, 0.2)
    crf = DenseCRF(iter_max=5, bilateral_radius=2)
    q = np.asarray(crf(jnp.asarray(toy_image), jnp.asarray(prob)))
    assert q.shape == prob.shape
    acc_before = (prob.argmax(-1) == gt).mean()
    acc_after = (q.argmax(-1) == gt).mean()
    assert acc_after >= acc_before - 0.02  # refinement must not destroy labels
