"""Dense-CRF quantification (VERDICT #7): the TPU mean-field CRF vs a
brute-force all-pairs NumPy reference at the REFERENCE parameters
(iter_max=10, bi_w=7, bi_xy_std=50, bi_rgb_std=4, pos_w=3, pos_xy_std=3;
/root/reference/utils/crf.py:6)."""
import numpy as np
import pytest

from vq_seg_tpu.utils.crf import DenseCRF, dense_crf_exact


@pytest.fixture(scope="module")
def blob_case():
    """A 48x48 image of two colour blobs + noisy softmax scores."""
    rng = np.random.default_rng(0)
    h = w = 48
    yy, xx = np.mgrid[0:h, 0:w]
    img = np.zeros((h, w, 3), np.float32)
    blob1 = (yy - 14) ** 2 + (xx - 14) ** 2 < 121
    blob2 = (yy - 32) ** 2 + (xx - 34) ** 2 < 144
    img[..., 0] = 0.2 + 0.6 * blob1
    img[..., 1] = 0.2 + 0.6 * blob2
    img[..., 2] = 0.2
    img += rng.normal(0, 0.03, img.shape).astype(np.float32)
    img = np.clip(img, 0, 1)
    gt = np.zeros((h, w), np.int64)
    gt[blob1] = 1
    gt[blob2] = 2
    logits = np.eye(3, dtype=np.float32)[gt] * 2.0
    logits += rng.normal(0, 1.0, logits.shape).astype(np.float32)
    e = np.exp(logits - logits.max(-1, keepdims=True))
    prob = e / e.sum(-1, keepdims=True)
    return img, prob, gt


def test_crf_matches_exact_dense_formulation(blob_case):
    img, prob, gt = blob_case
    exact = dense_crf_exact(img, prob)
    ours = np.asarray(DenseCRF()(img, prob))
    dq = np.abs(ours - exact)
    agree = float((ours.argmax(-1) == exact.argmax(-1)).mean())
    # quantified divergence bounds — windowed+coarse bilateral vs all-pairs.
    # (No max-|dQ| bound: 10 mean-field iters saturate Q to ~one-hot, so the
    # rare boundary pixel that flips shows |dQ|~1; measured 99.87% agreement,
    # mean 8.5e-4, 99.9th pct 0.012 at defaults R=8/stride=4.)
    assert agree >= 0.995, f"argmax agreement {agree:.4f}"
    assert float(dq.mean()) <= 0.005, f"mean |dQ| {dq.mean():.5f}"
    assert float(np.quantile(dq, 0.999)) <= 0.05, f"p99.9 |dQ| {np.quantile(dq, 0.999):.4f}"


def test_crf_improves_noisy_predictions(blob_case):
    """End-use sanity: mean-field refinement must denoise the prediction."""
    img, prob, gt = blob_case
    before = float((prob.argmax(-1) == gt).mean())
    refined = np.asarray(DenseCRF()(img, prob))
    after = float((refined.argmax(-1) == gt).mean())
    assert after > before, (before, after)


def test_exact_crf_sharpens_confident_regions(blob_case):
    img, prob, _ = blob_case
    out = dense_crf_exact(img, prob, iter_max=3)
    assert out.shape == prob.shape
    assert np.allclose(out.sum(-1), 1.0, atol=1e-5)
    assert float(np.max(out)) > float(np.max(prob)) - 1e-3
