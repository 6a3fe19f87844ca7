"""Native decode/resample path (data/_fastimg.c) parity vs the PIL
reference conventions (reference data/dataset.py:53-56).

Masks (NEAREST + convert("L")) must be BIT-EXACT — class labels cannot
tolerate interpolation drift.  Images (BILINEAR + /255) are allowed
<= 2/255 per pixel (PIL rounds to uint8 between resample and scale; the
C path accumulates in float)."""
import io
import os

import numpy as np
import pytest

PIL = pytest.importorskip("PIL")
from PIL import Image  # noqa: E402

from vq_seg_tpu.data import fastimg  # noqa: E402


pytestmark = pytest.mark.skipif(fastimg.load() is None,
                                reason="native fastimg unavailable (no cc/libpng)")


def _write_png(tmp_path, name, arr, mode):
    p = os.path.join(tmp_path, name)
    Image.fromarray(arr, mode=mode).save(p)
    return p


@pytest.fixture(scope="module")
def rng():
    return np.random.default_rng(7)


def test_decode_rgb_exact(tmp_path, rng):
    src = rng.integers(0, 256, (37, 53, 3), dtype=np.uint8)
    p = _write_png(tmp_path, "rgb.png", src, "RGB")
    out = fastimg.load_rgb_f32(p)
    assert out.shape == (37, 53, 3) and out.dtype == np.float32
    np.testing.assert_array_equal((out * 255).round().astype(np.uint8), src)


def test_decode_gray_modes(tmp_path, rng):
    """L input decodes exactly; RGB input matches PIL's L24 luma."""
    g = rng.integers(0, 256, (21, 17), dtype=np.uint8)
    p = _write_png(tmp_path, "g.png", g, "L")
    np.testing.assert_array_equal(fastimg.load_gray_u8(p), g)

    rgbsrc = rng.integers(0, 256, (19, 23, 3), dtype=np.uint8)
    p2 = _write_png(tmp_path, "rgb2.png", rgbsrc, "RGB")
    ref = np.asarray(Image.open(p2).convert("L"))
    np.testing.assert_array_equal(fastimg.load_gray_u8(p2), ref)


def test_decode_palette_and_16bit(tmp_path, rng):
    """Palette PNGs (libpng expands) must match PIL convert("RGB")."""
    src = rng.integers(0, 256, (16, 16, 3), dtype=np.uint8)
    im = Image.fromarray(src).quantize(colors=17)  # mode P
    p = os.path.join(tmp_path, "pal.png")
    im.save(p)
    ref = np.asarray(Image.open(p).convert("RGB"))
    out = fastimg.load_rgb_f32(p)
    np.testing.assert_array_equal((out * 255).round().astype(np.uint8), ref)


def test_bilinear_resize_matches_pil(tmp_path, rng):
    src = rng.integers(0, 256, (97, 71, 3), dtype=np.uint8)
    p = _write_png(tmp_path, "big.png", src, "RGB")
    im = Image.open(p).convert("RGB")
    for size in ((32, 48), (128, 160), (71, 97), (64, 64)):
        ref = np.asarray(im.resize(size, Image.BILINEAR),
                         dtype=np.float32) / 255.0
        out = fastimg.load_rgb_f32(p, size)
        assert out.shape == ref.shape
        assert np.abs(out - ref).max() <= 2.0 / 255.0 + 1e-6, size


def test_nearest_mask_bit_exact(tmp_path, rng):
    msk = rng.choice(np.array([0, 128, 255], np.uint8), (61, 43))
    p = _write_png(tmp_path, "m.png", msk, "L")
    im = Image.open(p).convert("L")
    for size in ((16, 16), (122, 86), (50, 70)):
        ref = np.asarray(im.resize(size, Image.NEAREST))
        out = fastimg.load_gray_u8(p, size)
        np.testing.assert_array_equal(out, ref)


def test_gray_input_replicates_to_rgb(tmp_path, rng):
    g = rng.integers(0, 256, (24, 24), dtype=np.uint8)
    p = _write_png(tmp_path, "gr.png", g, "L")
    ref = np.asarray(Image.open(p).convert("RGB").resize((12, 12), Image.BILINEAR),
                     dtype=np.float32) / 255.0
    out = fastimg.load_rgb_f32(p, (12, 12))
    assert np.abs(out - ref).max() <= 2.0 / 255.0 + 1e-6


def test_corrupt_file_returns_none(tmp_path):
    p = os.path.join(tmp_path, "bad.png")
    with open(p, "wb") as f:
        f.write(b"\x89PNG\r\n\x1a\nnot really a png")
    assert fastimg.load_rgb_f32(p) is None
    assert fastimg.load_gray_u8(p) is None
    missing = os.path.join(tmp_path, "nope.png")
    assert fastimg.load_rgb_f32(missing) is None


def test_load_pair_uses_fast_path_and_matches_pil(tmp_path, rng):
    """dataset._load_pair through fastimg == the PIL-only path."""
    from vq_seg_tpu.data import dataset as ds

    img = rng.integers(0, 256, (45, 67, 3), dtype=np.uint8)
    msk = rng.choice(np.array([0, 128, 255], np.uint8), (45, 67))
    pi = _write_png(tmp_path, "i.png", img, "RGB")
    pm = _write_png(tmp_path, "t.png", msk, "L")
    fast_i, fast_t = ds._load_pair(pi, pm, (32, 32), True)

    im = Image.open(pi).convert("RGB").resize((32, 32), Image.BILINEAR)
    tg = Image.open(pm).convert("L").resize((32, 32), Image.NEAREST)
    ref_i = np.asarray(im, dtype=np.float32) / 255.0
    assert np.abs(fast_i - ref_i).max() <= 2.0 / 255.0 + 1e-6
    np.testing.assert_array_equal(fast_t, np.asarray(tg, dtype=np.uint8))
