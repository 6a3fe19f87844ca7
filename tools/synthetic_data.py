"""Synthetic dataset families for accuracy gates.

Two families:

  * ``make_argmax`` — the legacy rule-based set (class = argmax of smoothed
    RGB; re-exported from tools/parity_run.py).  Easy: a pixel rule solves
    it, so it measures optimisation health more than representation.
  * ``make_weedfield`` — the HARD family (VERDICT r3 weak #1): CWFID-like
    crop/weed scenes rendered at native-aspect resolution then resized to
    the train size, with
      - class imbalance (~85% soil / ~10% crop / ~5% weed — the CWFID mix),
      - texture-defined classes: crop and weed share the same mean green
        (argmax-RGB assigns BOTH to the same channel — the legacy shortcut
        scores ~chance on the vegetation classes),
      - occlusion: weeds overlap crops, and random shadow ellipses darken
        the image without changing labels,
      - labels derived from GEOMETRY (where blobs were placed), never from
        a pixel rule.

Reference protocol this feeds: the best-checkpoint accuracy gates of
test_detailviz.py:107-145 (eval on held-out images, confusion-matrix mIoU).
"""
from __future__ import annotations

import numpy as np


def _fractal_noise(rng, h, w, octaves=4, base=8):
    """Multi-scale value noise in [0,1], vectorised bilinear upsampling."""
    out = np.zeros((h, w), np.float32)
    amp, total = 1.0, 0.0
    for o in range(octaves):
        gh, gw = base * (2 ** o), base * (2 ** o)
        grid = rng.uniform(size=(gh + 1, gw + 1)).astype(np.float32)
        ys = np.linspace(0, gh, h, endpoint=False)
        xs = np.linspace(0, gw, w, endpoint=False)
        y0, x0 = ys.astype(int), xs.astype(int)
        fy, fx = (ys - y0)[:, None], (xs - x0)[None, :]
        g = (grid[y0][:, x0] * (1 - fy) * (1 - fx)
             + grid[y0 + 1][:, x0] * fy * (1 - fx)
             + grid[y0][:, x0 + 1] * (1 - fy) * fx
             + grid[y0 + 1][:, x0 + 1] * fy * fx)
        out += amp * g
        total += amp
        amp *= 0.55
    return out / total


def _blob_mask(rng, h, w, cy, cx, r, wobble=0.45):
    """Irregular blob: radius modulated by a random low-order Fourier series."""
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    dy, dx = yy - cy, xx - cx
    theta = np.arctan2(dy, dx)
    rad = np.float32(r) * (1.0 + wobble * (
        rng.uniform(-1, 1) * np.sin(2 * theta + rng.uniform(0, 6.28))
        + rng.uniform(-1, 1) * 0.5 * np.sin(3 * theta + rng.uniform(0, 6.28))))
    return dy * dy + dx * dx <= rad * rad


def _resize_area(img, out_h, out_w):
    """Integer-factor area resize (native dims are chosen divisible)."""
    h, w = img.shape[:2]
    fy, fx = h // out_h, w // out_w
    img = img[: out_h * fy, : out_w * fx]
    if img.ndim == 3:
        return img.reshape(out_h, fy, out_w, fx, -1).mean(axis=(1, 3))
    return img.reshape(out_h, fy, out_w, fx).mean(axis=(1, 3))


def _resize_nearest(lbl, out_h, out_w):
    h, w = lbl.shape
    ys = (np.arange(out_h) * h) // out_h
    xs = (np.arange(out_w) * w) // out_w
    return lbl[ys][:, xs]


def make_weedfield_image(rng, hw, native_scale=4):
    """One (image[hw,hw,3] float32 in [0,1], label[hw,hw] int32) pair.

    Rendered at native = hw*native_scale (e.g. 256->1024, ~CWFID 966x1296
    scale when hw>=242) and area-resized down, so class boundaries carry
    genuine subpixel mixing like real camera data.
    """
    H = W = hw * native_scale
    # --- soil: brown base + fractal texture + illumination gradient
    soil_tex = _fractal_noise(rng, H, W, octaves=5)
    base = np.array([0.38, 0.30, 0.22], np.float32) * rng.uniform(0.8, 1.15)
    img = base[None, None, :] * (0.65 + 0.7 * soil_tex[..., None])
    lbl = np.zeros((H, W), np.int32)

    # shared vegetation mean color: crop and weed are the SAME green on
    # average — only texture frequency + shape separate them.
    veg = np.array([0.22, 0.46, 0.20], np.float32) * rng.uniform(0.9, 1.1)

    # --- crops: large smooth-textured blobs along rows (label 2)
    n_rows = rng.integers(2, 4)
    crop_mask = np.zeros((H, W), bool)
    for r_i in range(n_rows):
        cy = (r_i + 0.5 + rng.uniform(-0.12, 0.12)) * H / n_rows
        n_plants = rng.integers(2, 5)
        for p in range(n_plants):
            cx = (p + 0.5 + rng.uniform(-0.3, 0.3)) * W / n_plants
            r = rng.uniform(0.06, 0.11) * H
            crop_mask |= _blob_mask(rng, H, W, cy, cx, r)
    smooth = _fractal_noise(rng, H, W, octaves=3, base=4)  # low-frequency
    crop_col = veg[None, None, :] * (0.75 + 0.5 * smooth[..., None])
    img = np.where(crop_mask[..., None], crop_col, img)
    lbl[crop_mask] = 2

    # --- weeds: small speckle-textured blobs anywhere (label 1), may
    # overlap crops (occlusion: weed wins, like foreground foliage)
    n_weeds = rng.integers(6, 14)
    weed_mask = np.zeros((H, W), bool)
    for _ in range(n_weeds):
        cy, cx = rng.uniform(0, H), rng.uniform(0, W)
        r = rng.uniform(0.015, 0.045) * H
        weed_mask |= _blob_mask(rng, H, W, cy, cx, r, wobble=0.6)
    speckle = rng.uniform(size=(H, W)).astype(np.float32)  # high-frequency
    weed_col = veg[None, None, :] * (0.55 + 0.9 * speckle[..., None])
    img = np.where(weed_mask[..., None], weed_col, img)
    lbl[weed_mask] = 1

    # --- shadows: random darkening ellipses, labels unchanged
    for _ in range(rng.integers(1, 4)):
        sh = _blob_mask(rng, H, W, rng.uniform(0, H), rng.uniform(0, W),
                        rng.uniform(0.1, 0.25) * H, wobble=0.3)
        img = np.where(sh[..., None], img * rng.uniform(0.45, 0.7), img)

    img += rng.normal(0, 0.02, img.shape).astype(np.float32)  # sensor noise
    img = np.clip(img, 0.0, 1.0).astype(np.float32)
    return (_resize_area(img, hw, hw).astype(np.float32),
            _resize_nearest(lbl, hw, hw).astype(np.int32))


def make_weedfield(hw=64, n_lab=4, n_unlab=4, n_test=4, seed=0, native_scale=4):
    """Same return contract as tools/parity_run.make_synthetic."""
    rng = np.random.default_rng(seed + 7_000_000)

    def gen(n):
        if n == 0:
            return (np.zeros((0, hw, hw, 3), np.float32),
                    np.zeros((0, hw, hw), np.int32))
        pairs = [make_weedfield_image(rng, hw, native_scale) for _ in range(n)]
        return (np.stack([p[0] for p in pairs]),
                np.stack([p[1] for p in pairs]))

    l_img, l_gt = gen(n_lab)
    ul_img, _ = gen(n_unlab)
    t_img, t_gt = gen(n_test)
    return (l_img, l_gt), ul_img, (t_img, t_gt)


def make_argmax(hw=64, n_lab=4, n_unlab=4, n_test=4, seed=0):
    import tools.parity_run as pr

    old = pr.HW
    pr.HW = hw
    try:
        return pr.make_synthetic(n_lab, n_unlab, n_test, seed=seed)
    finally:
        pr.HW = old


def argmax_rule_miou(img, lbl):
    """Score the legacy pixel shortcut (class = argmax RGB) on a set — the
    hardness diagnostic: near-1.0 on the argmax family, ~chance on weedfield."""
    pred = np.argmax(img, axis=-1)
    # legacy family maps argmax channel directly to class id; weedfield has
    # no such mapping, so take the best over all 6 channel->class bijections
    from itertools import permutations

    best = 0.0
    for perm in permutations(range(3)):
        p = np.vectorize(lambda c: perm[c])(pred)
        ious = []
        for c in range(3):
            inter = ((p == c) & (lbl == c)).sum()
            union = ((p == c) | (lbl == c)).sum()
            if union:
                ious.append(inter / union)
        best = max(best, float(np.mean(ious)))
    return best
