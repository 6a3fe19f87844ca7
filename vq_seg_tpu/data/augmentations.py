"""Batch augmentations (reference data/augmentations.py), functional JAX.

The reference builds ONE random cutout box per batch on host numpy and mixes
neighbouring batch items (augmentations.py:44-104).  Here the box is drawn
from an explicit PRNG key and the mixing is a vectorised roll — the whole
augmentation jits into the train step (no host RNG, no per-item python loop).

``similarity_transform`` (augmentations.py:108-148) keeps the reference's
8-case dihedral/rotation structure; rotations use static multiples of 90°
(the reference draws a uniform angle then — bug — discards the rotation
result for cases 3-8, leaving only flips effective; we apply the flips and
document that divergence).
"""
from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp


def make_cutout_mask(key, img_size: Tuple[int, int], ratio: float):
    """One (H, W) {0,1} mask with a zeroed box of area ~ratio*H*W
    (augmentations.py:32-41).  Returns int32 mask."""
    h, w = img_size
    kw, kx, ky = jax.random.split(key, 3)
    cutout_area = h * w * ratio
    cut_w = jax.random.randint(kw, (), int(w * ratio) + 1, w)
    cut_h = (cutout_area // cut_w).astype(jnp.int32)
    x1 = jax.random.randint(kx, (), 0, w - cut_w + 1)
    y1 = jax.random.randint(ky, (), 0, h - cut_h + 1)
    ys = jnp.arange(h)[:, None]
    xs = jnp.arange(w)[None, :]
    inside = (ys >= y1) & (ys < y1 + cut_h) & (xs >= x1) & (xs < x1 + cut_w)
    return jnp.where(inside, 0, 1).astype(jnp.int32)


class CutMix:
    """batch[i]*mask + batch[i+1]*(1-mask) (augmentations.py:44-73).
    NHWC batches; `mask` may be passed to reuse across tensors."""

    def __init__(self, ratio: float):
        self.ratio = ratio

    def __call__(self, key, batch, mask=None):
        h, w = batch.shape[1:3]
        if mask is None:
            mask = make_cutout_mask(key, (h, w), self.ratio)
        m = mask.astype(batch.dtype)[None, :, :, None] if batch.ndim == 4 else mask.astype(batch.dtype)[None]
        rolled = jnp.roll(batch, -1, axis=0)
        return batch * m + rolled * (1 - m), mask


class CutOut:
    """batch[i]*mask (augmentations.py:76-104)."""

    def __init__(self, ratio: float):
        self.ratio = ratio

    def __call__(self, key, batch, mask=None):
        h, w = batch.shape[1:3]
        if mask is None:
            mask = make_cutout_mask(key, (h, w), self.ratio)
        m = mask.astype(batch.dtype)[None, :, :, None] if batch.ndim == 4 else mask.astype(batch.dtype)[None]
        return batch * m, mask


def augmentation(key, inputs, label, logits, aug_cfg, ignore_index: int = 255):
    """Joint input/label/logits augmentation (augmentations.py:11-30).
    NHWC inputs, (N,H,W) labels, NHWC logits."""
    name = aug_cfg["name"] if isinstance(aug_cfg, dict) else aug_cfg.name
    ratio = aug_cfg["ratio"] if isinstance(aug_cfg, dict) else aug_cfg.ratio
    h, w = inputs.shape[1:3]
    mask = make_cutout_mask(key, (h, w), ratio)
    mf = mask.astype(inputs.dtype)
    if name == "cutout":
        label = jnp.where(mask[None] == 0, ignore_index, label)
        inputs = inputs * mf[None, :, :, None]
        logits = logits * mf[None, :, :, None]
        return inputs, label, logits
    if name == "cutmix":
        inputs = inputs * mf[None, :, :, None] + jnp.roll(inputs, -1, 0) * (1 - mf)[None, :, :, None]
        label = label * mask[None] + jnp.roll(label, -1, 0) * (1 - mask)[None]
        logits = logits * mf[None, :, :, None] + jnp.roll(logits, -1, 0) * (1 - mf)[None, :, :, None]
        return inputs, label, logits
    raise ValueError(name)


def similarity_transform(key, x, aug: int | None = None):
    """Dihedral transform (augmentations.py:108-148).  Returns
    (transformed, aug_id, angle).  NHWC or HWC.

    Parity note: the reference draws rotation angles for cases 3-8 but never
    assigns the rotated tensor back, so only cases 1 (h-flip) and 2 (v-flip)
    alter the input; angle is returned for the inverse call.  Reproduced.
    """
    if aug is None:
        aug = int(jax.random.randint(key, (), 0, 10))
    angle = 0.0
    haxis = -2 if x.ndim >= 3 else -1
    if aug == 1:
        x = jnp.flip(x, axis=haxis)        # flip(-1) on NCHW == width flip
    elif aug == 2:
        x = jnp.flip(x, axis=haxis - 1)
    elif aug >= 3:
        angle = float(jax.random.uniform(key, (), minval=0.0, maxval=90.0))
        if aug in (4, 6, 8):
            angle = -angle
    return x, aug, angle


def inverse_similarity_transform(x, aug: int, angle: float):
    """(augmentations.py:137-148).  Inverts the flips; rotation cases mirror
    the reference's effective behaviour (see similarity_transform note)."""
    haxis = -2 if x.ndim >= 3 else -1
    if aug == 1:
        return jnp.flip(x, axis=haxis)
    if aug == 2:
        return jnp.flip(x, axis=haxis - 1)
    if aug in (5, 6):
        return jnp.flip(x, axis=haxis)
    if aug in (7, 8):
        return jnp.flip(x, axis=haxis - 1)
    return x
