"""Label-map tools (jit-friendly jnp versions of reference utils/seg_tools.py).

Layout note: this framework is NHWC throughout (TPU-native).  Logit tensors
are (N, H, W, C); label maps are (N, H, W) int32.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def img_to_label(target_img: jnp.ndarray, pixel_to_label: dict) -> jnp.ndarray:
    """Remap grayscale mask pixel values to class ids.

    Reference: utils/seg_tools.py:3-8 (chained torch.where).  Implemented as a
    single 256-entry LUT gather, which XLA lowers to one fused take.
    """
    lut = np.arange(256, dtype=np.int32)
    for k, v in pixel_to_label.items():
        lut[int(k)] = int(v)
    return jnp.take(jnp.asarray(lut), target_img.astype(jnp.int32))


def label_to_onehot(target: jnp.ndarray, num_classes: int, eps: float = 1e-6) -> jnp.ndarray:
    """One-hot (N, H, W) -> (N, H, W, num_classes), + eps like the reference.

    Reference: utils/seg_tools.py:10-21 (scatter + 1e-6; NCHW there, NHWC here).
    Values outside [0, num_classes) one-hot to all-eps rows (torch scatter
    would error; we clamp-free via jax one_hot semantics).
    """
    return jax.nn.one_hot(target, num_classes, dtype=jnp.float32) + eps


def onehot_1d(target: jnp.ndarray, num_classes: int, eps: float = 1e-6) -> jnp.ndarray:
    """One-hot (M,) -> (M, num_classes) + eps. Reference: utils/seg_tools.py:23-34."""
    return jax.nn.one_hot(target.reshape(-1), num_classes, dtype=jnp.float32) + eps


def score_mask(pred: jnp.ndarray, th: float = 0.7) -> jnp.ndarray:
    """Confidence mask from a score map: 1 where max softmax prob > th else 0.

    Reference: utils/seg_tools.py:37-40. pred is (N, H, W, C); returns
    (N, H, W, 1) to mirror the reference's channel-dim unsqueeze.
    """
    pred_prob = jax.nn.softmax(pred, axis=-1)
    pred_max = jnp.max(pred_prob, axis=-1)
    return jnp.where(pred_max > th, 1, 0)[..., None]


def confidence_filtered_pseudo(pred: jnp.ndarray, pseudo: jnp.ndarray, th: float = 0.7,
                               ignore_index: int = 255) -> jnp.ndarray:
    """Pseudo-labels with low-confidence pixels set to ignore_index.

    Reference: the trainer-local ``score_mask`` (train_vqreptunet1x1v2.py:43-46)
    which returns `where(max softmax > th, pseudo, 255)`.
    pred: (N, H, W, C) logits; pseudo: (N, H, W) int labels.
    """
    pred_prob = jax.nn.softmax(pred, axis=-1)
    pred_max = jnp.max(pred_prob, axis=-1)
    return jnp.where(pred_max > th, pseudo, ignore_index)
