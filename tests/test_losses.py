"""Loss parity tests vs torch formulas (reference loss/ semantics)."""
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from vq_seg_tpu.losses import (
    compute_class_weight,
    cross_entropy_loss,
    dc_loss,
    dice_loss,
    focal_loss,
    make_loss,
    supcon_loss,
)


@pytest.fixture
def seg_batch(rng):
    pred = rng.normal(size=(2, 8, 8, 3)).astype(np.float32)
    target = rng.integers(0, 3, size=(2, 8, 8)).astype(np.int32)
    return pred, target


def test_cross_entropy_matches_torch(seg_batch):
    pred, target = seg_batch
    ours = float(cross_entropy_loss(jnp.asarray(pred), jnp.asarray(target)))
    theirs = float(F.cross_entropy(
        torch.tensor(pred).permute(0, 3, 1, 2), torch.tensor(target).long()))
    assert abs(ours - theirs) < 1e-5


def test_cross_entropy_ignore_and_weight(seg_batch):
    pred, target = seg_batch
    t = target.copy()
    t[0, :4] = 255
    w = np.array([0.2, 0.3, 0.5], np.float32)
    ours = float(cross_entropy_loss(jnp.asarray(pred), jnp.asarray(t),
                                    ignore_index=255, weight=jnp.asarray(w)))
    theirs = float(F.cross_entropy(
        torch.tensor(pred).permute(0, 3, 1, 2), torch.tensor(t).long(),
        weight=torch.tensor(w), ignore_index=255))
    assert abs(ours - theirs) < 1e-5


def _torch_dice(pred, target, num_classes=3, ignore_index=None, weight=None):
    """Direct transcription of the reference dice math (loss/dice_loss.py:5-58)
    in torch, as a golden oracle."""
    pred = torch.tensor(pred).permute(0, 3, 1, 2)
    target = torch.tensor(target)
    b, c = pred.shape[:2]
    pred = pred.reshape(b, c, -1)
    target = target.reshape(b, -1)
    if ignore_index is not None:
        mask = target != ignore_index
        pred = pred * torch.stack([mask] * c, dim=1)
        target = target * mask
    onehot = torch.eye(num_classes)[target.long()].permute(0, 2, 1)
    prob = F.softmax(pred, dim=1)
    inter = torch.sum(prob * onehot, dim=2)
    sums = torch.sum(prob + onehot, dim=2)
    dice = (2 * inter / (sums + 1e-6)).mean(dim=0)
    if weight is not None:
        w = torch.tensor(weight)
        return float(torch.sum((1 - dice) * w / torch.sum(w)) / num_classes)
    return float(1 - dice.mean())


def test_dice_matches_reference_math(seg_batch):
    pred, target = seg_batch
    ours = float(dice_loss(jnp.asarray(pred), jnp.asarray(target), 3))
    assert abs(ours - _torch_dice(pred, target)) < 1e-5


def test_dice_ignore_index_and_weight(seg_batch):
    pred, target = seg_batch
    t = target.copy()
    t[1, 2:5] = 255
    w = np.array([0.1, 0.4, 0.5], np.float32)
    ours = float(dice_loss(jnp.asarray(pred), jnp.asarray(t), 3,
                           weight=jnp.asarray(w), ignore_index=255))
    assert abs(ours - _torch_dice(pred, t, ignore_index=255, weight=w)) < 1e-5


def test_focal_loss_basic(seg_batch):
    pred, target = seg_batch
    # sum reduction over all pixels of alpha*(1-p)^gamma * -log p at gt
    p = np.exp(pred) / np.exp(pred).sum(-1, keepdims=True)
    pg = np.take_along_axis(p, target[..., None], axis=-1)[..., 0]
    expected = (0.25 * (1 - pg) ** 2 * -np.log(np.maximum(pg, 1e-12))).sum()
    ours = float(focal_loss(jnp.asarray(pred), jnp.asarray(target), reduction="sum"))
    assert abs(ours - expected) / abs(expected) < 1e-4


def test_make_loss_factory():
    d = make_loss("dice_loss", 3, ignore_index=255)
    ce = make_loss("cross_entropy", 3, ignore_index=255)
    pred = jnp.zeros((1, 4, 4, 3))
    tgt = jnp.zeros((1, 4, 4), jnp.int32)
    assert np.isfinite(float(d(pred, tgt)))
    assert np.isfinite(float(ce(pred, tgt)))


def test_compute_class_weight():
    y = jnp.asarray([0, 0, 0, 1])
    w = np.asarray(compute_class_weight(3, y))
    assert np.allclose(w, [1 - 0.75, 1 - 0.25, 1.0])


def test_supcon_and_dc_losses(rng):
    x = jnp.asarray(rng.normal(size=(3, 4, 4, 5)).astype(np.float32))
    gt = jnp.asarray(rng.integers(0, 3, size=(3, 4, 4)))
    val = float(supcon_loss(x, gt))
    assert np.isfinite(val)
    phi = jnp.asarray(rng.normal(size=(4, 8)).astype(np.float32))
    assert np.isfinite(float(dc_loss(phi, phi)))
