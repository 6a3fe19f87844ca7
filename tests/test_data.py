"""Data layer tests: split semantics, batch padding, loaders, augmentations,
sampling (reference data/dataset.py, data/augmentations.py, sampling.py)."""
import os

import jax
import jax.numpy as jnp
import numpy as np

from vq_seg_tpu.data import BaseDataset, Loader, NormalizedDataset
from vq_seg_tpu.data.augmentations import (
    CutMix,
    augmentation,
    inverse_similarity_transform,
    make_cutout_mask,
    similarity_transform,
)
from vq_seg_tpu.data.sampling import sampling


def test_split_semantics(synthetic_dataset):
    train = os.path.join(synthetic_dataset, "train")
    lab = BaseDataset(train, "labelled")
    unlab = BaseDataset(train, "unlabelled")
    assert len(lab) == 5 and len(unlab) == 3
    assert set(lab.filenames).isdisjoint(unlab.filenames)
    item = lab[0]
    assert item["img"].shape == (40, 40, 3) and item["img"].dtype == np.float32
    assert item["target"].dtype == np.uint8
    assert "target" not in unlab[0]


def test_batch_padding(synthetic_dataset):
    train = os.path.join(synthetic_dataset, "train")
    lab = BaseDataset(train, "labelled", batch_size=4)
    assert len(lab) == 8  # 5 padded to multiple of 4 by wrapping
    assert lab.filenames[5] == lab.filenames[0]


def test_batch_padding_tiles_past_one_wrap(synthetic_dataset):
    """pad > len(files): 3 unlabelled files at a --per_device_batch global
    batch of 8 must tile to a full multiple, not stop after one wrap."""
    train = os.path.join(synthetic_dataset, "train")
    unlab = BaseDataset(train, "unlabelled", batch_size=8)  # 3 files
    assert len(unlab) == 8
    assert unlab.filenames[3:6] == unlab.filenames[:3]
    assert unlab.filenames[6:] == unlab.filenames[:2]


def test_resize_rules(synthetic_dataset):
    train = os.path.join(synthetic_dataset, "train")
    ds = BaseDataset(train, "labelled", resize=16)
    item = ds[0]
    assert item["img"].shape == (16, 16, 3)
    assert item["target"].shape == (16, 16)
    ds2 = BaseDataset(train, "labelled", resize=16, target_resize=False)
    assert ds2[0]["target"].shape == (40, 40)


def test_loader_batches(synthetic_dataset):
    train = os.path.join(synthetic_dataset, "train")
    loader = Loader(BaseDataset(train, "labelled", batch_size=2, resize=16), 2,
                    shuffle=True, seed=0)
    batches = list(loader)
    assert len(batches) == len(loader) == 3
    assert batches[0]["img"].shape == (2, 16, 16, 3)
    assert len(batches[0]["filename"]) == 2


def test_normalized_dataset(synthetic_dataset):
    train = os.path.join(synthetic_dataset, "train")
    ds = NormalizedDataset(train, "labelled", resize=16)
    img = ds[0]["img"]
    assert img.shape == (16, 16, 3) and img.min() >= 0 and img.max() <= 1


def test_cutout_mask_properties():
    key = jax.random.PRNGKey(0)
    mask = np.asarray(make_cutout_mask(key, (32, 32), 0.25))
    assert mask.shape == (32, 32)
    zero_frac = 1 - mask.mean()
    assert 0.1 < zero_frac < 0.5  # ~ratio-sized box


def test_cutmix_mixes_neighbours():
    key = jax.random.PRNGKey(1)
    batch = jnp.stack([jnp.zeros((8, 8, 3)), jnp.ones((8, 8, 3))])
    mixed, mask = CutMix(0.3)(key, batch)
    m = np.asarray(mask)
    assert np.allclose(np.asarray(mixed)[0, m == 1], 0)
    assert np.allclose(np.asarray(mixed)[0, m == 0], 1)


def test_joint_augmentation_cutout_sets_ignore():
    key = jax.random.PRNGKey(2)
    x = jnp.ones((2, 16, 16, 3))
    label = jnp.zeros((2, 16, 16), jnp.int32)
    logits = jnp.ones((2, 16, 16, 3))
    xa, la, ga = augmentation(key, x, label, logits, {"name": "cutout", "ratio": 0.3})
    la = np.asarray(la)
    assert (la == 255).any() and (la == 0).any()
    assert np.asarray(xa)[la == 255].sum() == 0


def test_similarity_transform_flips_invert():
    x = jnp.arange(2 * 4 * 4 * 1, dtype=jnp.float32).reshape(2, 4, 4, 1)
    for aug in (1, 2):
        y, a, ang = similarity_transform(None, x, aug=aug)
        back = inverse_similarity_transform(y, a, ang)
        assert np.allclose(np.asarray(back), np.asarray(x))


def test_sampling_split(tmp_path):
    # sampling expects a FULLY labeled source tree (the reference runs it on
    # cropweed_total, sampling.py:41-60); build one
    from PIL import Image

    rng = np.random.default_rng(3)
    root = tmp_path / "full"
    for sub in ("train/input", "train/target", "test/input", "test/target"):
        (root / sub).mkdir(parents=True)
    for i in range(8):
        img = rng.integers(0, 255, (16, 16, 3), dtype=np.uint8)
        mask = rng.choice([0, 128, 255], size=(16, 16)).astype(np.uint8)
        Image.fromarray(img).save(root / "train" / "input" / f"im{i:03d}.png")
        Image.fromarray(mask, "L").save(root / "train" / "target" / f"im{i:03d}.png")
    Image.fromarray(np.zeros((16, 16, 3), np.uint8)).save(root / "test" / "input" / "t.png")

    save = sampling(str(root), str(tmp_path / "semi"), total=8, percent=50,
                    pattern="*.png", seed=0)
    tgt = os.listdir(os.path.join(save, "train", "target"))
    inp = os.listdir(os.path.join(save, "train", "input"))
    assert len(tgt) == 4  # 50% of 8
    assert len(inp) == 8
    assert os.path.isdir(os.path.join(save, "test", "input"))
