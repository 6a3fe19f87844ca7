"""Datasets + device-feeding loader (reference data/dataset.py).

TPU-first design: instead of torch DataLoader worker processes feeding
per-sample tensors, datasets decode+resize on host into pinned numpy
batches, and ``Loader`` iterates *whole batches* with a one-deep device
prefetch (``jax.device_put`` of batch N+1 overlaps with the step on batch
N).  Layout is NHWC float32 in [0,1] (torchvision ``to_tensor`` semantics);
masks stay uint8 (raw grayscale pixel values — class mapping happens
on-device via ``seg_tools.img_to_label``'s fused LUT gather).

Decode hot path is native C (``data/_fastimg.c`` via ``fastimg.py``):
libdeflate inflate + fused PIL-convention resample + float conversion in
one GIL-free call (1.37x PIL end-to-end, masks bit-exact); PIL is the
automatic fallback (odd formats, no compiler, ``VQ_SEG_NO_FASTIMG=1``).

Reference semantics preserved (data/dataset.py:15-62):
  * dir layout ``{data_dir}/input/*.png`` + ``{data_dir}/target/*.png``
  * split='labelled'  -> files present in target/
    split='unlabelled' -> input files with no target (set difference)
  * file list padded to a multiple of batch_size by wrapping (:38-39)
  * PIL bilinear resize for images, nearest for masks (:53-56)
  * returns dict {filename, img, target?}
"""
from __future__ import annotations

import os
import os.path as osp
import queue
import threading
from glob import glob
from typing import Optional, Sequence

import numpy as np

try:
    from PIL import Image
except ImportError:  # pragma: no cover
    Image = None

from vq_seg_tpu.data import fastimg


def _norm_resize(resize):
    if isinstance(resize, int):
        return (resize, resize)
    if isinstance(resize, (tuple, list)):
        return tuple(resize)
    if resize is None:
        return None
    raise ValueError(f"It's invalid type of resize {type(resize)}")


def _load_pair(img_path, target_path, resize, target_resize):
    # native fast path: libpng decode + fused PIL-convention resample +
    # float conversion in one GIL-free C call (data/fastimg.py; <=1/255 from
    # the PIL bilinear path, masks bit-exact — tests/test_fastimg.py).
    img_np = fastimg.load_rgb_f32(img_path, resize)
    if img_np is not None:
        tgt_np = None
        if target_path:
            tgt_np = fastimg.load_gray_u8(
                target_path, resize if target_resize else None)
        if tgt_np is not None or not target_path:
            return img_np, tgt_np
    img = Image.open(img_path).convert("RGB")
    target = Image.open(target_path).convert("L") if target_path else None
    if resize is not None:
        img = img.resize(resize, resample=Image.BILINEAR)
        if target_resize and target is not None:
            target = target.resize(resize, resample=Image.NEAREST)
    img_np = np.asarray(img, dtype=np.float32) / 255.0  # HWC, [0,1]
    tgt_np = np.asarray(target, dtype=np.uint8) if target is not None else None
    return img_np, tgt_np


class BaseDataset:
    """(data/dataset.py:15-62)."""

    def __init__(self, data_dir: str, split: str, batch_size: Optional[int] = None,
                 resize=None, target_resize: bool = True):
        self.resize = _norm_resize(resize)
        self.img_dir = os.path.join(data_dir, "input")
        self.target_resize = target_resize
        if split == "labelled":
            self.filenames = sorted(os.listdir(os.path.join(data_dir, "target")))
            self.target_dir = os.path.join(data_dir, "target")
        elif split == "unlabelled":
            self.filenames = sorted(
                set(os.listdir(os.path.join(data_dir, "input")))
                - set(os.listdir(os.path.join(data_dir, "target")))
            )
            self.target_dir = None
        else:
            raise ValueError("split has to be labelled or unlabelled")
        if batch_size is not None and len(self.filenames) % batch_size != 0:
            pad = batch_size - len(self.filenames) % batch_size
            # tile when pad exceeds the file count (reference-identical for
            # pad < len; a single wrap would leave the list non-divisible,
            # e.g. 2 unlabelled files at the --per_device_batch global batch)
            reps = -(-pad // len(self.filenames))
            self.filenames = self.filenames + (self.filenames * reps)[:pad]

    def __len__(self):
        return len(self.filenames)

    def __getitem__(self, index):
        filename = self.filenames[index]
        tgt_path = os.path.join(self.target_dir, filename) if self.target_dir else None
        img, tgt = _load_pair(os.path.join(self.img_dir, filename), tgt_path,
                              self.resize, self.target_resize)
        out = {"filename": filename, "img": img}
        if tgt is not None:
            out["target"] = tgt
        return out


class FolderDataset:
    """Unlabeled image folder for self-sup VQ-VAE pretraining
    (data/dataset.py:66-77)."""

    def __init__(self, data_dir: str, resize):
        self.images = sorted(glob(os.path.join(data_dir, "*.png")))
        self.resize = _norm_resize(resize)

    def __len__(self):
        return len(self.images)

    def __getitem__(self, index):
        img, _ = _load_pair(self.images[index], None, self.resize, False)
        return {"filename": osp.split(self.images[index])[-1], "img": img}


class SalientDataset(BaseDataset):
    """+ saliency-map channel (data/dataset.py:80-127)."""

    def __init__(self, data_dir: str, salient_dir: str, split: str, resize=None,
                 target_resize: bool = True):
        super().__init__(data_dir, split, None, resize, target_resize)
        self.salient_dir = salient_dir

    def __getitem__(self, index):
        out = super().__getitem__(index)
        sal_path = os.path.join(self.salient_dir, out["filename"])
        sal_np = fastimg.load_gray_u8(sal_path, self.resize)
        if sal_np is None:
            sal = Image.open(sal_path).convert("L")
            if self.resize is not None:
                sal = sal.resize(self.resize, resample=Image.NEAREST)
            sal_np = np.asarray(sal, dtype=np.uint8)
        out["salient_map"] = sal_np.astype(np.float32) / 255.0
        return out


class OBIADataset:
    """Mixes true targets with OBIA pseudo-targets (data/dataset.py:130-165)."""

    def __init__(self, data_dir: str, batch_size: Optional[int] = None, resize=None,
                 target_resize: bool = True):
        self.resize = _norm_resize(resize)
        self.img_dir = os.path.join(data_dir, "input")
        self.target_resize = target_resize
        self.target_files = sorted(
            glob(osp.join(data_dir, "target", "*.png")) + glob(osp.join(data_dir, "obia", "*.png"))
        )
        if batch_size is not None and len(self.target_files) % batch_size != 0:
            pad = batch_size - len(self.target_files) % batch_size
            reps = -(-pad // len(self.target_files))
            self.target_files = self.target_files + (self.target_files * reps)[:pad]

    def __len__(self):
        return len(self.target_files)

    def __getitem__(self, index):
        filename = osp.split(self.target_files[index])[-1]
        img, tgt = _load_pair(os.path.join(self.img_dir, filename), self.target_files[index],
                              self.resize, self.target_resize)
        return {"filename": filename, "img": img, "target": tgt}


class NormalizedDataset(BaseDataset):
    """mean/std-normalised variant (data/dataset.py:168-222).

    The reference normalises, converts back to a PIL uint8 image, and
    re-scales by 255 — net effect: clamp(normalise(img)*255)/255.  We apply
    the same observable pipeline.
    """

    def __init__(self, data_dir: str, split: str, batch_size: Optional[int] = None,
                 resize=None, target_resize: bool = True, mean=0.5, std=0.5):
        super().__init__(data_dir, split, batch_size, resize, target_resize)
        self.mean = mean
        self.std = std

    def __getitem__(self, index):
        out = super().__getitem__(index)
        img = (out["img"] - self.mean) / self.std
        img = np.clip(np.round(img * 255.0), 0, 255) / 255.0
        out["img"] = img.astype(np.float32)
        return out


class Loader:
    """Batched iterator with shuffle + background host loading + device
    prefetch.

    The torch DataLoader equivalent, redesigned for TPU input feeding:
    a worker thread decodes batch n+1 while batch n runs, and (optionally)
    ``jax.device_put``s it with a sharding so the H2D copy overlaps compute.
    """

    def __init__(self, dataset, batch_size: int, shuffle: bool = False,
                 seed: int = 0, drop_last: bool = False, device_put=None,
                 prefetch: int = 2, workers: int = 0, cache: bool = True,
                 cache_budget_bytes: int = 4 << 30):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.rng = np.random.default_rng(seed)
        self.drop_last = drop_last
        self.device_put = device_put
        self.prefetch = prefetch
        # decode pool: PIL's png decode releases the GIL, so a small thread
        # pool parallelises per-item decode+resize inside a batch (helps the
        # cold first epoch; measured in tools/loader_bench.py).
        self.workers = workers
        # decoded-item RAM cache.  The target workloads are 30-430 images
        # trained for ~400 epochs (BASELINE.md) while PNG decode sustains
        # only ~4 img/s at native CWFID resolution vs the ~44 img/s step —
        # brutally input-bound without this.  Decode once, serve from RAM
        # from epoch 2 on.  Disabled automatically if the decoded set would
        # exceed ``cache_budget_bytes`` (estimated from the first item).
        self._cache: Optional[dict] = {} if cache else None
        self._cache_budget = cache_budget_bytes

    def _get_item(self, i: int):
        if self._cache is None:
            return self.dataset[i]
        hit = self._cache.get(i)
        if hit is not None:
            return hit
        item = self.dataset[i]
        nbytes = sum(v.nbytes for v in item.values() if hasattr(v, "nbytes"))
        if nbytes * len(self.dataset) > self._cache_budget:
            self._cache = None  # too big — fall back to re-decoding
            return item
        self._cache[i] = item
        return item

    def __len__(self):
        n = len(self.dataset)
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    def _batches(self):
        order = np.arange(len(self.dataset))
        if self.shuffle:
            self.rng.shuffle(order)
        nb = len(self)
        pool = None
        if self.workers > 0:
            from concurrent.futures import ThreadPoolExecutor

            pool = ThreadPoolExecutor(max_workers=self.workers)
        try:
            for b in range(nb):
                idx = order[b * self.batch_size:(b + 1) * self.batch_size]
                if pool is not None:
                    items = list(pool.map(self._get_item, (int(i) for i in idx)))
                else:
                    items = [self._get_item(int(i)) for i in idx]
                batch = {"filename": [it["filename"] for it in items]}
                for key in items[0]:
                    if key == "filename":
                        continue
                    batch[key] = np.stack([it[key] for it in items], axis=0)
                yield batch
        finally:
            if pool is not None:
                pool.shutdown(wait=False)

    def __iter__(self):
        q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        STOP = object()

        def worker():
            # decode/IO errors are shipped to the consumer and re-raised
            # there — a clean STOP would silently truncate the epoch (and
            # evaluate() would average over a partial image set)
            try:
                for batch in self._batches():
                    if self.device_put is not None:
                        batch = {k: (self.device_put(v) if k != "filename" else v)
                                 for k, v in batch.items()}
                    q.put(batch)
                q.put(STOP)
            except BaseException as e:  # noqa: BLE001
                q.put(e)

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is STOP:
                break
            if isinstance(item, BaseException):
                raise item
            yield item
