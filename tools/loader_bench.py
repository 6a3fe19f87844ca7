"""Input-pipeline throughput under load (VERDICT #9): how many images/sec
the Loader sustains decoding REAL-size PNGs at 512^2, vs the train step's
consumption rate (~44 img/s/chip @512^2 in BENCH_r01).

    python tools/loader_bench.py [--n 64] [--batch 8] [--res 512]

Writes one line per worker setting; paste the numbers into BASELINE.md.
"""
from __future__ import annotations

import argparse
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
from PIL import Image

from vq_seg_tpu.data import BaseDataset, Loader


def build_dataset(root: str, n: int, src_res: int = 966):
    """CWFID-like PNGs: native ~1296x966 photos, bilinear-resized by the
    loader.  Natural-image content so PNG entropy (and decode cost) is
    realistic, not flat-color best-case."""
    rng = np.random.default_rng(0)
    os.makedirs(f"{root}/train/input")
    os.makedirs(f"{root}/train/target")
    base = rng.integers(0, 256, (src_res // 8, src_res // 8, 3), dtype=np.uint8)
    for i in range(n):
        # upscale noise + noise overlay: mid-entropy like field imagery
        img = np.asarray(Image.fromarray(base).resize((src_res, src_res),
                                                      Image.BILINEAR))
        img = np.clip(img.astype(np.int16)
                      + rng.integers(-20, 20, img.shape, dtype=np.int16),
                      0, 255).astype(np.uint8)
        Image.fromarray(img).save(f"{root}/train/input/im{i:04d}.png")
        mask = rng.choice([0, 128, 255], size=(src_res, src_res)).astype(np.uint8)
        Image.fromarray(mask, mode="L").save(f"{root}/train/target/im{i:04d}.png")
        base = img[:: 8, :: 8]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=64)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--res", type=int, default=512)
    ap.add_argument("--src_res", type=int, default=966)
    args = ap.parse_args()

    with tempfile.TemporaryDirectory(prefix="loader_bench_") as root:
        print(f"building {args.n} PNGs at {args.src_res}^2 ...")
        build_dataset(root, args.n, args.src_res)
        sz = sum(os.path.getsize(os.path.join(root, "train/input", f))
                 for f in os.listdir(os.path.join(root, "train/input")))
        print(f"dataset: {args.n} images, {sz / args.n / 1e6:.2f} MB/img avg")
        ds = BaseDataset(os.path.join(root, "train"), "labelled",
                         batch_size=args.batch, resize=args.res)
        for workers in (0, 4):
            for cache in (False, True):
                loader = Loader(ds, args.batch, shuffle=False, workers=workers,
                                cache=cache)
                next(iter(loader))  # warmup (page cache / fills item cache partially)
                rates = []
                for epoch in range(2 if cache else 1):
                    t0 = time.perf_counter()
                    n_img = 0
                    for batch in loader:
                        n_img += batch["img"].shape[0]
                    rates.append(n_img / (time.perf_counter() - t0))
                tag = f"workers={workers} cache={int(cache)}"
                line = f"{tag}: epoch1 {rates[0]:8.1f} img/s"
                if cache:
                    line += f", epoch2 {rates[1]:8.1f} img/s (RAM-cached)"
                print(line)


if __name__ == "__main__":
    main()
