"""Serving-path benchmark on the real TPU (vq_seg_tpu/serving.py).

Measures the flagship predictor (resnet50, K=512 codebooks, 512² input —
the reference production shape) end-to-end INCLUDING host↔device
transfers, which is what a deployment sees:

  * batch 1 p50/p90 latency (uint8 in → uint8 labels out)
  * batch 8 pipelined throughput via predict_stream (one batch in flight)
  * f32 vs bf16 (half) weight profiles

Prints one JSON line; numbers recorded in BASELINE.md.  Note the axon
tunnel adds ~ms dispatch and 0.5–3 MB/s transfer overhead a direct-attached
v5e does not have; uint8 I/O keeps the wire cost at 0.79 MB per 512² image
each way (vs 3.1 MB f32 in, 9.4 MB logits out).
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "..", ".jax_cache_tpu"))
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)

import numpy as np

from vq_seg_tpu.models.networks import make_model
from vq_seg_tpu.serving import Predictor


def build(batch, hw, half, quant=None):
    model = make_model({"name": "vqreptunet1x1v2", "params": {
        "encoder_name": "resnet50", "num_classes": 3,
        "vq_cfg": {"num_embeddings": [0, 0, 512, 512, 512],
                   "distance": "euclidean", "kmeans_init": True},
        "margin": 0.5, "scale": 30.0,
    }})
    rng = np.random.default_rng(0)
    x0 = rng.uniform(size=(batch, hw, hw, 3)).astype(np.float32)
    variables = model.init(jax.random.PRNGKey(0), x0)
    t0 = time.time()
    pred = Predictor(model, variables, input_hw=(hw, hw), batch_size=batch,
                     half=half, quant=quant)
    return pred, time.time() - t0


def bench_latency(pred, hw, iters=30):
    rng = np.random.default_rng(1)
    imgs = [rng.integers(0, 256, size=(pred.batch_size, hw, hw, 3)).astype(np.uint8)
            for _ in range(iters)]
    pred(imgs[0])  # warm
    times = []
    for im in imgs:
        t0 = time.perf_counter()
        pred(im)
        times.append(time.perf_counter() - t0)
    t = np.asarray(times) * 1e3
    return float(np.percentile(t, 50)), float(np.percentile(t, 90))


def bench_device_only(pred, hw, iters=30):
    """Forward latency with the input already device-resident and no label
    fetch — the compute term a direct-attached chip sees (the end-to-end
    numbers add the axon tunnel's host<->device wire time on top)."""
    import jax

    rng = np.random.default_rng(3)
    imgs = rng.integers(0, 256, size=(pred.batch_size, hw, hw, 3)).astype(np.uint8)
    dev = jax.device_put(imgs)
    pred._fn(pred._vars, dev).block_until_ready()  # warm
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        pred._fn(pred._vars, dev).block_until_ready()
        times.append(time.perf_counter() - t0)
    return float(np.percentile(np.asarray(times) * 1e3, 50))


def bench_stream(pred, hw, iters=30):
    rng = np.random.default_rng(2)
    batches = [rng.integers(0, 256, size=(pred.batch_size, hw, hw, 3)).astype(np.uint8)
               for _ in range(iters)]
    pred(batches[0])  # warm
    t0 = time.perf_counter()
    n = 0
    for lab in pred.predict_stream(batches):
        n += lab.shape[0]
    dt = time.perf_counter() - t0
    return n / dt


def accuracy_delta_int8(hw, n=8):
    """Per-pixel argmax agreement of int8 vs f32 predictors on the hard
    weedfield synthetic set (tools/synthetic_data.py) — the accuracy gate
    for the int8 serving row.  (The bench model is random-init, so mIoU is
    meaningless here; the trained-weights delta belongs to the user's
    checkpoint, gated the same way.)"""
    from tools.synthetic_data import make_weedfield

    (imgs, _), _, _ = make_weedfield(hw=min(hw, 256), n_lab=n, n_unlab=0,
                                     n_test=0)
    u8 = (imgs * 255).astype(np.uint8)
    f32p, _ = build(n, u8.shape[1], half=False)
    q8p, _ = build(n, u8.shape[1], half=False, quant="int8")
    agree = float(np.mean(f32p(u8) == q8p(u8)))
    return {"argmax_agreement_vs_f32": round(agree, 4)}


def main():
    profiles = [("bf16", dict(half=True)), ("f32", dict(half=False)),
                ("int8", dict(half=True, quant="int8"))]
    only = os.environ.get("PROFILES")
    if only:
        profiles = [p for p in profiles if p[0] in only.split(",")]
    hw = int(os.environ.get("HW", "512"))
    out = {"hw": hw, "backend": jax.default_backend()}
    for key, kw in profiles:
        p1, build_s = build(1, hw, **kw)
        p50, p90 = bench_latency(p1, hw)
        out[key] = {"build_s": round(build_s, 1),
                    "batch1_p50_ms": round(p50, 1),
                    "batch1_p90_ms": round(p90, 1),
                    "batch1_device_ms": round(bench_device_only(p1, hw), 2)}
        del p1
        p8, _ = build(8, hw, **kw)
        out[key]["batch8_device_ms"] = round(bench_device_only(p8, hw), 2)
        out[key]["batch8_stream_img_per_s"] = round(bench_stream(p8, hw), 2)
        del p8
        if key == "int8":
            out[key]["vs_f32"] = accuracy_delta_int8(hw)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
