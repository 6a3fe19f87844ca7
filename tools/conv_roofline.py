"""Isolated-conv roofline check (VERDICT #6 writeup evidence): measure the
achieved TF/s of the flagship step's dominant conv shapes on this chip, so
"the step is conv-bound at the achievable single-conv rate" is a measured
claim, not an assumption.

    python tools/conv_roofline.py
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

# (label, N, H, W, Cin, Cout, k, stride) — the flagship's FLOPs-dominant
# convs at 512^2 input (encoder resnet50 stage shapes; decoder plan
# 1024,512,256,128,32), batch 8 = the stacked sup pass (2 models x bs 4).
SHAPES = [
    ("enc stem 7x7/2", 8, 512, 512, 3, 64, 7, 2),
    ("enc l1 3x3", 8, 128, 128, 64, 64, 3, 1),
    ("enc l2 3x3", 8, 64, 64, 128, 128, 3, 1),
    ("enc l3 3x3", 8, 32, 32, 256, 256, 3, 1),
    ("enc l4 3x3", 8, 16, 16, 512, 512, 3, 1),
    ("enc l4 1x1 expand", 8, 16, 16, 512, 2048, 1, 1),
    ("dec b0 3x3", 8, 16, 16, 2048, 1024, 3, 1),
    ("dec b1 3x3", 8, 32, 32, 1536, 512, 3, 1),
    ("dec b2 3x3", 8, 64, 64, 1024, 256, 3, 1),
    ("dec b3 3x3", 8, 128, 128, 512, 128, 3, 1),
    ("dec b4 3x3", 8, 256, 256, 160, 32, 3, 1),
    ("big square (roofline probe)", 8, 32, 32, 1024, 1024, 3, 1),
]


def bench_conv(n, h, w, cin, cout, k, stride, reps=20, iters=5):
    """Scan ``reps`` distinct-kernel conv applications inside ONE jit so the
    per-dispatch tunnel latency (~1 ms) amortises away; accumulate outputs
    to defeat CSE/DCE."""
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (n, h, w, cin), jnp.bfloat16)
    kerns = jax.random.normal(key, (reps, k, k, cin, cout), jnp.bfloat16)

    @jax.jit
    def f(x, kerns):
        def body(acc, kern):
            y = jax.lax.conv_general_dilated(
                x, kern, (stride, stride), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            return acc + y, None

        oh, ow = (h + stride - 1) // stride, (w + stride - 1) // stride
        acc = jnp.zeros((n, oh, ow, cout), jnp.bfloat16)
        return jax.lax.scan(body, acc, kerns)[0]

    out = f(x, kerns)
    out.block_until_ready()
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = f(x, kerns)
        np.asarray(out[0, 0, 0, :1])  # hard sync through the tunnel
        best = min(best, (time.perf_counter() - t0) / (iters * reps))
    oh, ow = out.shape[1:3]
    flops = 2 * n * oh * ow * cin * cout * k * k
    return best, flops


def main():
    total_t, total_f = 0.0, 0
    for label, n, h, w, cin, cout, k, s in SHAPES:
        t, f = bench_conv(n, h, w, cin, cout, k, s)
        total_t += t
        total_f += f
        print(json.dumps({"conv": label, "ms": round(t * 1e3, 3),
                          "TFLOP/s": round(f / t / 1e12, 1)}), flush=True)
    print(json.dumps({"aggregate TFLOP/s over the suite":
                      round(total_f / total_t / 1e12, 1)}))


if __name__ == "__main__":
    main()
