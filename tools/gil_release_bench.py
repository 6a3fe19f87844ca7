"""Demonstrate that the C decode path releases the GIL (VERDICT r4 #9).

BASELINE.md asserted "the C calls release the GIL, so the worker pool scales
with cores on production hosts" — thread *throughput* scaling is
unmeasurable on this 1-core box (a released GIL doesn't conjure a second
CPU).  What IS measurable on one core is the GIL release itself, as
scheduling latency:

  A counter thread timestamps every iteration and records its worst stall.
  While a sibling thread loops a LONG C call (~100 ms PNG decode):
    * if the call RELEASES the GIL, the OS scheduler preempts the decode
      thread on its normal quantum, so the counter's max stall stays at
      scheduler-tick scale (few–tens of ms);
    * if the call HOLDS the GIL, the counter cannot run until the call
      returns — max stall ~= the full decode duration.

  The control is exact: the SAME shared library loaded via ctypes.PyDLL,
  whose foreign calls hold the GIL by construction, calling the SAME
  fi_decode on the same file.  Work, duration, and cache behavior are
  identical; only the GIL discipline differs.

    python tools/gil_release_bench.py [--seconds 4]
"""
from __future__ import annotations

import argparse
import ctypes
import json
import os
import sys
import threading
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
from PIL import Image

from vq_seg_tpu.data import fastimg
from vq_seg_tpu.data.fastimg import _u8p


def make_png(tmpdir, hw=966, wd=1296) -> str:
    rng = np.random.default_rng(0)
    # natural-image-like content so deflate does real work
    y = np.linspace(0, 255, hw, dtype=np.float32)[:, None, None]
    x = np.linspace(0, 255, wd, dtype=np.float32)[None, :, None]
    img = (0.5 * y + 0.3 * x + rng.normal(0, 12, (hw, wd, 3))).clip(0, 255)
    path = os.path.join(tmpdir, "gil_bench.png")
    Image.fromarray(img.astype(np.uint8)).save(path)
    return path


def stall_probe(stop_evt, out):
    """Max gap (s) between successive Python-bytecode iterations."""
    worst = 0.0
    n = 0
    prev = time.perf_counter()
    while not stop_evt.is_set():
        now = time.perf_counter()
        gap = now - prev
        if gap > worst:
            worst = gap
        prev = now
        n += 1
    out.append((worst, n))


def measure(load_fn, seconds):
    """(max_stall_ms, calls_per_s) of the probe thread while load_fn loops."""
    stop = threading.Event()
    out, calls = [], [0]

    def load_loop():
        while not stop.is_set():
            load_fn()
            calls[0] += 1

    threads = [threading.Thread(target=stall_probe, args=(stop, out)),
               threading.Thread(target=load_loop)]
    for t in threads:
        t.start()
    time.sleep(seconds)
    stop.set()
    for t in threads:
        t.join()
    return out[0][0] * 1e3, calls[0] / seconds


def decode_via(lib, path):
    """One fi_decode + fi_free through the given ctypes handle."""
    data = _u8p()
    h, w, c = ctypes.c_int(), ctypes.c_int(), ctypes.c_int()
    if lib.fi_decode(path.encode(), ctypes.byref(data), ctypes.byref(h),
                     ctypes.byref(w), ctypes.byref(c)) == 0:
        lib.fi_free(data)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seconds", type=float, default=4.0)
    ap.add_argument("--hw", type=int, default=1932,
                    help="PNG height (longer decode -> clearer separation)")
    args = ap.parse_args()

    cdll = fastimg.load()
    if cdll is None:
        raise SystemExit("fastimg C library unavailable on this host")
    so_path = cdll._name
    pydll = ctypes.PyDLL(so_path)  # GIL-HOLDING handle to the same code
    for lib in (pydll,):
        lib.fi_decode.argtypes = [ctypes.c_char_p, ctypes.POINTER(_u8p),
                                  ctypes.POINTER(ctypes.c_int),
                                  ctypes.POINTER(ctypes.c_int),
                                  ctypes.POINTER(ctypes.c_int)]
        lib.fi_decode.restype = ctypes.c_int
        lib.fi_free.argtypes = [_u8p]
        lib.fi_free.restype = None

    import tempfile

    with tempfile.TemporaryDirectory() as td:
        path = make_png(td, hw=args.hw, wd=(args.hw * 4) // 3)
        # time one decode for context
        t0 = time.perf_counter()
        decode_via(cdll, path)
        decode_ms = (time.perf_counter() - t0) * 1e3

        # idle floor: probe alone
        stop = threading.Event()
        out = []
        t = threading.Thread(target=stall_probe, args=(stop, out))
        t.start()
        time.sleep(args.seconds)
        stop.set()
        t.join()
        idle_ms = out[0][0] * 1e3

        rel_ms, rel_dps = measure(lambda: decode_via(cdll, path), args.seconds)
        held_ms, held_dps = measure(lambda: decode_via(pydll, path), args.seconds)

    report = {
        "host_cores": os.cpu_count(),
        "decode_ms_per_call": round(decode_ms, 1),
        "probe_max_stall_ms": {
            "idle": round(idle_ms, 1),
            "decode_via_CDLL_gil_released": round(rel_ms, 1),
            "decode_via_PyDLL_gil_held_control": round(held_ms, 1)},
        "decodes_per_s": {"CDLL": round(rel_dps, 1), "PyDLL": round(held_dps, 1)},
    }
    print(json.dumps(report, indent=1))
    released = rel_ms < 0.5 * held_ms and held_ms > 0.8 * decode_ms
    print(f"GIL during C decode: {'RELEASED' if released else 'INCONCLUSIVE'} "
          f"— probe stalls {rel_ms:.0f} ms under CDLL decoding vs "
          f"{held_ms:.0f} ms under the GIL-holding PyDLL control "
          f"(~one full {decode_ms:.0f} ms decode, as a held GIL forces)")
    return report


if __name__ == "__main__":
    main()
