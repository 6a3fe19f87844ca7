"""Per-op device-time profile of the flagship CPS train step.

Captures a ``jax.profiler`` trace of the bench.py profiles (default /
tuned / tuned_subpixel), parses the XPlane with
``jax.profiler.ProfileData``, and aggregates device time per optimizer
step by HLO category (convolution fusion, loop fusion, data formatting,
copy, ...) plus the top individual ops.  This is the measurement tool
behind VERDICT r3 item #1: find where the non-conv ~35 ms/step of the
default profile goes (reflect-pad copies, vmap transposes, loop fusions)
so it can be attacked.

Usage:  python tools/profile_step.py [default|tuned|tuned_subpixel] ...
Writes /tmp/profile_step/<profile>.json and prints the table.
"""
from __future__ import annotations

import collections
import glob
import json
import os
import sys

import jax
import jax.numpy as jnp
import optax

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import _random_batches  # noqa: E402

PROFILES = {
    # name -> (batch, decoder_channels, subpixel_tail)
    "default": (4, None, False),
    "tuned": (8, (256, 128, 64, 48, 32), False),
    "tuned_subpixel": (8, (256, 128, 64, 48, 32), True),
}


def build_multi_step(batch, hw, scan_steps, decoder_channels, subpixel_tail,
                     half=True, seed=0):
    from contextlib import nullcontext

    from vq_seg_tpu.losses import make_loss
    from vq_seg_tpu.models.layers import compute_dtype
    from vq_seg_tpu.models.networks import make_model
    from vq_seg_tpu.training.cps import (
        cps_init_phase,
        create_cps_state,
        make_cps_multi_step,
        make_cps_train_step_fused,
        make_cps_train_step_stacked,
        stack_cps_state,
    )

    params = {
        "encoder_name": "resnet50", "num_classes": 3,
        "vq_cfg": {"num_embeddings": [0, 0, 512, 512, 512],
                   "distance": "euclidean", "kmeans_init": True},
        "margin": 0.5, "scale": 30.0, "depth": 5,
    }
    if decoder_channels is not None:
        params["decoder_channels"] = list(decoder_channels)
    if subpixel_tail:
        params["subpixel_tail"] = True
    model = make_model({"name": "vqreptunet1x1v2", "params": params})
    tx = optax.adam(1e-4)
    dice = make_loss("dice_loss", 3, ignore_index=255)
    l_imgs, gts, ul_imgs = _random_batches(batch, hw, scan_steps, seed)
    with (compute_dtype(jnp.bfloat16) if half else nullcontext()):
        state = create_cps_state(model, tx, (l_imgs[0], gts[0], 0.7))
        state = cps_init_phase(model, state, l_imgs[0], gts[0], 0.7)
        state = stack_cps_state(state, tx)
        # mirror bench.py's per-profile composition (round-5 A/B): fused
        # (model x pass) step at bs<=4, stacked at bs8
        make = make_cps_train_step_fused if batch <= 4 else make_cps_train_step_stacked
        step = make(model, tx, dice, num_classes=3,
                    confidence_threshold=0.7, remat=not half)
        # make_cps_multi_step already jits with state donation — same
        # program as bench.py, so the persistent compile cache hits.
        multi = make_cps_multi_step(step, scan_steps)
    return multi, state, (l_imgs, gts, ul_imgs)


def capture(profile: str, hw=512, scan_steps=8, logdir_base="/tmp/profile_step"):
    batch, dec_ch, subpixel = PROFILES[profile]
    multi, state, batches = build_multi_step(batch, hw, scan_steps, dec_ch, subpixel)
    # Optimized HLO text (fusion bodies) — lets parse() classify each
    # %fusion.N trace event as convolution vs loop vs data-formatting.
    hlo_text = multi.lower(state, *batches).compile().as_text()
    os.makedirs(logdir_base, exist_ok=True)
    with open(os.path.join(logdir_base, f"{profile}.hlo.txt"), "w") as f:
        f.write(hlo_text)
    # warm up / compile outside the trace
    state, m, _, _ = multi(state, *batches)
    float(m["loss"])
    logdir = os.path.join(logdir_base, profile)
    os.makedirs(logdir, exist_ok=True)
    with jax.profiler.trace(logdir):
        state, m, _, _ = multi(state, *batches)
        float(m["loss"])
    return logdir, hlo_text


import re

# opcode = first lowercase token followed by '(' after the '='; dtype/tile
# tokens (f32[..], T(8,128), S(1)) never match this shape
_OPCODE_RE = re.compile(r"=.*?\s([a-z][a-z0-9-]+)\(", re.DOTALL)
_CALLS_RE = re.compile(r"calls=%([\w.\-]+)")

_DATA_FMT = {
    "copy", "copy-start", "copy-done", "transpose", "pad", "reshape",
    "bitcast", "broadcast", "slice", "dynamic-slice", "dynamic-update-slice",
    "concatenate", "reverse", "gather", "scatter", "iota",
}
_COMM = {"all-reduce", "all-gather", "reduce-scatter", "collective-permute",
         "all-to-all", "send", "recv"}


def build_conv_computations(hlo_text: str):
    """Set of fused-computation names whose body contains a convolution."""
    conv_comps = set()
    cur = None
    for line in hlo_text.splitlines():
        s = line.strip()
        if s.startswith("%fused_computation") or (s.startswith("ENTRY") is False
                                                  and s.endswith("{") and s.startswith("%")):
            cur = s.split(" ", 1)[0].lstrip("%")
        elif s.startswith("}"):
            cur = None
        elif cur is not None and " convolution(" in s:
            conv_comps.add(cur)
    return conv_comps


def classify(instr: str, conv_comps) -> str:
    """Category of one HLO instruction (full text) from the trace."""
    m = _OPCODE_RE.search(instr)
    opcode = m.group(1) if m else "?"
    if opcode == "fusion":
        cm = _CALLS_RE.search(instr)
        comp = cm.group(1) if cm else ""
        base = comp
        while base.endswith(".clone"):
            base = base[: -len(".clone")]
        if comp in conv_comps or base in conv_comps:
            return "convolution fusion"
        km = re.search(r"kind=k(\w+)", instr)
        kind = km.group(1) if km else "?"
        # name-prefix of the instruction hints at the fused ops
        name = instr.split(" = ", 1)[0].lstrip("%")
        if any(t in name for t in ("pad", "transpose", "copy", "bitcast",
                                   "reshape", "slice", "concat")):
            return f"data-formatting fusion (k{kind})"
        return f"loop fusion (k{kind})" if kind == "Loop" else f"fusion (k{kind})"
    if opcode == "convolution":
        return "convolution"
    if opcode == "custom-call":
        if "tpu_custom_call" in instr or "Mosaic" in instr:
            return "pallas kernel"
        return "custom-call"
    if opcode in ("select-and-scatter",):
        return "maxpool backward (select-and-scatter)"
    if opcode in ("reduce-window",):
        return "pool (reduce-window)"
    if opcode in _DATA_FMT:
        return "data formatting"
    if opcode in _COMM:
        return "communication"
    if opcode in ("dot",):
        return "matmul"
    return opcode


def parse(logdir: str, scan_steps=8, hlo_text: str = ""):
    """Aggregate device-plane op durations by category.

    Returns (per-category ms/step dict, top-op list).  Durations are summed
    over the traced region (ONE multi-step dispatch = ``scan_steps``
    optimizer steps) and divided by scan_steps.  Fusions are classified
    convolution-vs-loop by joining their ``calls=`` computation against the
    optimized HLO's fusion bodies (``hlo_text``).
    """
    files = sorted(glob.glob(os.path.join(logdir, "**", "*.xplane.pb"),
                             recursive=True), key=os.path.getmtime)
    if not files:
        raise FileNotFoundError(f"no xplane.pb under {logdir}")
    data = jax.profiler.ProfileData.from_file(files[-1])
    conv_comps = build_conv_computations(hlo_text)
    cat_ns = collections.Counter()
    op_ns = collections.Counter()
    op_cat = {}
    n_device_planes = 0
    for plane in data.planes:
        if not plane.name.startswith("/device:TPU:"):
            continue
        n_device_planes += 1
        for line in plane.lines:
            # the op-level line is "XLA Ops" (per-core timeline of HLO ops)
            if line.name not in ("XLA Ops",):
                continue
            for ev in line.events:
                m = _OPCODE_RE.search(ev.name)
                opcode = m.group(1) if m else "?"
                if opcode in ("while", "call", "conditional"):
                    continue  # wrappers double-count their body ops
                dur = ev.duration_ns
                cat = classify(ev.name, conv_comps)
                cat_ns[cat] += dur
                short = ev.name.split(" = ", 1)[0]
                op_ns[short] += dur
                op_cat[short] = cat
    if n_device_planes == 0:
        raise RuntimeError("no TPU device plane in trace; planes = "
                           + ", ".join(p.name for p in data.planes))
    cats = {k: v / 1e6 / scan_steps for k, v in cat_ns.most_common()}
    tops = [{"op": k, "ms": v / 1e6 / scan_steps, "category": op_cat[k]}
            for k, v in op_ns.most_common(40)]
    return cats, tops


def main():
    profiles = sys.argv[1:] or ["default"]
    out = {}
    for prof in profiles:
        logdir, hlo_text = capture(prof)
        cats, tops = parse(logdir, hlo_text=hlo_text)
        total = sum(cats.values())
        print(f"\n=== {prof}: {total:.1f} ms/step device time ===")
        for k, v in cats.items():
            print(f"  {k:30s} {v:8.2f} ms  {100 * v / total:5.1f}%")
        print("  top ops:")
        for t in tops[:25]:
            print(f"    {t['ms']:7.2f} ms  [{t['category']}] {t['op'][:90]}")
        out[prof] = {"total_ms": total, "categories": cats, "top_ops": tops}
        with open(f"/tmp/profile_step/{prof}.json", "w") as f:
            json.dump(out[prof], f, indent=1)
    print(json.dumps({p: {"total_ms": round(v["total_ms"], 2),
                          "categories": {k: round(m, 2) for k, m in v["categories"].items()}}
                      for p, v in out.items()}, indent=1))


if __name__ == "__main__":
    main()
