"""HLO collective audit: what each multi-chip layout actually communicates.

VERDICT r3 #6: the multi-chip story had correctness evidence (4 layouts run
and agree on the virtual mesh) but no *communication* numbers.  This tool
compiles ONE full CPS training step per layout on the 8-device virtual CPU
mesh (the same programs ``__graft_entry__.dryrun_multichip`` executes, at a
bigger audit shape), walks the optimized HLO, and totals every collective's
byte volume per step:

  * dp        — stacked step, batch over ``data``(8), params replicated
  * pair      — pair-sharded production step, dp=4 x model-pair=2
  * dp x tp   — unstacked step, channel-sharded kernels over ``model``
  * spatial   — stacked step, dp=4 x image rows over ``space``=2

Byte volumes are computed from the collective's OUTPUT shapes (the ICI
payload each chip receives per op instance); `replica_groups` sizes are
reported so ring-time estimates use the right group size.  Collectives
inside while/scan bodies are counted once (no scan in the single step).

Run:  XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
      python tools/collective_audit.py [--hw 64] [--fast]
Writes COLLECTIVES.json at the repo root and prints the table that backs
the BASELINE.md scaling section.
"""
from __future__ import annotations

import argparse
import collections
import json
import os
import re
import sys

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.pop("PALLAS_AXON_POOL_IPS", None)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 "tests", ".jax_cache"))
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

_DTYPE_BYTES = {"pred": 0.125, "s1": 1, "s8": 1, "u8": 1, "s16": 2, "u16": 2,
                "s32": 4, "u32": 4, "s64": 8, "u64": 8, "f8": 1, "bf16": 2,
                "f16": 2, "f32": 4, "f64": 8, "c64": 8, "c128": 16}

_COLLECTIVES = ("all-reduce", "all-gather", "reduce-scatter",
                "collective-permute", "all-to-all", "collective-broadcast")

_SHAPE_RE = re.compile(r"([a-z]+[0-9]*)\[([0-9,]*)\]")


def _shape_bytes(shape_txt: str) -> int:
    """Total bytes of all array shapes in an HLO result type string."""
    total = 0
    for dtype, dims in _SHAPE_RE.findall(shape_txt):
        if dtype not in _DTYPE_BYTES:
            continue
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        total += int(n * _DTYPE_BYTES[dtype])
    return total


def audit_hlo(hlo_text: str) -> dict:
    """Per-collective-kind byte totals from optimized HLO text."""
    per_kind = collections.defaultdict(
        lambda: {"count": 0, "bytes": 0, "wire": 0.0, "ops": []})
    for line in hlo_text.splitlines():
        line = line.strip()
        m = re.match(r"^(?:ROOT )?%?[\w.\-]+ = (.+?) ([a-z\-]+)(?:-start|-done)?\(", line)
        if not m:
            continue
        shape_txt, op = m.group(1), m.group(2)
        # normalise async forms: count -start, skip -done (same transfer)
        raw_op = line.split("=", 1)[1].strip()
        kind = None
        for c in _COLLECTIVES:
            if re.search(rf"\b{c}(-start)?\(", raw_op):
                kind = c
                break
            if re.search(rf"\b{c}-done\(", raw_op):
                kind = "skip"
                break
        if kind is None or kind == "skip":
            continue
        nbytes = _shape_bytes(shape_txt)
        groups = re.search(r"replica_groups=\{\{([^}]*)\}", line)
        if groups:
            gsize = len(groups.group(1).split(","))
        else:
            # iota form: replica_groups=[NGROUPS,GSIZE]<=[...]
            iota = re.search(r"replica_groups=\[\d+,(\d+)\]", line)
            gsize = int(iota.group(1)) if iota else 0
        d = per_kind[kind]
        d["count"] += 1
        d["bytes"] += nbytes
        # per-chip ICI wire bytes under a ring algorithm: all-reduce moves
        # 2B(g-1)/g through each chip, gather/scatter-style ops B(g-1)/g,
        # permute exactly B.  Unknown group (g=0) -> worst case.
        g = gsize if gsize > 1 else 8
        if kind == "all-reduce":
            wire = 2 * nbytes * (g - 1) / g
        elif kind == "collective-permute":
            wire = nbytes
        else:
            wire = nbytes * (g - 1) / g
        d["wire"] += wire
        d["ops"].append({"bytes": nbytes, "group_size": gsize,
                         "shape": shape_txt[:80]})
    out = {k: {"count": v["count"], "mbytes": v["bytes"] / 1e6,
               "wire_mbytes": v["wire"] / 1e6,
               "ops": sorted(v["ops"], key=lambda o: -o["bytes"])[:6]}
           for k, v in per_kind.items()}
    out["total_mbytes"] = sum(v["bytes"] for v in per_kind.values()) / 1e6
    out["total_wire_mbytes"] = sum(v["wire"] for v in per_kind.values()) / 1e6
    # ring time at nominal v5e ICI ~45 GB/s usable per chip (order-of-
    # magnitude estimate for the BASELINE.md scaling table)
    out["est_ici_ms_at_45GBps"] = out["total_wire_mbytes"] / 45e3 * 1e3
    return out


def _flagship(encoder="resnet50", k=64):
    from vq_seg_tpu.models.networks import make_model

    return make_model({
        "name": "vqreptunet1x1v2",
        "params": {"encoder_name": encoder, "num_classes": 3,
                   "vq_cfg": {"num_embeddings": [0, 0, k, k, k],
                              "distance": "euclidean", "kmeans_init": True},
                   "margin": 0.5, "scale": 30.0, "depth": 5},
    })


def build_layouts(hw: int, encoder: str):
    """Compile one CPS step per layout; return {layout: optimized HLO}."""
    import optax

    from vq_seg_tpu.losses import make_loss
    from vq_seg_tpu.parallel import batch_sharding, make_mesh, replicated
    from vq_seg_tpu.parallel.tp import apply_tp
    from vq_seg_tpu.training.cps import (
        cps_init_phase,
        create_cps_state,
        make_cps_train_step,
        make_cps_train_step_pairsharded,
        make_cps_train_step_stacked,
        shard_pair_state,
        stack_cps_state,
    )

    devices = jax.devices()[:8]
    model = _flagship(encoder)
    tx = optax.adam(1e-4)
    dice = make_loss("dice_loss", 3, ignore_index=255)
    batch = 8
    x = jnp.zeros((batch, hw, hw, 3), jnp.float32)
    gt = jnp.zeros((batch, hw, hw), jnp.int32)
    state = create_cps_state(model, tx, (x, gt, 0.7))
    state = cps_init_phase(model, state, x, gt, 0.7)
    hlos = {}
    meta = {}

    def _lower_text(fn, *args):
        return fn.lower(*args).compile().as_text()

    # --- dp: 8-way data parallel, stacked params replicated
    mesh = make_mesh(n_data=8, n_model=1, devices=devices)
    with mesh:
        st = stack_cps_state(jax.tree_util.tree_map(jnp.copy, state), tx)
        rsh, bsh = replicated(mesh), batch_sharding(mesh)
        svars = jax.tree_util.tree_map(lambda a: jax.device_put(a, rsh), st.variables_1)
        st = st.replace(variables_1=svars,
                        opt_state_1=jax.jit(tx.init)(svars["params"]),
                        step=jax.device_put(st.step, rsh))
        xs, gts = jax.device_put(x, bsh), jax.device_put(gt, bsh)
        step = make_cps_train_step_stacked(model, tx, dice, num_classes=3,
                                           confidence_threshold=0.7)
        hlos["dp8"] = _lower_text(step, st, xs, gts, xs)
        meta["dp8"] = "batch/8 over data, both models replicated on all 8"

    # --- pair: dp=4 x model-pair=2 (the production pair-sharded step)
    mesh = make_mesh(n_data=4, n_model=2, devices=devices)
    with mesh:
        pst = shard_pair_state(
            stack_cps_state(jax.tree_util.tree_map(jnp.copy, state), tx), mesh)
        pstep = make_cps_train_step_pairsharded(
            model, tx, dice, mesh, num_classes=3, confidence_threshold=0.7)(pst)
        bsh = batch_sharding(mesh)
        xs, gts = jax.device_put(x, bsh), jax.device_put(gt, bsh)
        hlos["pair_dp4x2"] = _lower_text(pstep, pst, xs, gts, xs)
        meta["pair_dp4x2"] = ("each CPS branch on its own 4-device group; "
                              "pseudo-label swap rides collective-permute")

    # --- dp x channel-tp: unstacked step, kernels channel-sharded over model
    mesh = make_mesh(n_data=4, n_model=2, devices=devices)
    with mesh:
        us = jax.tree_util.tree_map(jnp.copy, state)
        v1, v2 = apply_tp(us.variables_1, mesh), apply_tp(us.variables_2, mesh)
        ust = us.replace(variables_1=v1, variables_2=v2,
                         opt_state_1=jax.jit(tx.init)(v1["params"]),
                         opt_state_2=jax.jit(tx.init)(v2["params"]),
                         step=jax.device_put(us.step, replicated(mesh)))
        bsh = batch_sharding(mesh)
        xs, gts = jax.device_put(x, bsh), jax.device_put(gt, bsh)
        ustep = make_cps_train_step(model, tx, dice, num_classes=3,
                                    confidence_threshold=0.7)
        hlos["dp4xtp2"] = _lower_text(ustep, ust, xs, gts, xs)
        meta["dp4xtp2"] = "wide kernels channel-sharded 2-way over model axis"

    # --- spatial: dp=4 x space=2 (rows sharded; conv halo exchange)
    smesh = make_mesh(n_data=4, n_model=1, n_space=2, devices=devices)
    with smesh:
        sst = stack_cps_state(jax.tree_util.tree_map(jnp.copy, state), tx)
        srep, sbsh = replicated(smesh), batch_sharding(smesh)
        svars = jax.tree_util.tree_map(lambda a: jax.device_put(a, srep), sst.variables_1)
        sst = sst.replace(variables_1=svars,
                          opt_state_1=jax.jit(tx.init)(svars["params"]),
                          step=jax.device_put(sst.step, srep))
        sxs, sgts = jax.device_put(x, sbsh), jax.device_put(gt, sbsh)
        sstep = make_cps_train_step_stacked(model, tx, dice, num_classes=3,
                                            confidence_threshold=0.7)
        hlos["dp4xspace2"] = _lower_text(sstep, sst, sxs, sgts, sxs)
        meta["dp4xspace2"] = "image rows over space=2; GSPMD halo-exchange convs"
    return hlos, meta


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--hw", type=int, default=64)
    ap.add_argument("--encoder", default="resnet50")
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "COLLECTIVES.json"))
    args = ap.parse_args()

    hlos, meta = build_layouts(args.hw, args.encoder)
    report = {"shape": f"{args.encoder} @{args.hw}^2, global batch 8+8, 8 virtual devices",
              "layouts": {}}
    for name, txt in hlos.items():
        audit = audit_hlo(txt)
        report["layouts"][name] = {"desc": meta[name], **audit}
        print(f"\n=== {name} — {meta[name]}")
        for kind, v in audit.items():
            if not isinstance(v, dict):
                continue
            print(f"  {kind:22s} x{v['count']:3d}  {v['mbytes']:9.2f} MB  "
                  f"(wire {v['wire_mbytes']:9.2f} MB)")
            for o in v["ops"][:3]:
                print(f"      {o['bytes'] / 1e6:8.2f} MB  groups of {o['group_size']}  {o['shape']}")
        print(f"  TOTAL {audit['total_mbytes']:.2f} MB/step payload, "
              f"{audit['total_wire_mbytes']:.2f} MB wire/chip, "
              f"~{audit['est_ici_ms_at_45GBps']:.1f} ms on v5e ICI")
    with open(args.out, "w") as f:
        json.dump(report, f, indent=1)
    print(f"\nwrote {args.out}")


if __name__ == "__main__":
    main()
