"""Measure WHY jax-vs-torch VQ assignments disagree at flagship scale
(VERDICT r4 weak #3 / next-round #3).

PARITY_RUN_FLAGSHIP.md attributes the 22% commitment-loss max rel dev to a
"K=512 tie-breaking artifact": kmeans init with only ~1-4k vectors leaves
most codes at duplicate zero-bin values, so near-equidistant pixels route to
different code ids across frameworks.  This tool measures that claim
directly instead of asserting it:

  A. codebook tie-group structure after the REAL kmeans init — how many of
     the K codes are exact duplicates (vq_img.py:29-63 zero-bin keep-old is
     the duplicate source), group sizes;
  B. per-stage assignment comparison on identical weights+batch — total
     disagreement rate, then each disagreeing pixel classified as
       pure-relabel : the two chosen codes are IDENTICAL rows (quantized
                      value unchanged — affects code ids only),
       near-tie     : f64 distance gap between chosen codes below f32
                      noise for that feature magnitude,
       real         : distance gap above noise — upstream f32 feature
                      divergence moved the argmin between distinct codes;
  C. the f64 commitment-loss delta attributable to each class (pure-relabel
     contributes exactly 0, near-ties ~0 — whatever remains is upstream
     noise, not tie-breaking).

    JAX_PLATFORMS=cpu python tools/tie_break_measurement.py \
        [--encoder resnet50] [--k 512] [--hw 128] [--out TIE_BREAK.md]
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.pop("PALLAS_AXON_POOL_IPS", None)
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax
import jax.numpy as jnp
import numpy as np
import optax
import torch

import tools.parity_run as pr
from tools.torch_flagship import TorchVQRePTUnet1x1v2, TorchVQ, load_from_flax
from vq_seg_tpu.models.networks import make_model
from vq_seg_tpu.training.cps import cps_init_phase, create_cps_state

TH = 0.7


def tie_groups(E: np.ndarray):
    """Group identical codebook rows; returns (group_id per row, sizes)."""
    uniq, gid, counts = np.unique(E, axis=0, return_inverse=True,
                                  return_counts=True)
    return gid, counts


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--encoder", default="resnet50")
    ap.add_argument("--k", type=int, default=512)
    ap.add_argument("--hw", type=int, default=128)
    ap.add_argument("--n_lab", type=int, default=4)
    ap.add_argument("--out", default="TIE_BREAK.md")
    args = ap.parse_args()

    pr.HW = args.hw
    (l_img, l_gt), _, _ = pr.make_synthetic(args.n_lab, 1, 1)
    num_emb = (0, 0, args.k, args.k, args.k)

    model = make_model({"name": "vqreptunet1x1v2", "params": {
        "encoder_name": args.encoder, "num_classes": 3,
        "vq_cfg": {"num_embeddings": list(num_emb), "distance": "euclidean",
                   "kmeans_init": True},
        "margin": 0.5, "scale": 30.0}})
    jl_img, jl_gt = jnp.asarray(l_img), jnp.asarray(l_gt)
    state = create_cps_state(model, optax.adam(1e-4), (jl_img, jl_gt, TH))
    state = cps_init_phase(model, state, jl_img, jl_gt, TH)

    # jax forward with intermediates: per-stage VQ (q, idx, commit, usage)
    out_j, mut = model.apply(state.variables_1, jl_img, jl_gt, TH, train=True,
                             mutable=["batch_stats", "intermediates"],
                             capture_intermediates=True)
    core = mut["intermediates"]["core"]
    feats_j = core["encoder"]["__call__"][0]

    # torch forward, same weights; hooks capture each TorchVQ input
    torch.manual_seed(0)
    tm = TorchVQRePTUnet1x1v2(args.encoder, 3, num_emb)
    load_from_flax(tm, jax.tree_util.tree_map(np.asarray, state.variables_1))
    captured = []
    for m in tm.modules():
        if isinstance(m, TorchVQ):
            m.register_forward_hook(
                lambda mod, inp, out: captured.append(
                    (inp[0].detach(), mod.embedding.weight.detach())))
    tm.train()
    with torch.no_grad():
        out_t = tm(torch.tensor(l_img).permute(0, 3, 1, 2),
                   torch.tensor(l_gt), TH)

    # step-0 loss-component parity in the SAME run (the flagship gate's
    # probe, parity_run.py:195-205) so this record is self-contained and
    # comparable with PARITY_RUN_FLAGSHIP.md
    d_logits = float(np.abs(out_t[0].permute(0, 2, 3, 1).numpy()
                            - np.asarray(out_j[0])).max())
    d_commit = abs(float(out_t[1]) - float(out_j[1]))
    d_proto = abs(float(out_t[3]) - float(out_j[3]))
    probe = (f"Step-0 probe (this run): |dlogits|max={d_logits:.2e}, "
             f"|dcommit|={d_commit:.2e} (jax {float(out_j[1]):.4f} vs torch "
             f"{float(out_t[1]):.4f}), |dproto|={d_proto:.2e}")
    print(probe)

    lines = [
        "# TIE_BREAK — measured cause of jax-vs-torch VQ assignment "
        "disagreement\n",
        f"Setup: the flagship parity-gate configuration ({args.encoder}, "
        f"K={args.k}, {args.hw}^2, {args.n_lab} labeled images), identical "
        "weights (torch synced from the jax kmeans init), one train-mode "
        "forward each.  Reference tie source: vq_img.py:29-63 zero-bin "
        "keep-old.\n",
        probe + "\n",
        "| stage | codes | unique rows | dup codes | disagree px | "
        "pure-relabel | near-tie | real (feature noise) | "
        "commit delta from real |",
        "|---|---|---|---|---|---|---|---|---|",
    ]
    summary = []
    for si, (name, (f_t, E_t)) in enumerate(
            zip(("VectorQuantizer_0", "VectorQuantizer_1", "VectorQuantizer_2"),
                captured)):
        q_j, idx_j, commit_j, _ = core[name]["__call__"][0]
        idx_j = np.asarray(idx_j).reshape(-1)
        E = np.asarray(state.variables_1["codebook"]["core"][name]["embedding"])
        gid, counts = tie_groups(E)
        dup_codes = int((counts[gid] > 1).sum())

        # torch's own assignment from its own (noisy) features
        f_t = f_t.float().permute(0, 2, 3, 1).reshape(-1, E.shape[1]).numpy()
        dist_t = torch.cdist(torch.tensor(f_t), torch.tensor(E), p=2)
        idx_t = dist_t.argmin(-1).numpy()

        dis = idx_j != idx_t
        n_dis = int(dis.sum())
        if n_dis:
            # classify each disagreement in f64 using the JAX features
            f_j = np.asarray(feats_j[si + 3], np.float64).reshape(-1, E.shape[1])
            E64 = E.astype(np.float64)
            fj_d = f_j[dis]
            # distances only to the two competing codes (memory-light)
            a = ((fj_d - E64[idx_j[dis]]) ** 2).sum(-1)
            b = ((fj_d - E64[idx_t[dis]]) ** 2).sum(-1)
            relabel = (E64[idx_j[dis]] == E64[idx_t[dis]]).all(-1)
            scale = (fj_d ** 2).sum(-1) + 1e-30
            gap = np.abs(a - b) / scale
            near = (~relabel) & (gap < 1e-6)  # f32 eps^2-level relative gap
            real = ~(relabel | near)
            # commitment contribution of the 'real' class (f64, per-pixel mse
            # normalized the way the reference does: mean over all N*C)
            n_total = f_j.shape[0] * f_j.shape[1]
            commit_delta_real = float(np.abs(a[real] - b[real]).sum() / n_total)
            row = (f"| {si + 2} | {args.k} | {len(counts)} | {dup_codes} | "
                   f"{n_dis}/{idx_j.size} ({100 * n_dis / idx_j.size:.2f}%) | "
                   f"{int(relabel.sum())} ({100 * relabel.mean():.1f}%) | "
                   f"{int(near.sum())} | {int(real.sum())} | "
                   f"{commit_delta_real:.4f} |")
            summary.append(dict(stage=si + 2, n_dis=n_dis,
                                relabel=int(relabel.sum()),
                                near=int(near.sum()), real=int(real.sum()),
                                dup_codes=dup_codes,
                                commit_delta_real=commit_delta_real))
        else:
            row = (f"| {si + 2} | {args.k} | {len(counts)} | {dup_codes} | 0 | "
                   f"0 | 0 | 0 | 0 |")
            summary.append(dict(stage=si + 2, n_dis=0, relabel=0, near=0,
                                real=0, dup_codes=dup_codes,
                                commit_delta_real=0.0))
        lines.append(row)
        print(row)

    tot_dis = sum(s["n_dis"] for s in summary)
    tot_tie = sum(s["relabel"] + s["near"] for s in summary)
    tie_frac = tot_tie / max(tot_dis, 1)
    lines.append(
        f"\nTotals: {tot_dis} disagreeing pixels; "
        f"{tot_tie} ({100 * tie_frac:.1f}%) are tie-class (identical-row "
        "relabels or sub-f32-noise distance gaps); the remainder are genuine "
        "argmin flips from upstream f32 feature divergence between the two "
        "frameworks' conv stacks.\n")
    lines.append(
        "Reading: pure-relabel disagreements change code ids but NOT the "
        "quantized tensor (identical rows), so they cannot move the "
        "commitment loss; the 'real' column's f64 commitment delta bounds "
        "how much of PARITY_RUN_FLAGSHIP.md's step-0 |dcommit| each stage's "
        "feature noise explains.\n")
    with open(args.out, "w") as f:
        f.write("\n".join(lines))
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
