"""Composed parity gate: train the flagship CPS loop in BOTH frameworks —
vq_seg_tpu (JAX) and a torch transcription of the reference
(tools/torch_flagship.py; the reference itself needs torchvision, absent in
this image) — from IDENTICAL weights on IDENTICAL batches, and compare

  * per-step loss-component trajectories (sup / cps / commitment / proto)
  * final test mIoU (gate: |delta| <= 0.2, BASELINE.json north_star)

Semantics transcribed from /root/reference/train_vqreptunet1x1v2.py:129-202.

    JAX_PLATFORMS=cpu python tools/parity_run.py --steps 60 --out PARITY_RUN.md
"""
from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.pop("PALLAS_AXON_POOL_IPS", None)
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax
import jax.numpy as jnp
import numpy as np
import optax
import torch

from vq_seg_tpu.losses import make_loss
from vq_seg_tpu.metrics.measurement import confusion_matrix, miou
from vq_seg_tpu.models.networks import make_model
from vq_seg_tpu.training.cps import (
    cps_init_phase,
    create_cps_state,
    make_cps_train_step,
)
from tools.torch_flagship import (
    TorchVQRePTUnet1x1v2,
    load_from_flax,
    torch_dice_loss,
    torch_score_mask,
)

HW = 64           # module-level defaults; main() overrides from argparse so
NUM_EMB = (0, 0, 8, 8, 8)  # the flagship-scale gate (resnet50, K=512, 128^2)
TH = 0.7                   # reuses the same code path (VERDICT r3 #3)
LR = 1e-4
PROTO_W = 0.01


def make_synthetic(n_lab=4, n_unlab=4, n_test=4, seed=0):
    """Rule-based CWFID-like data: class = argmax of smoothed RGB.  The same
    generator as BASELINE.md's learning-loop sanity check."""
    rng = np.random.default_rng(seed)

    def blur(img):
        k = np.ones((5, 5)) / 25.0
        out = np.empty_like(img)
        for c in range(3):
            padded = np.pad(img[..., c], 2, mode="edge")
            view = np.lib.stride_tricks.sliding_window_view(padded, (5, 5))
            out[..., c] = (view * k).sum(axis=(-1, -2))
        return out

    def gen(n):
        imgs, gts = [], []
        for _ in range(n):
            img = blur(rng.uniform(size=(HW, HW, 3)).astype(np.float32))
            gts.append(np.argmax(img, axis=-1).astype(np.int32))
            imgs.append(img)
        return np.stack(imgs), np.stack(gts)

    l_img, l_gt = gen(n_lab)
    ul_img, _ = gen(n_unlab)
    t_img, t_gt = gen(n_test)
    return (l_img, l_gt), ul_img, (t_img, t_gt)


def torch_cps_step(m1, m2, opt1, opt2, l_img, l_gt, ul_img, lr):
    """train_vqreptunet1x1v2.py:129-202 in torch (fp32, no AMP)."""
    ce = torch.nn.CrossEntropyLoss(ignore_index=255)
    for opt in (opt1, opt2):
        opt.zero_grad()
        for g in opt.param_groups:
            g["lr"] = lr
    with torch.no_grad():
        m1.eval(), m2.eval()
        pseudo_1_score = m1(ul_img)[0].detach()
        pseudo_2_score = m2(ul_img)[0].detach()
        m1.train(), m2.train()
    pred_sup_1, c_l1, _, pl_l1 = m1(l_img, l_gt, TH)
    pred_sup_2, c_l2, _, pl_l2 = m2(l_img, l_gt, TH)
    pred_ul_1, c_ul1, _, pl_ul1 = m1(ul_img, pseudo_2_score, TH)
    pred_ul_2, c_ul2, _, pl_ul2 = m2(ul_img, pseudo_1_score, TH)
    pred_1 = torch.cat([pred_sup_1, pred_ul_1], dim=0)
    pred_2 = torch.cat([pred_sup_2, pred_ul_2], dim=0)
    pseudo_1 = torch.argmax(pred_1, dim=1).long()
    pseudo_2 = torch.argmax(pred_2, dim=1).long()
    filt_1 = torch_score_mask(pred_1, pseudo_1, TH).detach()
    filt_2 = torch_score_mask(pred_2, pseudo_2, TH).detach()
    cps_loss = (0.5 * ce(pred_1, filt_2) + 0.5 * ce(pred_2, filt_1)
                + torch_dice_loss(pred_1, filt_2) + torch_dice_loss(pred_2, filt_1))
    sup_1 = 0.5 * ce(pred_sup_1, l_gt.long()) + torch_dice_loss(pred_sup_1, l_gt)
    sup_2 = 0.5 * ce(pred_sup_2, l_gt.long()) + torch_dice_loss(pred_sup_2, l_gt)
    commitment = c_l1 + c_l2 + c_ul1 + c_ul2
    prototype = (pl_l1 + pl_l2 + pl_ul1 + pl_ul2) * PROTO_W
    loss = sup_1 + sup_2 + cps_loss + commitment + prototype
    loss.backward()
    opt1.step(), opt2.step()
    return dict(loss=float(loss), sup_loss_1=float(sup_1), cps_loss=float(cps_loss),
                commitment_loss=float(commitment), prototype_loss=float(prototype))


def eval_miou_torch(model, t_img, t_gt):
    model.eval()
    confs = []
    with torch.no_grad():
        for i in range(t_img.shape[0]):
            pred = model(t_img[i:i + 1])[0]
            conf = confusion_matrix(
                jnp.asarray(pred.permute(0, 2, 3, 1).numpy()),
                jnp.asarray(t_gt[i:i + 1].numpy()), num_classes=3)
            confs.append(np.asarray(conf))
    ms = [float(miou(jnp.asarray(c))[0]) for c in confs]
    return float(np.mean(ms))


def eval_miou_jax(model, variables, t_img, t_gt):
    ms = []
    for i in range(t_img.shape[0]):
        pred = model.apply(variables, jnp.asarray(t_img[i:i + 1]), train=False)[0]
        conf = confusion_matrix(pred, jnp.asarray(t_gt[i:i + 1]), num_classes=3)
        ms.append(float(miou(conf)[0]))
    return float(np.mean(ms))


def main():
    global HW, NUM_EMB
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=60)
    ap.add_argument("--encoder", default="resnet18")
    ap.add_argument("--hw", type=int, default=64)
    ap.add_argument("--k", type=int, default=8,
                    help="codebook size per VQ stage (flagship: 512)")
    ap.add_argument("--n_lab", type=int, default=4)
    ap.add_argument("--n_unlab", type=int, default=4)
    ap.add_argument("--n_test", type=int, default=4)
    ap.add_argument("--family", default="argmax",
                    choices=["argmax", "weedfield"],
                    help="synthetic family (weedfield = the hard set)")
    ap.add_argument("--out", default="PARITY_RUN.md")
    args = ap.parse_args()
    HW = args.hw
    NUM_EMB = (0, 0, args.k, args.k, args.k)
    torch.manual_seed(0)
    torch.set_num_threads(os.cpu_count() or 8)

    if args.family == "weedfield":
        from tools.synthetic_data import make_weedfield
        (l_img, l_gt), ul_img, (t_img, t_gt) = make_weedfield(
            hw=HW, n_lab=args.n_lab, n_unlab=args.n_unlab, n_test=args.n_test)
    else:
        (l_img, l_gt), ul_img, (t_img, t_gt) = make_synthetic(
            args.n_lab, args.n_unlab, args.n_test)

    # --- JAX side -----------------------------------------------------------
    model = make_model({"name": "vqreptunet1x1v2", "params": {
        "encoder_name": args.encoder, "num_classes": 3,
        "vq_cfg": {"num_embeddings": list(NUM_EMB), "distance": "euclidean",
                   "kmeans_init": True},
        "margin": 0.5, "scale": 30.0}})
    # constant LR isolates trainer dynamics (both sides poke the same value)
    tx = optax.adam(LR, b1=0.9, b2=0.999)
    dice = make_loss("dice_loss", 3, ignore_index=255)
    jl_img, jl_gt, jul_img = map(jnp.asarray, (l_img, l_gt, ul_img))
    state = create_cps_state(model, tx, (jl_img, jl_gt, TH))
    state = cps_init_phase(model, state, jl_img, jl_gt, TH)
    step = make_cps_train_step(model, tx, dice, num_classes=3,
                               confidence_threshold=TH, remat=False)

    # --- torch side: same weights -------------------------------------------
    tm1 = TorchVQRePTUnet1x1v2(args.encoder, 3, NUM_EMB)
    tm2 = TorchVQRePTUnet1x1v2(args.encoder, 3, NUM_EMB)
    load_from_flax(tm1, jax.tree_util.tree_map(np.asarray, state.variables_1))
    load_from_flax(tm2, jax.tree_util.tree_map(np.asarray, state.variables_2))
    opt1 = torch.optim.Adam(tm1.parameters(), lr=LR, betas=(0.9, 0.999))
    opt2 = torch.optim.Adam(tm2.parameters(), lr=LR, betas=(0.9, 0.999))
    tl_img = torch.tensor(l_img).permute(0, 3, 1, 2)
    tl_gt = torch.tensor(l_gt)
    tul_img = torch.tensor(ul_img).permute(0, 3, 1, 2)
    tt_img = torch.tensor(t_img).permute(0, 3, 1, 2)
    tt_gt = torch.tensor(t_gt)

    # --- forward parity gate before any training ----------------------------
    tm1.train()
    out_t, commit_t, _, proto_t = tm1(tl_img, tl_gt, TH)
    out_j, commit_j, _, proto_j = model.apply(state.variables_1, jl_img, jl_gt, TH,
                                              train=True, mutable=["batch_stats"])[0]
    fwd_out = float(np.abs(out_t.detach().permute(0, 2, 3, 1).numpy()
                           - np.asarray(out_j)).max())
    fwd_commit = abs(float(commit_t) - float(commit_j))
    fwd_proto = abs(float(proto_t) - float(proto_j))
    print(f"forward parity: |dlogits|max={fwd_out:.2e}, |dcommit|={fwd_commit:.2e}, "
          f"|dproto|={fwd_proto:.2e}")
    # the probe advanced tm1's BN running stats (the JAX side's mutated
    # batch_stats were discarded) — re-sync so both trajectories start equal
    load_from_flax(tm1, jax.tree_util.tree_map(np.asarray, state.variables_1))

    # --- train both ----------------------------------------------------------
    traj_j, traj_t = [], []
    t0 = time.time()
    for it in range(args.steps):
        state, mj, _, _ = step(state, jl_img, jl_gt, jul_img)
        traj_j.append({k: float(mj[k]) for k in
                       ("loss", "sup_loss_1", "cps_loss", "commitment_loss",
                        "prototype_loss")})
        mt = torch_cps_step(tm1, tm2, opt1, opt2, tl_img, tl_gt, tul_img, LR)
        traj_t.append(mt)
        if it % 10 == 0 or it == args.steps - 1:
            print(f"step {it:3d}  jax loss={traj_j[-1]['loss']:.4f}  "
                  f"torch loss={mt['loss']:.4f}")
    wall = time.time() - t0

    miou_j = eval_miou_jax(model, state.variables_1, t_img, t_gt)
    miou_t = eval_miou_torch(tm1, tt_img, tt_gt)
    print(f"final test mIoU: jax={miou_j:.4f} torch={miou_t:.4f} "
          f"delta={abs(miou_j - miou_t):.4f}")

    keys = ("loss", "sup_loss_1", "cps_loss", "commitment_loss", "prototype_loss")
    rows = []
    for k in keys:
        a = np.array([m[k] for m in traj_j])
        b = np.array([m[k] for m in traj_t])
        denom = np.maximum(np.abs(b), 1e-2)
        rows.append((k, float(a[0]), float(b[0]), float(a[-1]), float(b[-1]),
                     float(np.max(np.abs(a - b) / denom))))

    ok = abs(miou_j - miou_t) <= 0.2
    with open(args.out, "w") as f:
        f.write("# PARITY_RUN — composed training-dynamics gate\n\n")
        f.write("The PyTorch reference cannot execute in this image (its encoders\n"
                "subclass torchvision's ResNet — `models/encoders/resnet.py:117` —\n"
                "and torchvision is not installed), so the torch side is a faithful\n"
                "transcription of `train_vqreptunet1x1v2.py:129-202` + the flagship\n"
                "net (tools/torch_flagship.py, provenance cited per component),\n"
                "weight-synced from the JAX init so both frameworks start identical.\n"
                "Primitive-level parity against the reference's OWN modules executing\n"
                "(VQ / losses / metrics / prototype) is tests/test_reference_oracle.py.\n\n")
        f.write(f"Setup: {args.steps} CPS steps, {HW}x{HW} {args.family} synthetic data "
                f"({args.n_lab} labeled + {args.n_unlab} unlabeled + {args.n_test} test), "
                f"{args.encoder}, VQ K={NUM_EMB[2]} at "
                f"stages 2-4, Adam {LR} (constant), fp32, th={TH}.\n\n")
        f.write(f"Forward parity at step 0 (same weights): |dlogits|max={fwd_out:.2e}, "
                f"|dcommit|={fwd_commit:.2e}, |dproto|={fwd_proto:.2e}\n\n")
        f.write("| component | jax@0 | torch@0 | jax@end | torch@end | max rel dev |\n")
        f.write("|---|---|---|---|---|---|\n")
        for k, a0, b0, a1, b1, dev in rows:
            f.write(f"| {k} | {a0:.4f} | {b0:.4f} | {a1:.4f} | {b1:.4f} | {dev:.3%} |\n")
        f.write(f"\n**Final test mIoU**: jax {miou_j:.4f} vs torch {miou_t:.4f} "
                f"(delta {abs(miou_j - miou_t):.4f}; gate +-0.2: "
                f"{'PASS' if ok else 'FAIL'})\n\n")
        f.write(f"Wall: {wall:.0f}s for {args.steps} paired steps on CPU.\n")
    print(f"wrote {args.out} — gate {'PASS' if ok else 'FAIL'}")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
