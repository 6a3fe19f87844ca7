"""Multi-seed paired equal-accuracy gate for the tuned decoder profiles
(VERDICT r4 weak #4: 3 seeds with a +-0.03 band cannot certify "equal";
re-run with >=6 seeds and report a paired CI that excludes -0.02).

For each seed, trains the flagship CPS loop on the rule-based synthetic set
with (a) the reference decoder plan, (b) the narrow plan (256,128,64,48,32),
(c) narrow + subpixel tail — the two shipped tuned profiles — and reports
per-seed PAIRED test-mIoU deltas plus mean +- 95% t-CI.

Gate: the CI must exclude -0.02 (i.e. lower bound > -0.02) for a profile to
keep its "equal accuracy" label; otherwise BASELINE.md demotes it.

    JAX_PLATFORMS=cpu python tools/plan_gate_multiseed.py \
        [--seeds 6] [--epochs 150] [--out PLAN_GATE_MULTISEED.json]

Protocol preserved: the reference's best-checkpoint evaluation idea scaled
down (test_detailviz.py:107-145 — bilinear-upsampled logits, confusion
mIoU); same harness as tools/decoder_plan_accuracy.py (round-2/3 gates).
"""
from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

REF = "reference (enc//2 reversed)"
PROFILES = ["dec_256", "dec_256_subpixel"]


def t_ci(deltas, conf=0.95):
    """Mean and two-sided t confidence interval for paired deltas."""
    d = np.asarray(deltas, float)
    n = len(d)
    mean = d.mean()
    if n < 2:
        return mean, (float("nan"), float("nan"))
    se = d.std(ddof=1) / np.sqrt(n)
    # t critical values for 95% two-sided, df = n-1 (no scipy dependency)
    tcrit = {1: 12.71, 2: 4.303, 3: 3.182, 4: 2.776, 5: 2.571, 6: 2.447,
             7: 2.365, 8: 2.306, 9: 2.262, 10: 2.228, 11: 2.201,
             12: 2.179}.get(n - 1, 1.96)
    return mean, (mean - tcrit * se, mean + tcrit * se)


def run_seed(seed, epochs, hw):
    """One decoder_plan_accuracy run for all three variants at this seed;
    returns {variant: test_miou}."""
    cmd = [sys.executable,
           os.path.join(os.path.dirname(__file__), "decoder_plan_accuracy.py"),
           "--epochs", str(epochs), "--hw", str(hw), "--seed", str(seed),
           "--only", ",".join([REF] + PROFILES)]
    env = {k: v for k, v in os.environ.items() if k != "PALLAS_AXON_POOL_IPS"}
    env["JAX_PLATFORMS"] = "cpu"
    r = subprocess.run(cmd, capture_output=True, text=True, env=env,
                       timeout=7200)
    if r.returncode != 0:
        raise RuntimeError(f"seed {seed} failed:\n{r.stdout[-2000:]}\n{r.stderr[-2000:]}")
    # the child prints one single-line {"variant": {...}} json per variant
    # (its final summary is multi-line, indented — skip it); merge them all
    results = {}
    for line in r.stdout.splitlines():
        line = line.strip()
        if line.startswith("{") and line.endswith("}"):
            try:
                obj = json.loads(line)
            except json.JSONDecodeError:
                continue
            for k, v in obj.items():
                if isinstance(v, dict) and "test_miou" in v:
                    results[k] = v
    missing = {REF, *PROFILES} - set(results)
    if missing:
        raise RuntimeError(f"seed {seed}: missing variants {missing}:\n"
                           f"{r.stdout[-1500:]}")
    return {k: v["test_miou"] for k, v in results.items()}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seeds", type=int, default=6)
    ap.add_argument("--epochs", type=int, default=150)
    ap.add_argument("--hw", type=int, default=64)
    ap.add_argument("--out", default="PLAN_GATE_MULTISEED.json")
    args = ap.parse_args()

    per_seed = {}
    partial = args.out + ".partial"
    if os.path.exists(partial):  # resume a killed run
        per_seed = {int(k): v for k, v in json.load(open(partial)).items()}
        print(f"resuming: {sorted(per_seed)} already done", flush=True)
    for seed in range(args.seeds):
        if seed in per_seed:
            continue
        per_seed[seed] = run_seed(seed, args.epochs, args.hw)
        print(json.dumps({"seed": seed, **per_seed[seed]}), flush=True)
        with open(partial, "w") as f:
            json.dump(per_seed, f)

    report = {"seeds": args.seeds, "epochs": args.epochs, "hw": args.hw,
              "per_seed": per_seed, "profiles": {}}
    for prof in PROFILES:
        deltas = [per_seed[s][prof] - per_seed[s][REF] for s in per_seed
                  if prof in per_seed[s] and REF in per_seed[s]]
        mean, (lo, hi) = t_ci(deltas)
        verdict = "EQUAL (CI excludes -0.02)" if lo > -0.02 else \
            "NOT CERTIFIED (CI reaches -0.02)"
        report["profiles"][prof] = {
            "paired_deltas": [round(d, 4) for d in deltas],
            "mean": round(float(mean), 4),
            "ci95": [round(float(lo), 4), round(float(hi), 4)],
            "verdict": verdict}
        print(f"{prof}: mean {mean:+.4f}, 95% CI [{lo:+.4f}, {hi:+.4f}] "
              f"-> {verdict}")
    with open(args.out, "w") as f:
        json.dump(report, f, indent=1)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
