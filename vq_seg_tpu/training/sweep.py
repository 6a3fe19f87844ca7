"""Hyper-parameter sweep driver (reference deprecated/optuna_vqptunet.py).

The reference swept lr / commitment / prototype / cps weights with Optuna
(optuna_vqptunet.py:49-54).  Optuna isn't in this image, so this is a
self-contained sequential searcher with the same surface: define a search
space, run short trainings, keep the best val mIoU.  Supports random search
and a simple TPE-like refinement (sample around the running best).
"""
from __future__ import annotations

import copy
import json
import math
import os
import random
from typing import Callable, Dict, Tuple

DEFAULT_SPACE = {
    # (low, high, log-scale) — mirrors optuna_vqptunet.py:49-54
    "train.learning_rate": (1e-5, 1e-3, True),
    "train.total_commitment_loss_weight": (0.1, 2.0, False),
    "train.total_prototype_loss_weight": (1e-3, 1.0, True),
    "train.cps_loss_weight": (0.1, 2.0, False),
}


def _set_path(cfg, dotted: str, value):
    node = cfg
    parts = dotted.split(".")
    for p in parts[:-1]:
        node = node[p]
    node[parts[-1]] = value


def _sample(space: Dict[str, Tuple[float, float, bool]], rng: random.Random,
            center: Dict[str, float] | None = None, shrink: float = 0.5):
    out = {}
    for key, (lo, hi, log) in space.items():
        if center is not None and key in center:
            # sample around the incumbent (log-space when log-scaled)
            c = math.log(center[key]) if log else center[key]
            span = (math.log(hi) - math.log(lo)) if log else (hi - lo)
            v = c + rng.uniform(-span * shrink / 2, span * shrink / 2)
            v = math.exp(v) if log else v
            v = min(max(v, lo), hi)
        else:
            v = (math.exp(rng.uniform(math.log(lo), math.log(hi))) if log
                 else rng.uniform(lo, hi))
        out[key] = v
    return out


def sweep(cfg, objective: Callable, n_trials: int = 20,
          space: Dict[str, Tuple[float, float, bool]] | None = None,
          seed: int = 0, exploit_after: int = 8, out_path: str | None = None):
    """Run ``n_trials`` trials of ``objective(trial_cfg) -> float`` (higher is
    better, e.g. val mIoU).  After ``exploit_after`` random trials, sampling
    concentrates around the incumbent.  Returns (best_params, best_value,
    history)."""
    space = space or DEFAULT_SPACE
    rng = random.Random(seed)
    best_params, best_value = None, -float("inf")
    history = []
    for t in range(n_trials):
        params = _sample(space, rng,
                         center=best_params if (best_params and t >= exploit_after) else None)
        trial_cfg = copy.deepcopy(cfg)
        for k, v in params.items():
            _set_path(trial_cfg, k, v)
        value = float(objective(trial_cfg))
        history.append({"trial": t, "params": params, "value": value})
        if value > best_value:
            best_params, best_value = params, value
        if out_path:
            with open(out_path, "w") as f:
                json.dump({"best_params": best_params, "best_value": best_value,
                           "history": history}, f, indent=2)
    return best_params, best_value, history
