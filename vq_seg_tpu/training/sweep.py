"""Hyper-parameter sweep driver (reference deprecated/optuna_vqptunet.py).

The reference swept lr / commitment / prototype / cps weights with Optuna's
TPE sampler (optuna_vqptunet.py:49-54).  Optuna isn't in this image, so this
is a self-contained **Tree-structured Parzen Estimator** with the same
surface: startup trials are random; afterwards each parameter is sampled by
maximising l(x)/g(x), where l models the best-gamma-quantile observations
and g the rest with Gaussian Parzen windows (log-space for log-scaled
parameters) — the same estimator family Optuna's TPESampler uses.

``make_cps_objective`` builds a trainer-integrated objective: a short
flagship CPS training on the config's dataset scored by test mIoU.

    from vq_seg_tpu.training.sweep import sweep, make_cps_objective
    best, value, hist = sweep(cfg, make_cps_objective(epochs=5), n_trials=20)
"""
from __future__ import annotations

import copy
import json
import math
import random
from typing import Callable, Dict, List, Tuple

import numpy as np

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


def _to_unit(v, lo, hi, log):
    if log:
        return (math.log(v) - math.log(lo)) / (math.log(hi) - math.log(lo))
    return (v - lo) / (hi - lo)


def _from_unit(u, lo, hi, log):
    u = min(max(u, 0.0), 1.0)
    if log:
        return math.exp(math.log(lo) + u * (math.log(hi) - math.log(lo)))
    return lo + u * (hi - lo)


class TPESampler:
    """Per-parameter univariate TPE (the independent-factor form Optuna
    defaults to).  Observations are kept in unit space."""

    def __init__(self, space: Dict[str, Tuple[float, float, bool]], seed: int = 0,
                 n_startup: int = 8, gamma: float = 0.25, n_candidates: int = 24):
        self.space = space
        self.rng = random.Random(seed)
        self.np_rng = np.random.default_rng(seed)
        self.n_startup = n_startup
        self.gamma = gamma
        self.n_candidates = n_candidates
        self.observations: List[Tuple[Dict[str, float], float]] = []

    def tell(self, params: Dict[str, float], value: float):
        self.observations.append((params, value))

    def _parzen_logpdf(self, xs: np.ndarray, obs: np.ndarray) -> np.ndarray:
        """log of a Parzen mixture over unit-space observations, with a
        uniform prior component and Scott's-rule bandwidth."""
        centers = np.concatenate([obs, [0.5]])           # uniform-ish prior kernel
        bw = max(1.06 * (np.std(centers) + 1e-3) * len(centers) ** -0.2, 0.05)
        d = (xs[:, None] - centers[None, :]) / bw
        comp = -0.5 * d * d - math.log(bw * math.sqrt(2 * math.pi))
        m = comp.max(axis=1, keepdims=True)
        return (m[:, 0] + np.log(np.exp(comp - m).mean(axis=1)))

    def ask(self) -> Dict[str, float]:
        if len(self.observations) < self.n_startup:
            return {k: _from_unit(self.rng.random(), lo, hi, log)
                    for k, (lo, hi, log) in self.space.items()}
        obs = sorted(self.observations, key=lambda o: -o[1])  # maximise
        n_good = max(1, int(math.ceil(self.gamma * len(obs))))
        good, bad = obs[:n_good], obs[n_good:]
        out = {}
        for k, (lo, hi, log) in self.space.items():
            g = np.asarray([_to_unit(p[k], lo, hi, log) for p, _ in good])
            b = np.asarray([_to_unit(p[k], lo, hi, log) for p, _ in bad]) \
                if bad else np.asarray([0.5])
            # candidates drawn from l(x): perturb good observations
            cand = np.clip(
                g[self.np_rng.integers(0, len(g), self.n_candidates)]
                + self.np_rng.normal(0, 0.1, self.n_candidates), 0, 1)
            score = self._parzen_logpdf(cand, g) - self._parzen_logpdf(cand, b)
            out[k] = _from_unit(float(cand[int(np.argmax(score))]), lo, hi, log)
        return out


def sweep(cfg, objective: Callable, n_trials: int = 20,
          space: Dict[str, Tuple[float, float, bool]] | None = None,
          seed: int = 0, n_startup: int = 8, out_path: str | None = None):
    """Run ``n_trials`` trials of ``objective(trial_cfg) -> float`` (higher
    is better, e.g. val mIoU) under TPE.  Returns (best_params, best_value,
    history)."""
    space = space or DEFAULT_SPACE
    sampler = TPESampler(space, seed=seed, n_startup=n_startup)
    best_params, best_value = None, -float("inf")
    history = []
    for t in range(n_trials):
        params = sampler.ask()
        trial_cfg = copy.deepcopy(cfg)
        for k, v in params.items():
            _set_path(trial_cfg, k, v)
        value = float(objective(trial_cfg))
        sampler.tell(params, value)
        history.append({"trial": t, "params": params, "value": value})
        if value > best_value:
            best_params, best_value = params, value
        if out_path:
            with open(out_path, "w") as f:
                json.dump({"best_params": best_params, "best_value": best_value,
                           "history": history}, f, indent=2)
    return best_params, best_value, history


def make_cps_objective(epochs: int = 5, max_steps_per_epoch: int | None = None):
    """Trainer-integrated objective: short flagship CPS training scored by
    the official-protocol test mIoU (the reference's optuna study trained
    for a few epochs and reported test mIoU, optuna_vqptunet.py:56-200)."""

    def objective(trial_cfg) -> float:
        import os

        from vq_seg_tpu.data import BaseDataset, Loader
        from vq_seg_tpu.training import cps

        trial_cfg = copy.deepcopy(trial_cfg)
        trial_cfg["train"]["num_epochs"] = epochs
        trial_cfg["train"]["save_dir"] = None          # no checkpoints per trial
        trial_cfg["wandb_logging"] = False
        state = cps.train(trial_cfg, max_steps_per_epoch=max_steps_per_epoch)
        from vq_seg_tpu.models.networks import make_model
        from vq_seg_tpu.training.cps import evaluate, unstack_cps_state

        model = make_model(trial_cfg["model"])
        v1, _ = unstack_cps_state(state)
        test_ds = BaseDataset(os.path.join(trial_cfg["test"]["data_dir"], "test"),
                              "labelled", batch_size=1, resize=trial_cfg["resize"],
                              target_resize=False)
        return evaluate(model, v1, Loader(test_ds, 1), trial_cfg["pixel_to_label"],
                        trial_cfg["num_classes"])

    return objective
