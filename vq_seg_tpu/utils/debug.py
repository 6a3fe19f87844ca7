"""Numerical-debug tooling (SURVEY.md §5: the reference has none; JAX's
functional purity makes NaN hunting tractable — these are the framework's
equivalents of torch's anomaly detection).

  * ``enable_nan_debug()`` — turn on jax_debug_nans: any NaN produced under
    jit re-runs the op un-jitted and raises at the exact primitive.
  * ``check_finite(tree, name)`` — host-side assertion that every leaf of a
    pytree is finite; returns the offending paths for actionable errors.
  * ``finite_or_raise(tree, name)`` — same but raises FloatingPointError.

Trainers honor ``cfg.train.debug_nans: true`` by calling
``enable_nan_debug()`` before the first step.
"""
from __future__ import annotations

from typing import List, Tuple

import jax
import numpy as np


def enable_nan_debug(enable: bool = True):
    """jit-level NaN detection (re-runs op-by-op on NaN and raises there)."""
    jax.config.update("jax_debug_nans", enable)


def check_finite(tree, name: str = "tree") -> List[Tuple[str, str]]:
    """Return [(path, problem)] for every non-finite leaf (empty = healthy)."""
    bad = []
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        a = np.asarray(leaf)
        if not np.issubdtype(a.dtype, np.floating):
            continue
        if np.isnan(a).any():
            bad.append((_fmt(path), "NaN"))
        elif np.isinf(a).any():
            bad.append((_fmt(path), "Inf"))
    return bad


def finite_or_raise(tree, name: str = "tree"):
    bad = check_finite(tree, name)
    if bad:
        lines = "\n".join(f"  {p}: {w}" for p, w in bad[:20])
        raise FloatingPointError(f"non-finite values in {name}:\n{lines}")


def _fmt(path) -> str:
    return "/".join(str(getattr(k, "key", getattr(k, "idx", k))) for k in path)
