"""Diagonal-cosine loss (reference loss/dc_loss.py:4-19)."""
from __future__ import annotations

import jax.numpy as jnp


def dc_loss(phi1, phi2):
    """phi1, phi2: (N, D) feature rows; mean of diag(sim)/rowsum(sim)."""
    sim = phi1 @ phi2.T
    summation = jnp.sum(sim, axis=1)
    return jnp.mean(jnp.diagonal(sim) / summation)


class DCLoss:
    def __call__(self, phi1, phi2):
        return dc_loss(phi1, phi2)
