"""Ablation networks (reference models/networks/ablation/net.py).

  * ``nopt``    (:13-89)   — flagship trunk with the prototype loss disabled
    (returns a constant 0 in its place)
  * ``scheme6`` (:91-145)  — flagship trunk with the plain (v1) PrototypeLoss
"""
from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from vq_seg_tpu.models.layers import upsample_bilinear_ac
from vq_seg_tpu.models.networks import register
from vq_seg_tpu.models.networks.vq_unet import _PTNet


@register("nopt")
class NoPT(_PTNet):
    """Prototype-loss-off ablation (ablation/net.py:13-89)."""

    head_kernel: int = 1
    head_bias: bool = False

    @nn.compact
    def __call__(self, x, gt=None, percent=None, train: bool = False,
                 init_codebook: bool = False, init_protos: bool = False):
        dec, commit, usage, dec_ch, _feats = self._trunk(x, train, init_codebook)
        out = self._head(dec, dec_ch, train)
        if self.upsampling > 1:
            out = upsample_bilinear_ac(out, scale=self.upsampling)
        return out, commit, usage, jnp.float32(0.0)


@register("scheme6")
class Scheme6(_PTNet):
    """Plain-PrototypeLoss ablation (ablation/net.py:91-145)."""

    head_kernel: int = 1
    head_bias: bool = False
    proto_kind: str = "prototype"

    @nn.compact
    def __call__(self, x, gt=None, percent=None, train: bool = False,
                 init_codebook: bool = False, init_protos: bool = False):
        dec, commit, usage, dec_ch, _feats = self._trunk(x, train, init_codebook)
        out = self._head(dec, dec_ch, train)
        proto = jnp.float32(0.0)
        if train and gt is not None:
            proto = self._proto(dec_ch)(dec, gt, train=train, init_protos=init_protos)
        if self.upsampling > 1:
            out = upsample_bilinear_ac(out, scale=self.upsampling)
        return out, commit, usage, proto
