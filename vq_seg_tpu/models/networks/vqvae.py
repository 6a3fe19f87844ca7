"""VQ-VAE reconstruction nets for self-supervised codebook pretraining
(reference models/networks/vqvaev2/net.py:9-97, decoder.py:20-44).

``vqvaev2``: per-stage VQ; all quantized features are resized to the stage-1
grid, concatenated, and decoded to an RGB reconstruction at half input
resolution (stride-2 transposed conv).  Returns (recon, commit, usage).
"""
from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax.numpy as jnp
from flax.core import FrozenDict

from vq_seg_tpu.models.encoders import make_encoder
from vq_seg_tpu.models.layers import ConvPad, resize_bilinear, torch_conv_default
from vq_seg_tpu.models.modules.vector_quantizer import VectorQuantizer, make_vq_module
from vq_seg_tpu.models.networks import register


class ResBlock(nn.Module):
    """relu-conv3-relu-conv1 residual (vqvaev2/decoder.py:4-18)."""

    hidden: int
    res_channels: int

    @nn.compact
    def __call__(self, x):
        y = nn.relu(x)
        y = ConvPad(self.res_channels, 3, 1, 1, use_bias=True, kernel_init=torch_conv_default)(y)
        y = nn.relu(y)
        y = ConvPad(self.hidden, 1, use_bias=True, kernel_init=torch_conv_default)(y)
        return x + y


class VQVAEDecoder(nn.Module):
    """(vqvaev2/decoder.py:20-44)."""

    out_channels: int = 3
    hidden_channels: int = 32
    n_resblocks: int = 2
    n_res_channels: int = 32
    stride: int = 2

    @nn.compact
    def __call__(self, x):
        y = ConvPad(self.hidden_channels, 3, 1, 1, use_bias=True,
                    kernel_init=torch_conv_default)(x)
        for _ in range(self.n_resblocks):
            y = ResBlock(self.hidden_channels, self.n_res_channels)(y)
        y = nn.relu(y)
        if self.stride == 4:
            y = nn.ConvTranspose(self.hidden_channels // 2, (4, 4), strides=(2, 2),
                                 padding="SAME")(y)
            y = nn.relu(y)
            y = nn.ConvTranspose(self.out_channels, (4, 4), strides=(2, 2),
                                 padding="SAME")(y)
        elif self.stride == 2:
            y = nn.ConvTranspose(self.out_channels, (4, 4), strides=(2, 2),
                                 padding="SAME")(y)
        return y


@register("vqvaev2")
class VQVAEv2(nn.Module):
    encoder_name: str
    vq_cfg: Any
    in_channels: int = 3
    out_channels: int = 3
    hidden_channels: int = 32
    n_resblocks: int = 2
    n_res_channels: int = 32
    depth: int = 5
    stride: int = 2

    @nn.compact
    def __call__(self, x, train: bool = False, init_codebook: bool = False):
        encoder, enc_ch = make_encoder(self.encoder_name, self.in_channels, self.depth, module_name="encoder")
        feats = list(encoder(x, train)[1:])
        vq_list = make_vq_module(dict(self.vq_cfg), list(enc_ch), self.depth)
        commit = jnp.float32(0.0)
        usages = []
        for i, vq in enumerate(vq_list):
            q, _idx, c, u = vq(feats[i], train=train, init_codebook=init_codebook)
            feats[i] = q
            if c is not None:
                commit = commit + c
            if u is not None:
                usages.append(u)
        commit = commit / len(feats)
        size = feats[0].shape[1:3]
        feats = [resize_bilinear(f, size) if f.shape[1:3] != size else f for f in feats]
        cat = jnp.concatenate(feats, axis=-1)
        recon = VQVAEDecoder(self.out_channels, self.hidden_channels, self.n_resblocks,
                             self.n_res_channels, self.stride, name="decoder")(cat)
        usage_vec = jnp.stack(usages) if usages else jnp.zeros((0,), jnp.float32)
        return recon, commit, usage_vec


@register("vqvaev1")
class VQVAEv1(nn.Module):
    """Deepest-stage-only VQ-VAE (vqvaev2/net.py:60-97)."""

    encoder_name: str
    vq_cfg: Any
    in_channels: int = 3
    out_channels: int = 3
    hidden_channels: int = 32
    n_resblocks: int = 2
    n_res_channels: int = 32
    depth: int = 5
    stride: int = 2

    @nn.compact
    def __call__(self, x, train: bool = False, init_codebook: bool = False):
        encoder, enc_ch = make_encoder(self.encoder_name, self.in_channels, self.depth, module_name="encoder")
        feats = list(encoder(x, train)[1:])
        cfg = {k: v for k, v in dict(self.vq_cfg).items()}
        k = cfg.pop("num_embeddings")
        if isinstance(k, (list, tuple)):
            k = k[-1]
        vq = VectorQuantizer(dim=enc_ch[-1], num_embeddings=k,
                             **{kk: v for kk, v in cfg.items()
                                if kk in ("distance", "kmeans_init", "kmeans_iters",
                                          "commitment_weight", "decay", "eps")},
                             name="codebook")
        q, _idx, commit, usage = vq(feats[-1], train=train, init_codebook=init_codebook)
        commit = (commit if commit is not None else jnp.float32(0.0)) / len(feats)
        recon = VQVAEDecoder(self.out_channels, self.hidden_channels, self.n_resblocks,
                             self.n_res_channels, self.stride, name="decoder")(q)
        u = usage[None] if usage is not None else jnp.zeros((0,), jnp.float32)
        return recon, commit, u
