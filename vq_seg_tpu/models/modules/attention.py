"""Attention modules (NHWC re-designs of reference models/modules/attention.py).

All modules are Flax Linen, channel-last.  Spatial self-attention (PAM) is an
einsum over (HW, HW) — only used on small bottleneck maps (<= 56^2 in the
reference configs), so the O((HW)^2) matmul rides the MXU.

Reference locations:
  * SKA                 attention.py:48-120
  * DualAttention/PAM/CAM  attention.py:125-199
  * DRSAM               attention.py:201-229
  * CCA                 attention.py:233-260
  * ContrastAttention   attention.py:270-286
  * IMDB                attention.py:288-312
  * make_attentions     attention.py:7-10
"""
from __future__ import annotations

from typing import Callable, List, Sequence

import flax.linen as nn
import jax.numpy as jnp

from vq_seg_tpu.models.layers import ConvBNReLU, ConvPad, global_avg_pool


class Identity(nn.Module):
    @nn.compact
    def __call__(self, x, train: bool = False):
        return x


class SKA(nn.Module):
    """Selective-kernel attention (attention.py:48-120): depthwise branches of
    growing kernel size, gated by a softmax over a squeezed descriptor."""

    in_channels: int
    num_branches: int = 2
    reduction: int = 16
    min_channels: int = 32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = self.in_channels
        mid = max(c // self.reduction, self.min_channels)
        outs = [
            ConvBNReLU(c, kernel_size=2 * (i + 1) + 1, padding=i + 1, groups=c)(x, train)
            for i in range(self.num_branches)
        ]
        u = sum(outs)
        s = global_avg_pool(u)  # (N,1,1,C)
        z = ConvBNReLU(mid, kernel_size=1, padding=0)(s, train)
        w = ConvPad(c * self.num_branches, 1, use_bias=True)(z)  # (N,1,1,C*M)
        w = w.reshape(w.shape[0], 1, 1, self.num_branches, c)
        w = nn.softmax(w, axis=3)
        stacked = jnp.stack(outs, axis=3)  # (N,H,W,M,C)
        return jnp.sum(stacked * w, axis=3)


class PAM(nn.Module):
    """Position (spatial self-) attention, SAGAN-style (attention.py:135-167)."""

    in_channels: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        n, h, w, c = x.shape
        q = ConvPad(c // 8, 1, use_bias=True)(x).reshape(n, h * w, c // 8)
        k = ConvPad(c // 8, 1, use_bias=True)(x).reshape(n, h * w, c // 8)
        v = ConvPad(c, 1, use_bias=True)(x).reshape(n, h * w, c)
        att = nn.softmax(jnp.einsum("nqd,nkd->nqk", q, k), axis=-1)
        out = jnp.einsum("nqk,nkc->nqc", att, v).reshape(n, h, w, c)
        gamma = self.param("gamma", nn.initializers.zeros, (1,))
        return gamma * out + x


class CAM(nn.Module):
    """Channel self-attention (attention.py:170-199): affinity over channels
    with the max-subtraction trick, zero-init residual gate."""

    in_channels: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        n, h, w, c = x.shape
        flat = x.reshape(n, h * w, c)
        energy = jnp.einsum("npc,npd->ncd", flat, flat)  # (N,C,C)
        energy = jnp.max(energy, axis=-1, keepdims=True) - energy
        att = nn.softmax(energy, axis=-1)
        out = jnp.einsum("ncd,npd->npc", att, flat).reshape(n, h, w, c)
        gamma = self.param("gamma", nn.initializers.zeros, (1,))
        return gamma * out + x


class DualAttention(nn.Module):
    """PAM then CAM (attention.py:125-133)."""

    in_channels: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        return CAM(self.in_channels)(PAM(self.in_channels)(x, train), train)


class DRSAM(nn.Module):
    """Dual-receptive-field spatial attention (attention.py:201-229):
    depthwise convs at several kernel sizes, softmax channel gating over
    branches, 3x3 fuse conv.

    Divergence from reference: the descriptor uses reshape (N,C) instead of
    ``torch.squeeze`` (which would also drop a batch dim of 1 — a latent
    reference bug at batch size 1).
    """

    in_channels: int
    kernel_sizes: Sequence[int] = (3, 7)

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = self.in_channels
        conv_outs = [
            ConvBNReLU(c, kernel_size=k, padding=k // 2, groups=c, padding_mode="reflect")(x, train)
            for k in self.kernel_sizes
        ]
        descs = []
        for out in conv_outs:
            g = global_avg_pool(out, keepdims=False).reshape(out.shape[0], c)
            g = nn.Dense(c // 2, use_bias=True)(g)
            g = nn.Dense(c, use_bias=True)(g)
            descs.append(g)
        wgt = nn.softmax(jnp.stack(descs, axis=1), axis=1)  # (N, M, C)
        fused = sum(
            wgt[:, i][:, None, None, :] * conv_outs[i] for i in range(len(conv_outs))
        )
        return ConvPad(c, 3, padding=1, use_bias=False)(fused)


class ContrastAttention(nn.Module):
    """mean+std channel descriptor -> MLP -> sigmoid gate (attention.py:270-286)."""

    in_channels: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        mean = jnp.mean(x, axis=(1, 2), keepdims=True)
        # gradient-safe std (attention.py:254 sqrt(nanmean((x-mean)^2))):
        # at a 1x1 spatial map the variance is EXACTLY 0 and sqrt'(0)=inf
        # poisons every upstream gradient in one step (torch hits the same
        # NaN).  Forward is identical; the double-where routes the v==0
        # gradient to 0 instead of inf — a strictly-better divergence that
        # only triggers on degenerate spatial sizes.
        v = jnp.mean((x - mean) ** 2, axis=(1, 2), keepdims=True)
        safe = jnp.maximum(v, jnp.finfo(jnp.result_type(v)).tiny)
        std = jnp.where(v > 0, jnp.sqrt(safe), 0.0)
        w = mean + std
        w = ConvPad(self.in_channels // 16, 1, use_bias=True)(w)
        w = nn.relu(w)
        w = ConvPad(self.in_channels, 1, use_bias=True)(w)
        return x * nn.sigmoid(w)


class CCA(nn.Module):
    """Contrast-aware channel attention + dw-pw conv tail (attention.py:233-260)."""

    in_channels: int
    out_channels: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        gated = ContrastAttention(self.in_channels)(x, train)
        y = ConvBNReLU(self.in_channels, kernel_size=3, padding=1, groups=self.in_channels)(gated, train)
        y = ConvBNReLU(self.out_channels, kernel_size=1, padding=0)(y, train)
        return y


class IMDB(nn.Module):
    """Information multi-distillation block (attention.py:288-312): iterative
    split/refine with GELU convs, contrast attention, residual 1x1 fuse."""

    in_channels: int
    split: int = 3

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = self.in_channels
        rc = c // (self.split + 1)

        def cl(feats, out_ch):
            y = ConvPad(out_ch, 3, padding=1, use_bias=False)(feats)
            return nn.gelu(y)

        course = cl(x, c)
        refines: List = []
        for i in range(self.split):
            refines.append(course[..., :rc])
            rest = course[..., rc:]
            course = cl(rest, rc if i == self.split - 1 else c)
        cat = jnp.concatenate(refines + [course], axis=-1)
        cat = ContrastAttention(cat.shape[-1])(cat, train)
        out = ConvPad(c, 1, use_bias=False)(cat)
        return x + out


ATTENTION_DICT = {
    "ska": SKA,
    "dual": DualAttention,
    "drsam": DRSAM,
    "cca": lambda ch: CCA(ch, ch),
    "imdb": IMDB,
}


def make_attentions(attention: Callable, encoder_channels: Sequence[int], flag: Sequence[bool]):
    """Flag-gated per-stage attention list (attention.py:7-10)."""
    return [attention(ch) if f else Identity() for ch, f in zip(encoder_channels, flag)]
