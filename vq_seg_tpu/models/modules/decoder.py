"""U-Net decoders (NHWC re-design of reference models/networks/unet/decoder.py).

``UnetDecoder``: deepest feature first; each block is double conv-BN-ReLU on
the concat of the bilinearly-resized previous output and the skip
(decoder.py:14-39).  Channel plan: encoder_channels reversed (sans input),
decoder_channels e.g. (1024, 512, 256, 128, 32) for resnet50
(unet/net.py:823-825).

``CCAUnetDecoder``: same with flag-gated CCA attention after each block
(decoder.py:42-72).
"""
from __future__ import annotations

from typing import Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp

from vq_seg_tpu.models.layers import ConvBNReLU, decoder_bn_params, resize_bilinear
from vq_seg_tpu.models.modules.attention import CCA


class DoubleConv(nn.Module):
    features: int
    kernel_size: int = 3

    @nn.compact
    def __call__(self, x, train: bool):
        # cfg.train.bn_eps / bn_momentum reach exactly the decoder BNs, as in
        # the reference's init_weight([decoder, head], ...) call
        # (models/__init__.py:19-26)
        eps, mom = decoder_bn_params()
        x = ConvBNReLU(self.features, self.kernel_size, bn_eps=eps, bn_momentum=mom)(x, train)
        x = ConvBNReLU(self.features, self.kernel_size, bn_eps=eps, bn_momentum=mom)(x, train)
        return x


class UnetDecoder(nn.Module):
    """``subpixel_tail``: run the FINAL block at half resolution with 4x
    channels (skip space-to-depth'd in, output depth-to-space'd back).  The
    reference tail (32 ch at the widest resolution) idles 3/4 of the MXU's
    128 lanes (24.8 TF/s isolated, BASELINE.md roofline); the subpixel
    layout fills them — measured +9.2% step throughput at 512^2.  Same
    output shape; NOT numerically identical (a capacity-comparable
    structural change), so it is an opt-in tuned-profile knob, never the
    default.  Requires even skip spatial dims (any input divisible by 4)."""

    decoder_channels: Sequence[int]
    cca: Optional[Sequence[bool]] = None  # CCAUnetDecoder when set
    subpixel_tail: bool = False

    @nn.compact
    def __call__(self, features, train: bool = False):
        """features: encoder stage outputs shallow->deep, *without* the raw
        input (the callers pass encoder(x)[1:], unet/net.py:832)."""
        feats = list(features)[::-1]  # deep -> shallow
        x = feats[0]
        n_blocks = len(self.decoder_channels)
        for i in range(n_blocks):
            if (self.subpixel_tail and i == n_blocks - 1 and i > 0
                    and self.cca is None):
                skip = feats[i]
                b, sh, sw, sc = skip.shape
                s2d = skip.reshape(b, sh // 2, 2, sw // 2, 2, sc)
                s2d = s2d.transpose(0, 1, 3, 2, 4, 5).reshape(
                    b, sh // 2, sw // 2, 4 * sc)
                up = resize_bilinear(x, (sh // 2, sw // 2))
                x = jnp.concatenate([up, s2d], axis=-1)
                x = DoubleConv(4 * self.decoder_channels[i],
                               name=f"block{i}")(x, train)
                b, h, w, c = x.shape
                x = x.reshape(b, h, w, 2, 2, c // 4)
                x = x.transpose(0, 1, 3, 2, 4, 5).reshape(
                    b, 2 * h, 2 * w, c // 4)
                continue
            if i > 0:
                skip = feats[i]
                up = resize_bilinear(x, skip.shape[1:3])
                x = jnp.concatenate([up, skip], axis=-1)
            x = DoubleConv(self.decoder_channels[i], name=f"block{i}")(x, train)
            if self.cca is not None and self.cca[i]:
                x = CCA(self.decoder_channels[i], self.decoder_channels[i],
                        name=f"cca{i}")(x, train)
        return x
