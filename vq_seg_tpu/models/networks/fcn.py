"""FCN-32s (reference models/networks/fcn/): VGG backbone, fc6/fc7 as convs,
x32 transposed-conv upsampling with a fixed bilinear kernel
(net.py:10-23, decoder.py:2-18).  Returns (logits, None)."""
from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from vq_seg_tpu.models.encoders import make_encoder
from vq_seg_tpu.models.layers import ConvPad, resize_bilinear, torch_conv_default
from vq_seg_tpu.models.networks import register


def bilinear_upsampling_kernel(channels: int, kernel_size: int):
    """2D bilinear kernel, HWIO with per-channel diagonal placement
    (reference get_upsampling_weight, fcn/net.py:10-23)."""
    factor = (kernel_size + 1) // 2
    center = factor - 1 if kernel_size % 2 == 1 else factor - 0.5
    og = np.ogrid[:kernel_size, :kernel_size]
    filt = (1 - abs(og[0] - center) / factor) * (1 - abs(og[1] - center) / factor)
    w = np.zeros((kernel_size, kernel_size, channels, channels), np.float32)
    for i in range(channels):
        w[:, :, i, i] = filt
    return jnp.asarray(w)


@register("fcn32s")
class FCN32s(nn.Module):
    encoder_name: str
    num_classes: int
    encoder_weights: Optional[str] = None
    in_channels: int = 3

    @nn.compact
    def __call__(self, x, train: bool = False):
        encoder, enc_ch = make_encoder(self.encoder_name, self.in_channels, 5, module_name="encoder")
        feats = encoder(x, train)
        y = feats[-1]
        y = ConvPad(4096, 7, use_bias=True, kernel_init=torch_conv_default, name="fc6")(y)
        y = nn.relu(y)
        if train:
            y = nn.Dropout(0.5, deterministic=False)(y)
        y = ConvPad(4096, 1, use_bias=True, kernel_init=torch_conv_default, name="fc7")(y)
        y = nn.relu(y)
        if train:
            y = nn.Dropout(0.5, deterministic=False)(y)
        y = ConvPad(self.num_classes, 1, use_bias=True, kernel_init=torch_conv_default,
                    name="score")(y)
        k = self.num_classes
        kernel = self.param("upscore_kernel",
                            lambda key, shape: bilinear_upsampling_kernel(k, 64), (64, 64, k, k))
        y = nn.ConvTranspose(k, (64, 64), strides=(32, 32), use_bias=False,
                             kernel_init=lambda *a: kernel, name="upscore")(y)
        if y.shape[1:3] != x.shape[1:3]:
            y = resize_bilinear(y, x.shape[1:3])
        return y, None
