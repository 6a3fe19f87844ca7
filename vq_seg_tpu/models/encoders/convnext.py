"""ConvNeXt encoders (proper support for what the reference only half-wires:
config/vqcanet_convnext.json names ``convnext_base`` but the reference
factory cannot dispatch it — models/encoders/__init__.py:9-21 only matches
resnet/vgg; SURVEY.md §2.2 note).

ConvNeXt (Liu et al., 2022) re-implemented in Flax NHWC: patchify stem
(conv 4x4 stride 4 + LayerNorm), stages of [dwconv7x7 -> LN -> pwconv 4x ->
GELU -> pwconv -> layer-scale gamma -> residual] blocks with LN+conv2x2/s2
downsamplers between stages.

Staging convention: ConvNeXt has four resolution levels at strides
4/8/16/32 (no stride-2 feature), so the encoder uses ``depth=4`` semantics —
forward returns [input, stage1(s4), stage2(s8), stage3(s16), stage4(s32)]
and ``encoder_channels() == (3, d0, d1, d2, d3)``.  U-Net configs pair it
with ``depth: 4`` and a head ``upsampling: 4`` to restore input resolution.
"""
from __future__ import annotations

from typing import List, Sequence

import flax.linen as nn
import jax.numpy as jnp

from vq_seg_tpu.models.layers import ConvPad, torch_conv_default

convnext_encoders = {
    "convnext_tiny": dict(depths=(3, 3, 9, 3), dims=(96, 192, 384, 768)),
    "convnext_small": dict(depths=(3, 3, 27, 3), dims=(96, 192, 384, 768)),
    "convnext_base": dict(depths=(3, 3, 27, 3), dims=(128, 256, 512, 1024)),
    "convnext_large": dict(depths=(3, 3, 27, 3), dims=(192, 384, 768, 1536)),
}


class ConvNeXtBlock(nn.Module):
    dim: int
    layer_scale_init: float = 1e-6

    @nn.compact
    def __call__(self, x):
        h = ConvPad(self.dim, 7, 1, 3, groups=self.dim, use_bias=True,
                    kernel_init=torch_conv_default, name="dwconv")(x)
        h = nn.LayerNorm(epsilon=1e-6, name="norm")(h)
        h = nn.Dense(4 * self.dim, name="pwconv1")(h)
        # exact (erf) GELU — torchvision's nn.GELU default, so converted
        # ImageNet weights reproduce the reference activations bit-closely
        h = nn.gelu(h, approximate=False)
        h = nn.Dense(self.dim, name="pwconv2")(h)
        gamma = self.param("gamma", nn.initializers.constant(self.layer_scale_init),
                           (self.dim,))
        return x + gamma * h


class ConvNeXtEncoder(nn.Module):
    depths: Sequence[int]
    dims: Sequence[int]
    depth: int = 4
    in_channels: int = 3

    def encoder_channels(self):
        return (self.in_channels,) + tuple(self.dims[: self.depth])

    @nn.compact
    def __call__(self, x, train: bool = False):
        feats: List = [x]
        y = ConvPad(self.dims[0], 4, 4, 0, use_bias=True,
                    kernel_init=torch_conv_default, name="stem_conv")(x)
        y = nn.LayerNorm(epsilon=1e-6, name="stem_norm")(y)
        for si in range(self.depth):
            if si > 0:
                y = nn.LayerNorm(epsilon=1e-6, name=f"down_norm{si}")(y)
                y = ConvPad(self.dims[si], 2, 2, 0, use_bias=True,
                            kernel_init=torch_conv_default, name=f"down_conv{si}")(y)
            for bi in range(self.depths[si]):
                y = ConvNeXtBlock(self.dims[si], name=f"stage{si}_block{bi}")(y)
            feats.append(y)
        return feats
