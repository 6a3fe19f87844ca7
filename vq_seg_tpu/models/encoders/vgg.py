"""VGG encoders in Flax (NHWC), staged at MaxPool boundaries.

Re-design of reference ``models/encoders/vgg.py:16-131``: the torchvision
feature stack is split into U-Net stages such that each stage *starts* with
the MaxPool that ends the previous resolution (reference get_stages,
vgg.py:27-37).  out_channels (64, 128, 256, 512, 512, 512) — note stage 0
already carries 64 channels (unlike ResNet where stage 0 is the raw input).

Module names follow ``features.N`` torchvision indices for 1:1 pretrained
weight conversion (utils/torch_weights.convert_vgg).
"""
from __future__ import annotations

from typing import List, Sequence, Union

import flax.linen as nn

from vq_seg_tpu.models.layers import ConvPad, torch_conv_default

# torchvision vgg configs (A/B/D/E)
VGG_CFG = {
    "A": (64, "M", 128, "M", 256, 256, "M", 512, 512, "M", 512, 512, "M"),
    "B": (64, 64, "M", 128, 128, "M", 256, 256, "M", 512, 512, "M", 512, 512, "M"),
    "D": (64, 64, "M", 128, 128, "M", 256, 256, 256, "M", 512, 512, 512, "M", 512, 512, 512, "M"),
    "E": (64, 64, "M", 128, 128, "M", 256, 256, 256, 256, "M", 512, 512, 512, 512, "M",
          512, 512, 512, 512, "M"),
}

vgg_encoders = {
    "vgg11": dict(out_channels=(64, 128, 256, 512, 512, 512), config="A", batch_norm=False),
    "vgg11_bn": dict(out_channels=(64, 128, 256, 512, 512, 512), config="A", batch_norm=True),
    "vgg13": dict(out_channels=(64, 128, 256, 512, 512, 512), config="B", batch_norm=False),
    "vgg13_bn": dict(out_channels=(64, 128, 256, 512, 512, 512), config="B", batch_norm=True),
    "vgg16": dict(out_channels=(64, 128, 256, 512, 512, 512), config="D", batch_norm=False),
    "vgg16_bn": dict(out_channels=(64, 128, 256, 512, 512, 512), config="D", batch_norm=True),
    "vgg19": dict(out_channels=(64, 128, 256, 512, 512, 512), config="E", batch_norm=False),
    "vgg19_bn": dict(out_channels=(64, 128, 256, 512, 512, 512), config="E", batch_norm=True),
}


class VGGEncoder(nn.Module):
    out_channels: Sequence[int]
    config: str
    batch_norm: bool = False
    depth: int = 5
    in_channels: int = 3

    def encoder_channels(self):
        return tuple(self.out_channels[: self.depth + 1])

    @nn.compact
    def __call__(self, x, train: bool = False):
        cfg: Sequence[Union[int, str]] = VGG_CFG[self.config]
        # Assign torchvision feature indices, then group into stages where
        # each 'M' closes the current stage and opens the next with the pool.
        feats: List = []
        stage = 0
        idx = 0
        y = x
        for v in cfg:
            if stage > self.depth:
                break
            if v == "M":
                feats.append(y)
                stage += 1
                if stage > self.depth:
                    break
                y = nn.max_pool(y, (2, 2), strides=(2, 2))
                idx += 1
            else:
                y = ConvPad(int(v), 3, 1, 1, use_bias=True,
                            kernel_init=torch_conv_default, name=f"features_{idx}")(y)
                idx += 1
                if self.batch_norm:
                    y = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                                     epsilon=1e-5, name=f"features_{idx}")(y)
                    idx += 1
                y = nn.relu(y)
                idx += 1  # count the ReLU like torchvision's Sequential does
        if stage <= self.depth:
            feats.append(y)
        return feats[: self.depth + 1]
