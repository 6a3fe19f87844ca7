"""SemiWeedNet (reference models/networks/semiweednet/net.py:6-55):
DeepLabV3+ with SKA on the deepest feature and an MLP projection head for
contrastive semi-supervision.  Returns (logits, mlp_out|None)."""
from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp

from vq_seg_tpu.models.encoders import make_encoder
from vq_seg_tpu.models.layers import global_avg_pool, resize_bilinear
from vq_seg_tpu.models.modules.attention import SKA
from vq_seg_tpu.models.modules.heads import SegmentationHead
from vq_seg_tpu.models.networks import register
from vq_seg_tpu.models.networks.deeplabv3 import DeepLabV3PlusDecoder


@register("semiweednet")
class SemiWeedNet(nn.Module):
    encoder_name: str
    num_classes: int
    encoder_weights: Optional[str] = None
    in_channels: int = 3
    decoder_channels: int = 256
    depth: int = 5
    encoder_output_stride: int = 16
    decoder_atrous_rates: Tuple[int, int, int] = (6, 12, 18)
    upsampling: int = 4

    @nn.compact
    def __call__(self, x, issup: bool = False, train: bool = False):
        encoder, enc_ch = make_encoder(self.encoder_name, self.in_channels, self.depth,
                                       output_stride=self.encoder_output_stride, module_name="encoder")
        feats = list(encoder(x, train))
        last_feature = feats[-1]
        feats[-1] = SKA(enc_ch[-1], name="ska")(feats[-1], train)
        y = DeepLabV3PlusDecoder(self.decoder_channels, tuple(self.decoder_atrous_rates),
                                 self.encoder_output_stride, name="decoder")(feats, train)
        out = SegmentationHead(self.num_classes, 1, self.upsampling,
                               name="segmentation_head")(y, train)
        if train and not issup:
            g = global_avg_pool(last_feature, keepdims=False).reshape(x.shape[0], -1)
            g = nn.Dense(enc_ch[-1], name="mlp_0")(g)
            g = nn.relu(g)
            g = nn.Dense(128, name="mlp_1")(g)
            return out, g
        return out, None
