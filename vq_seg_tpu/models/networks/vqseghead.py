"""VQSegHeadNet (reference models/networks/vqseghead/net.py:11-88): a VQ-UNet
whose classifier is itself a VQ codebook over decoder features
(VQSegmentationHead); reflect-padded encoder.
Returns (score, commit, usage, seghead_commit_loss, seghead_code_usage)."""
from __future__ import annotations

from typing import Any, Optional, Tuple

import flax.linen as nn
from flax.core import FrozenDict

from vq_seg_tpu.models.layers import upsample_bilinear_ac
from vq_seg_tpu.models.modules.heads import VQSegmentationHead
from vq_seg_tpu.models.networks import register
from vq_seg_tpu.models.networks.vq_unet import VQUnetCore


@register("vqsegheadnet")
class VQSegHeadNet(nn.Module):
    encoder_name: str
    num_classes: int
    vq_cfg: Any
    margin: float = 0.5
    scale: float = 30.0
    encoder_weights: Optional[str] = None
    in_channels: int = 3
    decoder_channels: Optional[Tuple[int, ...]] = None
    depth: int = 5
    upsampling: int = 2
    pt_init: str = "kmeans"
    seghead_distance: str = "euclidean"

    @nn.compact
    def __call__(self, x, train: bool = False, init_codebook: bool = False):
        core = VQUnetCore(self.encoder_name, FrozenDict(dict(self.vq_cfg)), self.in_channels,
                          self.decoder_channels, self.depth, padding_mode="reflect",
                          name="core")
        dec, commit, usage, dec_ch, _feats = core(x, train, init_codebook)
        head = VQSegmentationHead(dim=dec_ch[-1], num_embeddings=self.num_classes,
                                  kmeans_init=(self.pt_init == "kmeans"),
                                  distance=self.seghead_distance, name="segmentation_head")
        _q, score, _idx, head_commit, head_usage = head(dec, train=train,
                                                        init_codebook=init_codebook)
        if self.upsampling > 1:
            score = upsample_bilinear_ac(score, scale=self.upsampling)
        return score, commit, usage, head_commit, head_usage
