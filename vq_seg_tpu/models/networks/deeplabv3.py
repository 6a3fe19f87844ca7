"""DeepLabV3 / V3+ / UniMatch (reference models/networks/deeplabv3/).

NHWC Flax re-designs: ASPP with (separable) atrous convs + image pooling
(decoder.py:118-153), V3+ low-level fusion (decoder.py:18-68), and the
UniMatch feature-perturbation dual forward (net.py:80-126) expressed as an
explicit dropout-perturbed second decode instead of a batch-concat trick.
"""
from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from vq_seg_tpu.models.encoders import make_encoder
from vq_seg_tpu.models.layers import ConvBNReLU, ConvPad, global_avg_pool, resize_bilinear, upsample_bilinear_ac
from vq_seg_tpu.models.modules.heads import SegmentationHead
from vq_seg_tpu.models.networks import register


class SeparableConvBNReLU(nn.Module):
    """depthwise k + pointwise 1x1, BN, ReLU (decoder.py:157-185)."""

    features: int
    kernel_size: int = 3
    dilation: int = 1

    @nn.compact
    def __call__(self, x, train: bool):
        pad = self.dilation * (self.kernel_size // 2)
        x = ConvPad(x.shape[-1], self.kernel_size, 1, pad, self.dilation,
                    groups=x.shape[-1], use_bias=False)(x)
        x = ConvPad(self.features, 1, use_bias=False)(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5)(x)
        return nn.relu(x)


class ASPP(nn.Module):
    """Atrous spatial pyramid pooling (decoder.py:118-153)."""

    out_channels: int = 256
    atrous_rates: Tuple[int, int, int] = (12, 24, 36)
    separable: bool = False
    dropout: float = 0.5

    @nn.compact
    def __call__(self, x, train: bool):
        res = [ConvBNReLU(self.out_channels, 1, padding=0)(x, train)]
        for rate in self.atrous_rates:
            if self.separable:
                res.append(SeparableConvBNReLU(self.out_channels, 3, rate)(x, train))
            else:
                res.append(ConvBNReLU(self.out_channels, 3, padding=rate, dilation=rate)(x, train))
        pooled = global_avg_pool(x)
        pooled = ConvBNReLU(self.out_channels, 1, padding=0)(pooled, train)
        res.append(resize_bilinear(pooled, x.shape[1:3]))
        y = jnp.concatenate(res, axis=-1)
        y = ConvBNReLU(self.out_channels, 1, padding=0)(y, train)
        if train:
            y = nn.Dropout(self.dropout, deterministic=False)(y)
        return y


class DeepLabV3PlusDecoder(nn.Module):
    """(decoder.py:18-68): ASPP -> x4 align-corners up -> fuse with the 48-ch
    projected high-res (stage-2) feature."""

    out_channels: int = 256
    atrous_rates: Tuple[int, int, int] = (12, 24, 36)
    output_stride: int = 16

    @nn.compact
    def __call__(self, features, train: bool):
        y = ASPP(self.out_channels, self.atrous_rates, separable=True)(features[-1], train)
        y = SeparableConvBNReLU(self.out_channels, 3)(y, train)
        scale = 2 if self.output_stride == 8 else 4
        y = upsample_bilinear_ac(y, scale=scale)
        hi = ConvBNReLU(48, 1, padding=0)(features[-4], train)
        y = jnp.concatenate([resize_bilinear(y, hi.shape[1:3]) if y.shape[1:3] != hi.shape[1:3]
                             else y, hi], axis=-1)
        return SeparableConvBNReLU(self.out_channels, 3)(y, train)


@register("deeplabv3")
class DeepLabV3(nn.Module):
    """(net.py:6-40): ASPP on the deepest feature, x32 head upsample."""

    encoder_name: str
    num_classes: int
    encoder_weights: Optional[str] = None
    in_channels: int = 3
    decoder_channels: int = 256
    depth: int = 5
    upsampling: int = 32

    @nn.compact
    def __call__(self, x, train: bool = False):
        encoder, _ = make_encoder(self.encoder_name, self.in_channels, self.depth, module_name="encoder")
        feats = encoder(x, train)
        y = ASPP(self.decoder_channels)(feats[-1], train)
        y = ConvBNReLU(self.decoder_channels, 3)(y, train)
        return SegmentationHead(self.num_classes, 1, self.upsampling,
                                name="segmentation_head")(y, train)


@register("deeplabv3plus")
class DeepLabV3Plus(nn.Module):
    """(net.py:42-78): output-stride-16 encoder + V3+ decoder; returns
    (logits, None) like the reference."""

    encoder_name: str
    num_classes: int
    encoder_weights: Optional[str] = None
    in_channels: int = 3
    decoder_channels: int = 256
    depth: int = 5
    encoder_output_stride: int = 16
    decoder_atrous_rates: Tuple[int, int, int] = (12, 24, 36)
    upsampling: int = 4

    @nn.compact
    def __call__(self, x, train: bool = False):
        encoder, _ = make_encoder(self.encoder_name, self.in_channels, self.depth,
                                  output_stride=self.encoder_output_stride, module_name="encoder")
        feats = encoder(x, train)
        y = DeepLabV3PlusDecoder(self.decoder_channels, tuple(self.decoder_atrous_rates),
                                 self.encoder_output_stride, name="decoder")(feats, train)
        out = SegmentationHead(self.num_classes, 1, self.upsampling,
                               name="segmentation_head")(y, train)
        if out.shape[1:3] != x.shape[1:3]:
            out = resize_bilinear(out, x.shape[1:3])
        return out, None


@register("unimatch")
class UniMatch(nn.Module):
    """UniMatch baseline (net.py:80-126): optional feature-perturbation (fp)
    forward that dropout-perturbs the stage-1 and deepest features and
    decodes both views.  Returns (out, out_fp|None)."""

    encoder_name: str
    num_classes: int
    encoder_weights: Optional[str] = None
    in_channels: int = 3
    decoder_channels: int = 256
    depth: int = 5
    encoder_output_stride: int = 16
    decoder_atrous_rates: Tuple[int, int, int] = (12, 24, 36)
    upsampling: int = 4

    @nn.compact
    def __call__(self, x, need_fp: bool = False, train: bool = False):
        encoder, _ = make_encoder(self.encoder_name, self.in_channels, self.depth,
                                  output_stride=self.encoder_output_stride, module_name="encoder")
        feats = encoder(x, train)
        decoder = DeepLabV3PlusDecoder(self.decoder_channels, tuple(self.decoder_atrous_rates),
                                       self.encoder_output_stride, name="decoder")
        head = SegmentationHead(self.num_classes, 1, self.upsampling, name="segmentation_head")

        def decode(fs):
            y = decoder(fs, train)
            out = head(y, train)
            if out.shape[1:3] != x.shape[1:3]:
                out = resize_bilinear(out, x.shape[1:3])
            return out

        if need_fp:
            drop = nn.Dropout(0.5, deterministic=not train)
            c1, c4 = feats[1], feats[-1]
            feats_fp = list(feats)
            feats_fp[1] = drop(c1)
            feats_fp[-1] = drop(c4)
            # batch-concat both views so decoder BN sees the joint batch,
            # mirroring the reference's torch.cat trick (net.py:113-118)
            joint = [jnp.concatenate([a, b], axis=0) for a, b in zip(feats, feats_fp)]
            out = decode(joint)
            return out[: x.shape[0]], out[x.shape[0]:]
        return decode(feats), None
