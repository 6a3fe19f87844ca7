"""Plain U-Nets, angular-head and auxiliary-loss VQ-UNets
(reference models/networks/unet/net.py).

  * ``Unet``          (:806-849)  — supervised ResNet-UNet baseline
  * ``UnetOriginal``  (:942-981)  — textbook 2015 U-Net with valid convs
  * ``VQASHUnet``/``v2`` (:323-481) — angular segmentation heads
  * ``VQUnetwithSalientloss`` (:484-562) — auxiliary sigmoid saliency decoder
  * ``SupConVQUnet``  (:726-804)  — pixel supervised-contrastive aux loss
  * ``VQRePTUnetAngular``/``v3`` (modified_vqunet/net.py:983-1138)
"""
from __future__ import annotations

from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
from flax.core import FrozenDict

from vq_seg_tpu.models.encoders import make_encoder
from vq_seg_tpu.models.layers import (
    ConvBNReLU,
    ConvPad,
    resize_bilinear,
    torch_conv_default,
    upsample_bilinear_ac,
)
from vq_seg_tpu.models.modules.decoder import UnetDecoder
from vq_seg_tpu.models.modules.heads import (
    AngularSegmentationHead,
    AngularSegmentationHeadv2,
    AngularSegmentationHeadv3,
)
from vq_seg_tpu.models.networks import register
from vq_seg_tpu.models.networks.vq_unet import (
    VQUnetCore,
    _decoder_channels,
    _VQHead,
    self_entropy,
)
from vq_seg_tpu.losses.contrastive import supcon_loss


@register("unet")
class Unet(nn.Module):
    """Plain encoder-decoder U-Net, no VQ (unet/net.py:806-849).
    Returns logits only."""

    encoder_name: str
    num_classes: int
    in_channels: int = 3
    decoder_channels: Optional[Tuple[int, ...]] = None
    depth: int = 5
    upsampling: int = 2
    encoder_weights: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        core = VQUnetCore(self.encoder_name, None, self.in_channels,
                          self.decoder_channels, self.depth, name="core")
        dec, _, _, dec_ch, _feats = core(x, train)
        return _VQHead(self.num_classes, 3, self.upsampling, name="segmentation_head")(dec, train)


class DBConv(nn.Module):
    """Double VALID 3x3 conv + BN + ReLU (unet/net.py:851-865)."""

    features: int

    @nn.compact
    def __call__(self, x, train: bool):
        x = ConvBNReLU(self.features, 3, padding=0, use_bias=True)(x, train)
        x = ConvBNReLU(self.features, 3, padding=0, use_bias=True)(x, train)
        return x


@register("unetoriginal")
class UnetOriginal(nn.Module):
    """Textbook 2015 U-Net (unet/net.py:867-981): valid convs, transposed-conv
    upsampling, centre-pad to match skips, reflect-pad the input.

    Divergence: the reference's head receives the (output, None) tuple the
    decoder returns — a latent crash; here the intended tensor is used.
    """

    num_classes: int = 3
    in_channels: int = 3
    first_outchannels: int = 64
    upsampling: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        factor = 4
        n, orgh, orgw, c = x.shape
        padh = (factor - orgh % factor) % factor
        padw = (factor - orgw % factor) % factor
        x = jnp.pad(x, ((0, 0), (4, padh + 4), (4, padw + 4), (0, 0)), mode="reflect")
        f = self.first_outchannels
        skips = []
        y = x
        for i, ch in enumerate((f, f * 2, f * 4, f * 8)):
            y = DBConv(ch, name=f"contract{i}")(y, train)
            skips.append(y)
            y = nn.max_pool(y, (2, 2), strides=(2, 2))
        y = DBConv(f * 16, name="bottleneck")(y, train)
        for i, (skip, ch) in enumerate(zip(skips[::-1], (f * 8, f * 4, f * 2, f))):
            y = nn.ConvTranspose(ch, (2, 2), strides=(2, 2), name=f"upconv{i}")(y)
            dh, dw = skip.shape[1] - y.shape[1], skip.shape[2] - y.shape[2]
            y = jnp.pad(y, ((0, 0), (dh // 2, dh - dh // 2), (dw // 2, dw - dw // 2), (0, 0)))
            y = jnp.concatenate([y, skip], axis=-1)
            y = DBConv(ch, name=f"expand{i}")(y, train)
        out = ConvPad(self.num_classes, 1, use_bias=True, kernel_init=torch_conv_default,
                      name="segmentation_head")(y)
        return out[:, :orgh, :orgw, :], None


@register("vqashunet")
class VQASHUnet(nn.Module):
    """Angular seg-head v1 over a VQ-UNet trunk (unet/net.py:323-402);
    reflect-padded encoder.  Returns (scores, commit, usage, angular_loss)."""

    encoder_name: str
    num_classes: int
    vq_cfg: Any
    margin: float = 1.5
    scale: float = 1.0
    use_feature: bool = False
    encoder_weights: Optional[str] = None
    in_channels: int = 3
    decoder_channels: Optional[Tuple[int, ...]] = None
    depth: int = 5
    upsampling: int = 2
    head_version: int = 1
    # ratio total_seghead_commit_loss_weight / total_angular_loss_weight so
    # the driver's single loss weight reproduces the reference's separate
    # weighting (deprecated/train_vqash_v2.py)
    seghead_commit_weight: float = 1.0

    @nn.compact
    def __call__(self, x, gt=None, train: bool = False,
                 init_codebook: bool = False, init_protos: bool = False):
        pad = "reflect" if self.head_version == 1 else "zeros"
        core = VQUnetCore(self.encoder_name, FrozenDict(dict(self.vq_cfg)), self.in_channels,
                          self.decoder_channels, self.depth, padding_mode=pad, name="core")
        dec, commit, usage, dec_ch, _feats = core(x, train, init_codebook)
        if self.head_version == 1:
            head = AngularSegmentationHead(
                num_classes=self.num_classes, embedding_dim=dec_ch[-1],
                out_channels=dec_ch[-1], scale=self.scale, margin=self.margin,
                upsampling=self.upsampling, name="segmentation_head")
            out, aloss = head(dec, gt, train=train, init_protos=init_protos)
            return out, commit, usage, aloss
        head = AngularSegmentationHeadv2(
            num_classes=self.num_classes, out_channels=dec_ch[-1],
            scale=self.scale, margin=self.margin, upsampling=self.upsampling,
            commit_weight=self.seghead_commit_weight,
            name="segmentation_head")
        out, aloss = head(dec, gt, train=train, init_protos=init_protos)
        # v2's loss already folds its commitment term (unet/net.py:455-458
        # returns them joined here as (angular, seghead_commit) — we expose
        # the single combined scalar)
        return out, commit, usage, aloss


@register("vqashunetv2")
class VQASHUnetv2(VQASHUnet):
    head_version: int = 2


@register("VQUnetwithSalientloss")
class VQUnetwithSalientloss(nn.Module):
    """VQ-UNet + auxiliary saliency decoder from the deepest feature
    (unet/net.py:484-562): conv-bn-relu x4 with x2 bilinear upsamples,
    sigmoid 1-channel output (train only).
    Returns (logits, commit, usage, salient_map|None)."""

    encoder_name: str
    num_classes: int
    vq_cfg: Any
    in_channels: int = 3
    decoder_channels: Optional[Tuple[int, ...]] = None
    depth: int = 5
    upsampling: int = 2

    @nn.compact
    def __call__(self, x, train: bool = False, init_codebook: bool = False):
        core = VQUnetCore(self.encoder_name, FrozenDict(dict(self.vq_cfg)), self.in_channels,
                          self.decoder_channels, self.depth, name="core")
        dec, commit, usage, dec_ch, feats = core(x, train, init_codebook)
        out = _VQHead(self.num_classes, 3, self.upsampling, name="segmentation_head")(dec, train)
        if not train:
            return out, commit, usage
        # auxiliary decoder on the deepest post-VQ feature (unet/net.py:
        # 530-548): conv-bn-relu + x2 bilinear, channels 512/256/64/32 -> 1.
        aux = feats[-1]
        for ch in (512, 256, 64, 32):
            aux = ConvBNReLU(ch, 3)(aux, train)
            aux = resize_bilinear(aux, (aux.shape[1] * 2, aux.shape[2] * 2))
        sal = ConvPad(1, 3, 1, 1, use_bias=False)(aux)
        sal = jax.nn.sigmoid(sal)
        return out, commit, usage, sal


@register("supconvqunet")
class SupConVQUnet(nn.Module):
    """VQ-UNet + pixel supervised-contrastive aux loss on decoder features
    (unet/net.py:726-804); aux loss only on the labeled split."""

    encoder_name: str
    num_classes: int
    vq_cfg: Any
    use_feature: bool = False
    encoder_weights: Optional[str] = None
    in_channels: int = 3
    decoder_channels: Optional[Tuple[int, ...]] = None
    depth: int = 5
    upsampling: int = 2

    @nn.compact
    def __call__(self, x, gt=None, split: Optional[str] = None, train: bool = False,
                 init_codebook: bool = False):
        core = VQUnetCore(self.encoder_name, FrozenDict(dict(self.vq_cfg)), self.in_channels,
                          self.decoder_channels, self.depth, name="core")
        dec, commit, usage, dec_ch, _feats = core(x, train, init_codebook)
        aux = jnp.float32(0.0)
        if train and split == "label" and gt is not None:
            aux = supcon_loss(dec, gt)
        out = _VQHead(self.num_classes, 3, self.upsampling, softmax=True,
                      name="segmentation_head")(dec, train)
        return out, commit, usage, aux


@register("vqreptunetangular")
class VQRePTUnetAngular(nn.Module):
    """Angular head v2 as classifier with self-entropy filtering
    (modified_vqunet/net.py:983-1060); forward(x, gt, percent)."""

    encoder_name: str
    num_classes: int
    vq_cfg: Any
    margin: float = 1.5
    scale: float = 1.0
    use_feature: bool = False
    encoder_weights: Optional[str] = None
    in_channels: int = 3
    decoder_channels: Optional[Tuple[int, ...]] = None
    depth: int = 5
    upsampling: int = 2
    pt_init: str = "kmeans"

    @nn.compact
    def __call__(self, x, gt=None, percent=None, train: bool = False,
                 init_codebook: bool = False, init_protos: bool = False):
        core = VQUnetCore(self.encoder_name, FrozenDict(dict(self.vq_cfg)), self.in_channels,
                          self.decoder_channels, self.depth, padding_mode="reflect",
                          name="core")
        dec, commit, usage, dec_ch, _feats = core(x, train, init_codebook)
        # reference: the head itself runs at decoder resolution (upsampling=1,
        # modified_vqunet/net.py:1010) — the x2 upsample applies to the OUTPUT
        # only (:1052), so the angular loss is computed on the decoder grid
        head = AngularSegmentationHeadv2(
            num_classes=self.num_classes, out_channels=dec_ch[-1], pt_init=self.pt_init,
            scale=self.scale, margin=self.margin, upsampling=1,
            name="segmentation_head")
        entropy = None
        if train and gt is not None:
            # entropy of the head's own (pre-margin) scores is not available
            # before the head call; reference computes it from the head
            # output inside the net (modified_vqunet/net.py:1035-1040) — a
            # chicken-and-egg it resolves by a preliminary no-grad pass.
            pre, _ = head(dec, None, train=False)
            entropy = self_entropy(pre.reshape(-1, self.num_classes).reshape(pre.shape))
            entropy = entropy.reshape(-1)
        out, aloss = head(dec, gt, percent if percent is not None else 100.0, entropy,
                          train=train, init_protos=init_protos)
        if self.upsampling > 1:
            out = upsample_bilinear_ac(out, scale=self.upsampling)
        return out, commit, usage, aloss


@register("vqreptunetangularv3")
class VQRePTUnetAngularv3(nn.Module):
    """Angular head v3 (pseudo-label self-training) as classifier
    (modified_vqunet/net.py:1062-1138); forward(x, pred, split, th)."""

    encoder_name: str
    num_classes: int
    vq_cfg: Any
    margin: float = 1.5
    scale: float = 1.0
    use_feature: bool = False
    encoder_weights: Optional[str] = None
    in_channels: int = 3
    decoder_channels: Optional[Tuple[int, ...]] = None
    depth: int = 5
    upsampling: int = 2
    pt_init: str = "kmeans"

    @nn.compact
    def __call__(self, x, pred=None, split: str = "labeled", th: float = 0.0,
                 train: bool = False, init_codebook: bool = False, init_protos: bool = False):
        core = VQUnetCore(self.encoder_name, FrozenDict(dict(self.vq_cfg)), self.in_channels,
                          self.decoder_channels, self.depth, padding_mode="reflect",
                          name="core")
        dec, commit, usage, dec_ch, _feats = core(x, train, init_codebook)
        # head at decoder resolution; the x2 upsample applies to the OUTPUT
        # only (reference modified_vqunet/net.py:1093-1094, 1121)
        head = AngularSegmentationHeadv3(
            num_classes=self.num_classes, out_channels=dec_ch[-1], pt_init=self.pt_init,
            scale=self.scale, margin=self.margin, upsampling=1,
            name="segmentation_head")
        out, aloss = head(dec, pred, split, th, train=train, init_protos=init_protos)
        if self.upsampling > 1:
            out = upsample_bilinear_ac(out, scale=self.upsampling)
        return out, commit, usage, aloss
