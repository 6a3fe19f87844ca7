"""Torch transcription of the reference flagship — VQRePTUnet1x1v2 + the
CPS step semantics — used ONLY by the composed parity gate
(tools/parity_run.py).

The reference itself (/root/reference) cannot run in this image: its
encoders subclass torchvision's ResNet (models/encoders/resnet.py:117) and
torchvision is not installed.  This module re-states the reference's
documented math in torch from the following sources (not a code copy):

  * ResNet-18/50 trunk:       torchvision architecture, staged forward per
                              reference resnet.py:150-181 (6 stages, no fc)
  * VectorQuantizer:          vq_img.py:160-177 (cdist/argmin/gather),
                              :236-240 (STE + commitment), /depth at
                              modified_vqunet/net.py:237
  * UnetDecoder:              unet/decoder.py:14-39 (interp-to-skip concat
                              double conv), channel plan unet/net.py:823-825
  * 1x1 bias-free head + x2:  modified_vqunet/net.py:212,215,243
  * ReliablePrototypeLossv2:  prototype.py:810-874 (multiplicative margin,
                              eps placement, confidence mask)
  * dice / CE:                loss/dice_loss.py:5-58, nn.CrossEntropyLoss
  * CPS step:                 train_vqreptunet1x1v2.py:129-202

``load_from_flax`` maps a vq_seg_tpu flagship variable tree onto this model
so both frameworks start from IDENTICAL weights (incl. k-means-initialised
codebooks and prototypes) — the composed-training-dynamics gate then checks
that loss trajectories and final mIoU agree.
"""
from __future__ import annotations

import math

import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as F


# --------------------------------------------------------------------------
# encoder
# --------------------------------------------------------------------------
class BasicBlock(nn.Module):
    def __init__(self, inplanes, planes, stride=1, padding_mode="zeros"):
        super().__init__()
        self.conv1 = nn.Conv2d(inplanes, planes, 3, stride, 1, bias=False,
                               padding_mode=padding_mode)
        self.bn1 = nn.BatchNorm2d(planes)
        self.conv2 = nn.Conv2d(planes, planes, 3, 1, 1, bias=False,
                               padding_mode=padding_mode)
        self.bn2 = nn.BatchNorm2d(planes)
        self.downsample = None
        if stride != 1 or inplanes != planes:
            self.downsample = nn.Sequential(
                nn.Conv2d(inplanes, planes, 1, stride, bias=False),
                nn.BatchNorm2d(planes))

    def forward(self, x):
        identity = x if self.downsample is None else self.downsample(x)
        out = torch.relu(self.bn1(self.conv1(x)))
        out = self.bn2(self.conv2(out))
        return torch.relu(out + identity)


class Bottleneck(nn.Module):
    expansion = 4

    def __init__(self, inplanes, planes, stride=1, padding_mode="zeros"):
        super().__init__()
        out_ch = planes * 4
        self.conv1 = nn.Conv2d(inplanes, planes, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(planes)
        self.conv2 = nn.Conv2d(planes, planes, 3, stride, 1, bias=False,
                               padding_mode=padding_mode)
        self.bn2 = nn.BatchNorm2d(planes)
        self.conv3 = nn.Conv2d(planes, out_ch, 1, bias=False)
        self.bn3 = nn.BatchNorm2d(out_ch)
        self.downsample = None
        if stride != 1 or inplanes != out_ch:
            self.downsample = nn.Sequential(
                nn.Conv2d(inplanes, out_ch, 1, stride, bias=False),
                nn.BatchNorm2d(out_ch))

    def forward(self, x):
        identity = x if self.downsample is None else self.downsample(x)
        out = torch.relu(self.bn1(self.conv1(x)))
        out = torch.relu(self.bn2(self.conv2(out)))
        out = self.bn3(self.conv3(out))
        return torch.relu(out + identity)


_ENCODERS = {
    "resnet18": (BasicBlock, (2, 2, 2, 2), (3, 64, 64, 128, 256, 512)),
    "resnet50": (Bottleneck, (3, 4, 6, 3), (3, 64, 256, 512, 1024, 2048)),
}


class TorchResNetEncoder(nn.Module):
    """Staged forward per reference resnet.py:150-181."""

    def __init__(self, name="resnet18", padding_mode="zeros"):
        super().__init__()
        block, layers, self.out_channels = _ENCODERS[name]
        self.conv1 = nn.Conv2d(3, 64, 7, 2, 3, bias=False, padding_mode=padding_mode)
        self.bn1 = nn.BatchNorm2d(64)
        self.maxpool = nn.MaxPool2d(3, 2, 1)
        planes = (64, 128, 256, 512)
        inp = 64
        for li in range(4):
            blocks = []
            for b in range(layers[li]):
                stride = 2 if (li > 0 and b == 0) else 1
                blocks.append(block(inp, planes[li], stride, padding_mode))
                inp = planes[li] * getattr(block, "expansion", 1)
            setattr(self, f"layer{li + 1}", nn.Sequential(*blocks))

    def forward(self, x):
        outs = [x]
        y = torch.relu(self.bn1(self.conv1(x)))
        outs.append(y)
        y = self.maxpool(y)
        for li in range(4):
            y = getattr(self, f"layer{li + 1}")(y)
            outs.append(y)
        return outs


# --------------------------------------------------------------------------
# VQ (vq_img.py:160-177, 228-244)
# --------------------------------------------------------------------------
class TorchVQ(nn.Module):
    def __init__(self, dim, num_embeddings, commitment_weight=1.0):
        super().__init__()
        self.embedding = nn.Embedding(num_embeddings, dim)
        self.num_embeddings = num_embeddings
        self.commitment_weight = commitment_weight

    def forward(self, x):
        b, c, h, w = x.shape
        flat = x.float().permute(0, 2, 3, 1).reshape(-1, c)
        dist = torch.cdist(flat, self.embedding.weight, p=2)
        idx = torch.argmin(dist, dim=-1)
        quant = self.embedding.weight[idx]
        counts = torch.bincount(idx, minlength=self.num_embeddings)
        usage = 100.0 * (counts == 0).sum() / self.num_embeddings
        quant = quant.reshape(b, h, w, c).permute(0, 3, 1, 2)
        if self.training:
            quant = x + (quant - x).detach()
            loss = F.mse_loss(quant.detach(), x) * self.commitment_weight
        else:
            loss = torch.zeros((), dtype=x.dtype)
        return quant, loss, usage


# --------------------------------------------------------------------------
# decoder (unet/decoder.py:14-39)
# --------------------------------------------------------------------------
class TorchDoubleConv(nn.Module):
    def __init__(self, in_ch, out_ch):
        super().__init__()
        self.c1 = nn.Conv2d(in_ch, out_ch, 3, 1, 1, bias=False)
        self.b1 = nn.BatchNorm2d(out_ch)
        self.c2 = nn.Conv2d(out_ch, out_ch, 3, 1, 1, bias=False)
        self.b2 = nn.BatchNorm2d(out_ch)

    def forward(self, x):
        x = torch.relu(self.b1(self.c1(x)))
        return torch.relu(self.b2(self.c2(x)))


class TorchUnetDecoder(nn.Module):
    def __init__(self, enc_channels, dec_channels):
        super().__init__()
        skips = list(enc_channels[1:])[::-1]  # deep -> shallow
        blocks = []
        inp = skips[0]
        for i, out_ch in enumerate(dec_channels):
            in_ch = inp if i == 0 else inp + skips[i]
            blocks.append(TorchDoubleConv(in_ch, out_ch))
            inp = out_ch
        self.blocks = nn.ModuleList(blocks)

    def forward(self, feats):
        feats = feats[::-1]
        x = feats[0]
        for i, blk in enumerate(self.blocks):
            if i > 0:
                up = F.interpolate(x, feats[i].shape[2:], mode="bilinear",
                                   align_corners=False)
                x = torch.cat([up, feats[i]], dim=1)
            x = blk(x)
        return x


# --------------------------------------------------------------------------
# ReliablePrototypeLossv2 (prototype.py:810-874)
# --------------------------------------------------------------------------
class TorchReliableProtoV2(nn.Module):
    def __init__(self, num_classes, embedding_dim, margin=0.5, scale=30.0):
        super().__init__()
        self.embedding = nn.Embedding(num_classes, embedding_dim)
        self.margin = margin
        self.scale = scale
        self.cos_m, self.sin_m = math.cos(margin), math.sin(margin)

    def forward(self, x, gt, th):
        confidence_mask = None
        if gt.dim() == 4:
            pred = gt
            if pred.shape[-2:] != x.shape[-2:]:
                pred = F.interpolate(pred.float(), x.shape[-2:], mode="bilinear")
            flat_pred = pred.permute(0, 2, 3, 1).reshape(-1, pred.shape[1])
            prob = torch.softmax(flat_pred, dim=-1)
            confidence_mask = (prob.max(dim=1)[0] > th).to(pred.dtype)
            gt = torch.argmax(pred, dim=1)
        gt = gt.unsqueeze(1)
        if gt.shape[-2:] != x.shape[-2:]:
            gt = F.interpolate(gt.float(), x.shape[-2:], mode="nearest").long()
        flat_x = x.permute(0, 2, 3, 1).reshape(-1, x.shape[1])
        flat_gt = gt.permute(0, 2, 3, 1).reshape(-1)
        wn = F.normalize(self.embedding.weight, p=2, dim=-1)
        fx = F.normalize(flat_x, p=2, dim=-1)
        cosine = F.linear(fx, wn)
        sine = torch.sqrt((1.0 - cosine**2).clamp(0, 1))
        phi = cosine * self.cos_m - sine * self.sin_m
        phi = torch.where(cosine > 0, phi, cosine)  # easy margin
        ind = torch.arange(cosine.shape[0])
        # multiplicative margin at the gt logit (prototype.py:860)
        margined = cosine.clone()
        margined[ind, flat_gt] = cosine[ind, flat_gt] * phi[ind, flat_gt]
        margined = self.scale * margined
        positive = torch.exp(margined[ind, flat_gt])
        sum_all = torch.sum(torch.exp(margined), dim=-1)
        lg = torch.log(positive / (sum_all + 1e-7) + 1e-7)
        if confidence_mask is not None:
            lg = lg * confidence_mask
        return -torch.mean(lg)


# --------------------------------------------------------------------------
# the flagship net (modified_vqunet/net.py:184-260)
# --------------------------------------------------------------------------
class TorchVQRePTUnet1x1v2(nn.Module):
    def __init__(self, encoder_name="resnet18", num_classes=3,
                 num_embeddings=(0, 0, 4, 4, 4), margin=0.5, scale=30.0):
        super().__init__()
        self.encoder = TorchResNetEncoder(encoder_name, padding_mode="reflect")
        enc_ch = self.encoder.out_channels
        self.codebooks = nn.ModuleList([
            TorchVQ(enc_ch[i + 1], k) if k > 0 else None
            for i, k in enumerate(num_embeddings)
        ])
        dec_ch = tuple(c // 2 for c in enc_ch[1:])[::-1]
        self.decoder = TorchUnetDecoder(enc_ch, dec_ch)
        self.segmentation_head = nn.Conv2d(dec_ch[-1], num_classes, 1, bias=False)
        self.prototype_loss = TorchReliableProtoV2(num_classes, dec_ch[-1],
                                                   margin, scale)
        self.upsample = nn.UpsamplingBilinear2d(scale_factor=2)

    def forward(self, x, gt=None, th=None):
        feats = self.encoder(x)[1:]
        commit = torch.zeros(())
        usages = []
        feats = list(feats)
        for i, vq in enumerate(self.codebooks):
            if vq is None:
                continue
            q, c, u = vq(feats[i])
            feats[i] = q
            commit = commit + c
            usages.append(u)
        commit = commit / len(feats)
        dec = self.decoder(feats)
        out = self.segmentation_head(dec)
        proto = torch.zeros(())
        if self.training and gt is not None:
            proto = self.prototype_loss(dec, gt, th)
        out = self.upsample(out)
        return out, commit, torch.stack(usages) if usages else torch.zeros(0), proto


# --------------------------------------------------------------------------
# losses (loss/dice_loss.py:5-58; CE = nn.CrossEntropyLoss)
# --------------------------------------------------------------------------
def torch_dice_loss(pred, target, num_classes=3, ignore_index=255):
    n, c = pred.shape[0], pred.shape[1]
    pred = pred.reshape(n, c, -1).permute(0, 2, 1).float()
    target = target.reshape(n, -1)
    mask = target != ignore_index
    pred = pred * mask.unsqueeze(-1)
    target = target * mask
    prd = torch.softmax(pred, dim=-1)
    tgt = F.one_hot(target.long(), num_classes).to(prd.dtype)
    inter = (prd * tgt).sum(dim=1)
    sums = (prd + tgt).sum(dim=1)
    dice = (2 * inter / (sums + 1e-6)).mean(dim=0)
    return 1.0 - dice.mean()


def torch_score_mask(pred, pseudo, th):
    pmax = torch.softmax(pred, dim=1).max(dim=1)[0]
    return torch.where(pmax > th, pseudo, torch.full_like(pseudo, 255))


# --------------------------------------------------------------------------
# flax -> torch weight sync
# --------------------------------------------------------------------------
def _t(a):
    return torch.tensor(np.asarray(a))


def _load_conv(conv: nn.Conv2d, kernel, bias=None):
    conv.weight.data.copy_(_t(kernel).permute(3, 2, 0, 1))
    if bias is not None:
        conv.bias.data.copy_(_t(bias))


def _load_bn(bn: nn.BatchNorm2d, p, s):
    bn.weight.data.copy_(_t(p["scale"]))
    bn.bias.data.copy_(_t(p["bias"]))
    bn.running_mean.data.copy_(_t(s["mean"]))
    bn.running_var.data.copy_(_t(s["var"]))


def load_from_flax(model: TorchVQRePTUnet1x1v2, variables):
    """Copy a vq_seg_tpu flagship variable tree into the torch model."""
    p = variables["params"]["core"]["encoder"]
    s = variables["batch_stats"]["core"]["encoder"]
    enc = model.encoder
    _load_conv(enc.conv1, p["conv1"]["Conv_0"]["kernel"])
    _load_bn(enc.bn1, p["bn1"], s["bn1"])
    for li in range(1, 5):
        lname = f"layer{li}"
        for bi, blk in enumerate(getattr(enc, lname)):
            bp, bs = p[lname][str(bi)], s[lname][str(bi)]
            convs = ["conv1", "conv2"] + (["conv3"] if hasattr(blk, "conv3") else [])
            for cn in convs:
                _load_conv(getattr(blk, cn), bp[cn]["Conv_0"]["kernel"])
                _load_bn(getattr(blk, cn.replace("conv", "bn")),
                         bp[cn.replace("conv", "bn")], bs[cn.replace("conv", "bn")])
            if blk.downsample is not None:
                _load_conv(blk.downsample[0], bp["downsample_0"]["Conv_0"]["kernel"])
                _load_bn(blk.downsample[1], bp["downsample_1"], bs["downsample_1"])

    dp = variables["params"]["core"]["decoder"]
    ds = variables["batch_stats"]["core"]["decoder"]
    for i, blk in enumerate(model.decoder.blocks):
        bp, bs = dp[f"block{i}"], ds[f"block{i}"]
        for j, (cv, bn) in enumerate(((blk.c1, blk.b1), (blk.c2, blk.b2))):
            cb = bp[f"ConvBNReLU_{j}"]
            _load_conv(cv, cb["ConvPad_0"]["Conv_0"]["kernel"])
            _load_bn(bn, cb["BatchNorm_0"]["BatchNorm_0"],
                     bs[f"ConvBNReLU_{j}"]["BatchNorm_0"]["BatchNorm_0"])

    _load_conv(model.segmentation_head,
               variables["params"]["segmentation_head"]["Conv_0"]["kernel"])
    model.prototype_loss.embedding.weight.data.copy_(
        _t(variables["params"]["prototype_loss"]["embedding"]))
    cbs = variables.get("codebook", {}).get("core", {})
    live = [vq for vq in model.codebooks if vq is not None]
    for i, vq in enumerate(live):
        vq.embedding.weight.data.copy_(_t(cbs[f"VectorQuantizer_{i}"]["embedding"]))
    return model
