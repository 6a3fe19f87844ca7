"""ResNet / ResNeXt encoders in Flax (NHWC), staged for U-Nets.

TPU-first re-design of reference ``models/encoders/resnet.py``:
  * NHWC layout, convs lowered straight onto the MXU;
  * reflect/replicate padding is an explicit pad fused by XLA
    (reference rewrites torch conv padding_mode, resnet.py:130-148);
  * output_stride 8/16 support replaces stage strides with dilation for every
    conv of the stage (reference replace_strides_with_dilation,
    resnet.py:104-115 + make_dilated :191-215);
  * module names mirror the torchvision state-dict layout (conv1, bn1,
    layer1..4, blocks "0".."N", downsample) so pretrained torch weights map
    1:1 through utils/torch_weights.convert_resnet.

Stage contract (reference resnet.py:150-181): forward returns depth+1
feature maps [x, stem, maxpool+layer1, layer2, layer3, layer4][: depth+1]
with channel tuples from ``resnet_encoders`` (resnet.py:12-102).
"""
from __future__ import annotations

from typing import Any, List, Optional, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

from vq_seg_tpu.models.layers import ConvPad, kaiming_normal, max_pool_same
from vq_seg_tpu.models.modules.attention import CCA, Identity

resnet_encoders = {
    "resnet18": dict(out_channels=(3, 64, 64, 128, 256, 512), block="basic", layers=(2, 2, 2, 2)),
    "resnet34": dict(out_channels=(3, 64, 64, 128, 256, 512), block="basic", layers=(3, 4, 6, 3)),
    "resnet50": dict(out_channels=(3, 64, 256, 512, 1024, 2048), block="bottleneck", layers=(3, 4, 6, 3)),
    "resnet101": dict(out_channels=(3, 64, 256, 512, 1024, 2048), block="bottleneck", layers=(3, 4, 23, 3)),
    "resnet152": dict(out_channels=(3, 64, 256, 512, 1024, 2048), block="bottleneck", layers=(3, 8, 36, 3)),
    "resnext50_32x4d": dict(out_channels=(3, 64, 256, 512, 1024, 2048), block="bottleneck",
                            layers=(3, 4, 6, 3), groups=32, width_per_group=4),
    "resnext101_32x4d": dict(out_channels=(3, 64, 256, 512, 1024, 2048), block="bottleneck",
                             layers=(3, 4, 23, 3), groups=32, width_per_group=4),
    "resnext101_32x8d": dict(out_channels=(3, 64, 256, 512, 1024, 2048), block="bottleneck",
                             layers=(3, 4, 23, 3), groups=32, width_per_group=8),
    "resnext101_32x16d": dict(out_channels=(3, 64, 256, 512, 1024, 2048), block="bottleneck",
                              layers=(3, 4, 23, 3), groups=32, width_per_group=16),
    "resnext101_32x32d": dict(out_channels=(3, 64, 256, 512, 1024, 2048), block="bottleneck",
                              layers=(3, 4, 23, 3), groups=32, width_per_group=32),
    "resnext101_32x48d": dict(out_channels=(3, 64, 256, 512, 1024, 2048), block="bottleneck",
                              layers=(3, 4, 23, 3), groups=32, width_per_group=48),
}


def _bn(name: str, train: bool):
    from vq_seg_tpu.models.layers import current_compute_dtype

    return nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5,
                        dtype=current_compute_dtype(), name=name)


class BasicBlock(nn.Module):
    planes: int
    stride: int = 1
    dilation: int = 1
    padding_mode: str = "zeros"

    @nn.compact
    def __call__(self, x, train: bool):
        identity = x
        pad = self.dilation  # (k//2)*rate for k=3
        out = ConvPad(self.planes, 3, self.stride, pad, self.dilation, use_bias=False,
                      padding_mode=self.padding_mode, kernel_init=kaiming_normal, name="conv1")(x)
        out = _bn("bn1", train)(out)
        out = nn.relu(out)
        out = ConvPad(self.planes, 3, 1, pad, self.dilation, use_bias=False,
                      padding_mode=self.padding_mode, kernel_init=kaiming_normal, name="conv2")(out)
        out = _bn("bn2", train)(out)
        if self.stride != 1 or x.shape[-1] != self.planes:
            identity = ConvPad(self.planes, 1, self.stride, 0, use_bias=False,
                               kernel_init=kaiming_normal, name="downsample_0")(x)
            identity = _bn("downsample_1", train)(identity)
        return nn.relu(out + identity)


class Bottleneck(nn.Module):
    planes: int
    stride: int = 1
    dilation: int = 1
    groups: int = 1
    base_width: int = 64
    padding_mode: str = "zeros"

    @nn.compact
    def __call__(self, x, train: bool):
        width = int(self.planes * (self.base_width / 64.0)) * self.groups
        out_ch = self.planes * 4
        identity = x
        out = ConvPad(width, 1, 1, 0, use_bias=False, kernel_init=kaiming_normal, name="conv1")(x)
        out = _bn("bn1", train)(out)
        out = nn.relu(out)
        out = ConvPad(width, 3, self.stride, self.dilation, self.dilation, self.groups,
                      use_bias=False, padding_mode=self.padding_mode,
                      kernel_init=kaiming_normal, name="conv2")(out)
        out = _bn("bn2", train)(out)
        out = nn.relu(out)
        out = ConvPad(out_ch, 1, 1, 0, use_bias=False, kernel_init=kaiming_normal, name="conv3")(out)
        out = _bn("bn3", train)(out)
        if self.stride != 1 or x.shape[-1] != out_ch:
            identity = ConvPad(out_ch, 1, self.stride, 0, use_bias=False,
                               kernel_init=kaiming_normal, name="downsample_0")(x)
            identity = _bn("downsample_1", train)(identity)
        return nn.relu(out + identity)


class _Layer(nn.Module):
    """One resnet stage: N blocks, first may stride/downsample."""

    block: str
    planes: int
    num_blocks: int
    stride: int
    dilation: int = 1
    groups: int = 1
    base_width: int = 64
    padding_mode: str = "zeros"

    @nn.compact
    def __call__(self, x, train: bool):
        cls = BasicBlock if self.block == "basic" else Bottleneck
        for i in range(self.num_blocks):
            kw: dict = dict(planes=self.planes, stride=self.stride if i == 0 else 1,
                            dilation=self.dilation, padding_mode=self.padding_mode, name=str(i))
            if self.block == "bottleneck":
                kw.update(groups=self.groups, base_width=self.base_width)
            x = cls(**kw)(x, train)
        return x


def _stage_strides_dilations(output_stride: int) -> Tuple[Tuple[int, int], ...]:
    """(stride, dilation) per layer1..4, mirroring make_dilated
    (reference resnet.py:191-215)."""
    if output_stride == 32:
        return ((1, 1), (2, 1), (2, 1), (2, 1))
    if output_stride == 16:
        return ((1, 1), (2, 1), (2, 1), (1, 2))
    if output_stride == 8:
        return ((1, 1), (2, 1), (1, 2), (1, 4))
    raise ValueError(f"Output stride should be 32, 16 or 8, got {output_stride}.")


class ResNetEncoder(nn.Module):
    """Staged ResNet/ResNeXt encoder (reference resnet.py:117-215)."""

    out_channels: Sequence[int]
    block: str
    layers: Sequence[int]
    depth: int = 5
    in_channels: int = 3
    groups: int = 1
    width_per_group: int = 64
    padding_mode: str = "zeros"
    output_stride: int = 32
    # optional per-stage CCA attention (CCAResNetEncoder, resnet.py:217-295)
    cca: Optional[Sequence[bool]] = None
    # optional replacement for the conv1/bn1/relu stem (VQPatchUNet's
    # ConvMixer surgery, modified_vqunet/net.py:523-526); called as
    # custom_stem(x, train) and must produce out_channels[1] at stride 2.
    custom_stem: Optional[nn.Module] = None

    def encoder_channels(self):
        return tuple(self.out_channels[: self.depth + 1])

    @nn.compact
    def __call__(self, x, train: bool = False):
        sd = _stage_strides_dilations(self.output_stride)
        planes = (64, 128, 256, 512)
        cca = self.cca
        if cca is not None:
            assert len(cca) == self.depth, "the length of cca list must match depth"
            cca_ch = self.out_channels[1:]
            atts = [CCA(cca_ch[i], cca_ch[i], name=f"cca_{i}") if cca[i] else Identity()
                    for i in range(self.depth)]
        else:
            atts = [Identity() for _ in range(self.depth)]

        feats: List = [x]
        if self.depth >= 1:
            if self.custom_stem is not None:
                y = self.custom_stem(x, train)
            else:
                y = ConvPad(64, 7, 2, 3, use_bias=False, padding_mode=self.padding_mode,
                            kernel_init=kaiming_normal, name="conv1")(x)
                y = _bn("bn1", train)(y)
                y = nn.relu(y)
            y = atts[0](y, train)
            feats.append(y)
        for i in range(2, self.depth + 1):
            li = i - 2  # layer index 0..3
            if li == 0:
                y = max_pool_same(y, 3, 2, 1)
            y = _Layer(self.block, planes[li], self.layers[li], sd[li][0], sd[li][1],
                       self.groups, self.width_per_group, self.padding_mode,
                       name=f"layer{li + 1}")(y, train)
            y = atts[li + 1](y, train)
            feats.append(y)
        return feats


class CCAVQResNetEncoder(nn.Module):
    """ResNet encoder with per-stage CCA and in-encoder VQ codebooks
    (reference CCAVQResNetEncoder, resnet.py:297-395).

    Returns ``(features, commitment_loss, code_usage_vector)`` where
    features[0] is the raw input and features[1:] are post-VQ stage outputs.
    """

    out_channels: Sequence[int]
    block: str
    layers: Sequence[int]
    vq_cfg: Any
    depth: int = 5
    in_channels: int = 3
    groups: int = 1
    width_per_group: int = 64
    padding_mode: str = "zeros"
    cca: Sequence[bool] = (False, False, True, True, True)

    def encoder_channels(self):
        return tuple(self.out_channels[: self.depth + 1])

    @nn.compact
    def __call__(self, x, train: bool = False, init_codebook: bool = False):
        from vq_seg_tpu.models.modules.vector_quantizer import make_vq_module

        backbone = ResNetEncoder(
            self.out_channels, self.block, self.layers, self.depth, self.in_channels,
            self.groups, self.width_per_group, self.padding_mode, cca=self.cca,
            name="backbone",
        )
        feats = backbone(x, train)
        codebooks = make_vq_module(dict(self.vq_cfg), list(self.out_channels), self.depth)
        out: List = [feats[0]]
        loss = jnp.float32(0.0)
        usages: List = []
        for i, vq in enumerate(codebooks):
            q, _, commit, usage = vq(feats[i + 1], train=train, init_codebook=init_codebook)
            out.append(q)
            if commit is not None:
                loss = loss + commit
            if usage is not None:
                usages.append(usage)
        loss = loss / self.depth
        usage_vec = jnp.stack(usages) if usages else jnp.zeros((0,), jnp.float32)
        return out, loss, usage_vec
