"""The VQ-UNet network family.

The reference implements ~20 near-identical networks
(models/networks/unet/net.py, modified_vqunet/net.py) that all share one
forward skeleton: encoder stages[1:] -> per-stage VQ (accumulating
commitment loss + code usage) -> UnetDecoder -> head (+ optional prototype
loss) -> x2 align-corners upsample.  Here that skeleton is ONE module
(``VQUnetCore``) and each registry entry is a thin head/loss configuration —
the TPU-first consolidation called for by SURVEY.md §7 step 5.

Return contract matches the reference per class:
  * plain VQ nets      -> (output, commitment_loss, code_usage)
  * prototype nets     -> (output, commitment_loss, code_usage, prototype_loss)
``code_usage`` is a vector of per-VQ-stage percentages **on device** (the
reference `.detach().cpu()`s each one per forward — a per-step sync we do
not reproduce; hosts fetch it once per logging step).

All modules take ``train`` (BN mode + loss computation) and the explicit
``init_codebook``/``init_protos`` one-time init phase described in
modules/vector_quantizer.py and modules/prototype.py.
"""
from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
from flax.core import FrozenDict

from vq_seg_tpu.models.encoders import make_encoder
from vq_seg_tpu.models.layers import (
    ConvBNReLU,
    ConvPad,
    torch_conv_default,
    upsample_bilinear_ac,
)
from vq_seg_tpu.models.modules.attention import CCA, DRSAM, DualAttention, IMDB
from vq_seg_tpu.models.modules.decoder import UnetDecoder
from vq_seg_tpu.models.modules.heads import SegmentationHead
from vq_seg_tpu.models.modules.prototype import (
    EuclideanPrototypeLoss,
    LearnableEuclideanPrototypeLoss,
    NEDPrototypeLoss,
    OnlyCWPrototypeLoss,
    PrototypeLoss,
    ReliableEuclideanPrototypeLoss,
    ReliablePrototypeLoss,
    ReliablePrototypeLossv2,
    StableTemperaturedPrototypeLoss,
)
from vq_seg_tpu.models.modules.vector_quantizer import make_vq_module
from vq_seg_tpu.models.networks import register


def _decoder_channels(encoder_channels, decoder_channels):
    """Default plan: halved encoder channels, reversed (unet/net.py:823-825)."""
    if decoder_channels is not None:
        return tuple(decoder_channels)
    return tuple(i // 2 for i in encoder_channels[1:])[::-1]


def self_entropy(logits):
    """Per-pixel predictive entropy from own logits, detached
    (modified_vqunet/net.py:1199-1203)."""
    prob = jax.nn.softmax(jax.lax.stop_gradient(logits), axis=-1)
    return -jnp.sum(prob * jnp.log(prob + 1e-10), axis=-1).reshape(-1)


class ConvMixer(nn.Module):
    """Patch-embed + depthwise-residual mixer stem
    (reference models/modules/conv_mixer.py:3-35)."""

    dim: int
    depth: int = 3
    kernel_size: int = 9
    patch_size: int = 2

    @nn.compact
    def __call__(self, x, train: bool):
        x = ConvPad(self.dim, self.patch_size, self.patch_size, 0, use_bias=True,
                    kernel_init=torch_conv_default)(x)
        x = nn.relu(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5)(x)
        for _ in range(self.depth):
            h = ConvPad(self.dim, self.kernel_size, 1, self.kernel_size // 2,
                        groups=self.dim, use_bias=True, kernel_init=torch_conv_default)(x)
            h = nn.relu(h)
            h = nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5)(h)
            x = x + h
            x = ConvPad(self.dim, 1, use_bias=True, kernel_init=torch_conv_default)(x)
            x = nn.relu(x)
            x = nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5)(x)
        return x


class VQUnetCore(nn.Module):
    """Shared encoder -> [attention] -> VQ -> decoder trunk."""

    encoder_name: str
    vq_cfg: Any = None  # FrozenDict / dict-of-items / None (no VQ)
    in_channels: int = 3
    decoder_channels: Optional[Tuple[int, ...]] = None
    depth: int = 5
    padding_mode: str = "zeros"
    deepest_only: bool = False        # VQ at deepest stage only (vqunet_v1)
    pre_vq: Optional[str] = None      # dual_all | cca_deepest | imdb_deepest | drsam_identity
    decoder_cca: Optional[Tuple[bool, ...]] = None  # vqcanetv3
    stem: str = "default"             # "convmixer" (vqpatchunet)
    mixer_depth: int = 3
    subpixel_tail: bool = False       # tuned-profile decoder tail (decoder.py)

    @nn.compact
    def __call__(self, x, train: bool = False, init_codebook: bool = False):
        stem = None
        if self.stem == "convmixer":
            # VQPatchUNet (modified_vqunet/net.py:505-563): the resnet stem
            # conv/bn/relu is replaced by a ConvMixer patch-embed.
            stem = ConvMixer(64, self.mixer_depth, name="mixer_stem")
        encoder, enc_ch = make_encoder(self.encoder_name, self.in_channels, self.depth,
                                       padding_mode=self.padding_mode, custom_stem=stem, module_name="encoder")
        feats_full = encoder(x, train)
        features = list(feats_full[1:])

        vq_list = None
        if self.vq_cfg is not None:
            cfg = dict(self.vq_cfg)
            if self.deepest_only:
                vq_list = [None] * (self.depth - 1) + [
                    make_vq_module({**cfg, "num_embeddings": cfg["num_embeddings"]},
                                   [0, enc_ch[-1]], 1)[0]
                ]
            else:
                vq_list = make_vq_module(cfg, list(enc_ch), self.depth)

        # pre-VQ attention hooks
        if self.pre_vq == "dual_all":
            features = [DualAttention(features[i].shape[-1], name=f"att_{i}")(features[i], train)
                        for i in range(len(features))]
        elif self.pre_vq == "cca_deepest":
            features[-1] = CCA(features[-1].shape[-1], features[-1].shape[-1],
                               name="cca")(features[-1], train)
        elif self.pre_vq == "imdb_deepest":
            features[-1] = IMDB(features[-1].shape[-1], name="imdb")(features[-1], train)
        elif self.pre_vq == "drsam_identity" and vq_list is not None:
            # DRSAVQUnet (modified_vqunet/net.py:907-981): DRSAM on the
            # stages whose VQ slot is pass-through (num_embeddings == 0).
            ne = list(dict(self.vq_cfg)["num_embeddings"])
            for i, k in enumerate(ne):
                if k == 0:
                    features[i] = DRSAM(features[i].shape[-1], name=f"drsam_{i}")(features[i], train)

        commit = jnp.float32(0.0)
        usages = []
        if vq_list is not None:
            for i, vq in enumerate(vq_list):
                if vq is None:
                    continue
                q, _idx, c_loss, usage = vq(features[i], train=train, init_codebook=init_codebook)
                features[i] = q
                if c_loss is not None:
                    commit = commit + c_loss
                if usage is not None:
                    usages.append(usage)
            commit = commit / len(features)

        dec_ch = _decoder_channels(enc_ch, self.decoder_channels)
        decoder_out = UnetDecoder(dec_ch, cca=self.decoder_cca,
                                  subpixel_tail=self.subpixel_tail,
                                  name="decoder")(features, train)
        usage_vec = jnp.stack(usages) if usages else jnp.zeros((0,), jnp.float32)
        return decoder_out, commit, usage_vec, dec_ch, features


class _VQHead(nn.Module):
    """Conv head + upsample used by most variants."""

    num_classes: int
    kernel_size: int = 3
    upsampling: int = 2
    use_bias: bool = True
    softmax: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        y = ConvPad(self.num_classes, self.kernel_size, 1, self.kernel_size // 2,
                    use_bias=self.use_bias, kernel_init=torch_conv_default,
                    name="conv")(x)
        if self.upsampling > 1:
            y = upsample_bilinear_ac(y, scale=self.upsampling)
        if self.softmax:
            y = jax.nn.softmax(y, axis=-1)
        return y


# --------------------------------------------------------------------------
# Registry networks
# --------------------------------------------------------------------------


@register("vqunet_v1")
class VQUnet_v1(nn.Module):
    """VQ at the deepest stage only (unet/net.py:16-66)."""

    encoder_name: str
    num_classes: int
    vq_cfg: Any
    encoder_weights: Optional[str] = None
    in_channels: int = 3
    decoder_channels: Optional[Tuple[int, ...]] = None
    depth: int = 5
    upsampling: int = 2

    @nn.compact
    def __call__(self, x, train: bool = False, init_codebook: bool = False):
        cfg = dict(self.vq_cfg)
        k = cfg["num_embeddings"]
        if isinstance(k, (list, tuple)):
            cfg["num_embeddings"] = [0] * (self.depth - 1) + [k[-1]]
        else:
            cfg["num_embeddings"] = [0] * (self.depth - 1) + [k]
        core = VQUnetCore(self.encoder_name, FrozenDict(cfg), self.in_channels,
                          self.decoder_channels, self.depth, name="core")
        dec, commit, usage, dec_ch, _feats = core(x, train, init_codebook)
        out = _VQHead(self.num_classes, 3, self.upsampling, name="segmentation_head")(dec, train)
        return out, commit, usage


@register("vqunet_v2")
class VQUnet_v2(nn.Module):
    """Per-stage VQ list — the CPS workhorse (unet/net.py:69-146).
    Softmax2d head activation per the reference default."""

    encoder_name: str
    num_classes: int
    vq_cfg: Any
    encoder_weights: Optional[str] = None
    in_channels: int = 3
    decoder_channels: Optional[Tuple[int, ...]] = None
    depth: int = 5
    upsampling: int = 2
    softmax_head: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False, init_codebook: bool = False):
        core = VQUnetCore(self.encoder_name, FrozenDict(dict(self.vq_cfg)), self.in_channels,
                          self.decoder_channels, self.depth, name="core")
        dec, commit, usage, dec_ch, _feats = core(x, train, init_codebook)
        out = _VQHead(self.num_classes, 3, self.upsampling, softmax=self.softmax_head,
                      name="segmentation_head")(dec, train)
        return out, commit, usage


class _PTNet(nn.Module):
    """Shared skeleton for prototype-loss U-Nets (reflect-padded encoder,
    unet/net.py:166, modified_vqunet/net.py:203)."""

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
    # subclass knobs
    head_kernel: int = 3
    head_bias: bool = True
    head_softmax: bool = False
    head_layers: int = 1
    proto_kind: str = "prototype"
    t: float = 0.1  # vqretemptunet temperature (reference config "t")
    subpixel_tail: bool = False  # tuned-profile decoder tail (decoder.py)

    def _proto(self, dec_ch):
        kw = dict(num_classes=self.num_classes, embedding_dim=dec_ch[-1],
                  pt_init=self.pt_init, use_feature=self.use_feature, name="prototype_loss")
        if self.proto_kind == "prototype":
            return PrototypeLoss(margin=self.margin, scale=self.scale, **kw)
        if self.proto_kind == "reliable":
            return ReliablePrototypeLoss(margin=self.margin, scale=self.scale, **kw)
        if self.proto_kind == "reliable_v2":
            return ReliablePrototypeLossv2(margin=self.margin, scale=self.scale, **kw)
        if self.proto_kind == "stable_temperatured":
            return StableTemperaturedPrototypeLoss(t=self.t, **kw)
        if self.proto_kind == "reliable_euclidean":
            return ReliableEuclideanPrototypeLoss(**{k: v for k, v in kw.items() if k != "init"},
                                                  pt_init=self.pt_init)
        if self.proto_kind == "ned":
            return NEDPrototypeLoss(**kw)
        if self.proto_kind == "only_cw":
            return OnlyCWPrototypeLoss(margin=self.margin, scale=self.scale, **kw)
        raise ValueError(self.proto_kind)

    def _head(self, dec, dec_ch, train):
        y = dec
        if self.head_layers == 2:
            # VQRePTUnetDouble1x1 (modified_vqunet/net.py:116-183)
            y = ConvPad(dec_ch[-1], 1, use_bias=False, name="segmentation_head_0")(y)
            y = ConvPad(self.num_classes, 1, use_bias=False, name="segmentation_head_1")(y)
        else:
            y = ConvPad(self.num_classes, self.head_kernel, 1, self.head_kernel // 2,
                        use_bias=self.head_bias, kernel_init=torch_conv_default,
                        name="segmentation_head")(y)
        return y

    def _trunk(self, x, train, init_codebook):
        core = VQUnetCore(self.encoder_name, FrozenDict(dict(self.vq_cfg)), self.in_channels,
                          self.decoder_channels, self.depth, padding_mode="reflect",
                          subpixel_tail=self.subpixel_tail, name="core")
        return core(x, train, init_codebook)


@register("vqreptunet1x1v2")
class VQRePTUnet1x1v2(_PTNet):
    """FLAGSHIP (modified_vqunet/net.py:184-260): bias-free 1x1 head +
    confidence-masked ReliablePrototypeLossv2; forward(x, gt, th)."""

    head_kernel: int = 1
    head_bias: bool = False
    proto_kind: str = "reliable_v2"

    @nn.compact
    def __call__(self, x, gt=None, th=None, train: bool = False,
                 init_codebook: bool = False, init_protos: bool = False,
                 return_features: bool = False):
        dec, commit, usage, dec_ch, _feats = self._trunk(x, train, init_codebook)
        out = self._head(dec, dec_ch, train)
        proto = jnp.float32(0.0)
        if train and gt is not None and not return_features:
            proto = self._proto(dec_ch)(dec, gt, th, train=train, init_protos=init_protos)
        if self.upsampling > 1:
            out = upsample_bilinear_ac(out, scale=self.upsampling)
        if return_features:
            # trunk-only mode for the fused-pass CPS step (training/cps.py):
            # the prototype loss is applied OUTSIDE on these decoder features
            # (its (x, gt-or-score) arity prevents stacking sup+unsup inside)
            return out, commit, usage, dec
        return out, commit, usage, proto


@register("vqreptunet1x1")
class VQRePTUnet1x1(_PTNet):
    """modified_vqunet/net.py:1141-1222 (the winning second definition):
    1x1 bias-free head, ReliablePrototypeLoss with self-entropy filtering;
    forward(x, gt, percent)."""

    head_kernel: int = 1
    head_bias: bool = False
    proto_kind: str = "reliable"

    @nn.compact
    def __call__(self, x, gt=None, percent=None, train: bool = False,
                 init_codebook: bool = False, init_protos: bool = False):
        dec, commit, usage, dec_ch, _feats = self._trunk(x, train, init_codebook)
        out = self._head(dec, dec_ch, train)
        proto = jnp.float32(0.0)
        if train and gt is not None:
            entropy = self_entropy(out)
            proto = self._proto(dec_ch)(dec, gt, percent, entropy, train=train,
                                        init_protos=init_protos)
        if self.upsampling > 1:
            out = upsample_bilinear_ac(out, scale=self.upsampling)
        return out, commit, usage, proto


@register("vqreptunetdouble1x1")
class VQRePTUnetDouble1x1(VQRePTUnet1x1):
    """Two-layer 1x1 head variant (modified_vqunet/net.py:116-183)."""

    head_layers: int = 2


@register("vqreptunet")
class VQRePTUnet(VQRePTUnet1x1):
    """3x3-head variant (modified_vqunet/net.py:423-504)."""

    head_kernel: int = 3
    head_bias: bool = True


@register("vqretemptunet")
class VQReTemPTUnet(VQRePTUnet1x1):
    """StableTemperaturedPrototypeLoss variant (modified_vqunet/net.py:262-341)."""

    head_kernel: int = 1
    head_bias: bool = False
    proto_kind: str = "stable_temperatured"


@register("vqreeuptunet")
class VQReEuPTUnet(VQRePTUnet1x1):
    """ReliableEuclideanPrototypeLoss variant (modified_vqunet/net.py:342-421)."""

    head_kernel: int = 1
    head_bias: bool = False
    proto_kind: str = "reliable_euclidean"


@register("vqonlyptunet1x1")
class VQOnlyPTUnet1x1(VQRePTUnet1x1):
    """Crop/weed-only prototype loss (modified_vqunet/net.py:1225-1306)."""

    proto_kind: str = "only_cw"


@register("vqptunet")
class VQPTUnet(_PTNet):
    """PrototypeLoss + softmax 3x3 head (unet/net.py:148-237);
    forward(x, gt)."""

    proto_kind: str = "prototype"
    head_softmax: bool = False  # reference default activation=nn.Identity

    @nn.compact
    def __call__(self, x, gt=None, train: bool = False,
                 init_codebook: bool = False, init_protos: bool = False):
        dec, commit, usage, dec_ch, _feats = self._trunk(x, train, init_codebook)
        proto = jnp.float32(0.0)
        if train and gt is not None:
            proto = self._proto(dec_ch)(dec, gt, train=train, init_protos=init_protos)
        out = self._head(dec, dec_ch, train)
        if self.head_softmax:
            out = jax.nn.softmax(out, axis=-1)
        if self.upsampling > 1:
            out = upsample_bilinear_ac(out, scale=self.upsampling)
        return out, commit, usage, proto


@register("vqeuptunet")
class VQEuPTUnet(_PTNet):
    """Euclidean / learnable-alpha prototype (unet/net.py:240-320);
    softmax head per reference default."""

    learnable_alpha: bool = True
    head_softmax: bool = True

    @nn.compact
    def __call__(self, x, gt=None, train: bool = False,
                 init_codebook: bool = False, init_protos: bool = False):
        dec, commit, usage, dec_ch, _feats = self._trunk(x, train, init_codebook)
        proto = jnp.float32(0.0)
        if train and gt is not None:
            cls = LearnableEuclideanPrototypeLoss if self.learnable_alpha else EuclideanPrototypeLoss
            proto = cls(num_classes=self.num_classes, embedding_dim=dec_ch[-1],
                        use_feature=self.use_feature, name="prototype_loss")(
                            dec, gt, train=train, init_protos=init_protos)
        out = self._head(dec, dec_ch, train)
        if self.head_softmax:
            out = jax.nn.softmax(out, axis=-1)
        if self.upsampling > 1:
            out = upsample_bilinear_ac(out, scale=self.upsampling)
        return out, commit, usage, proto


@register("vqnedptunet")
class VQNEDPTUnet(VQPTUnet):
    """NED prototype loss (unet/net.py:644-724)."""

    proto_kind: str = "ned"


@register("vqatunet")
class VQATUnet(nn.Module):
    """Per-stage DualAttention before VQ (unet/net.py:564-642)."""

    encoder_name: str
    num_classes: int
    vq_cfg: Any
    encoder_weights: Optional[str] = None
    in_channels: int = 3
    decoder_channels: Optional[Tuple[int, ...]] = None
    depth: int = 5
    upsampling: int = 2

    @nn.compact
    def __call__(self, x, train: bool = False, init_codebook: bool = False):
        core = VQUnetCore(self.encoder_name, FrozenDict(dict(self.vq_cfg)), self.in_channels,
                          self.decoder_channels, self.depth, pre_vq="dual_all", name="core")
        dec, commit, usage, dec_ch, _feats = core(x, train, init_codebook)
        out = _VQHead(self.num_classes, 3, self.upsampling, name="segmentation_head")(dec, train)
        return out, commit, usage


@register("vqcanet")
class VQCANet(VQATUnet):
    """CCA at the bottleneck before VQ (modified_vqunet/net.py:836-905)."""

    @nn.compact
    def __call__(self, x, train: bool = False, init_codebook: bool = False):
        core = VQUnetCore(self.encoder_name, FrozenDict(dict(self.vq_cfg)), self.in_channels,
                          self.decoder_channels, self.depth, pre_vq="cca_deepest", name="core")
        dec, commit, usage, dec_ch, _feats = core(x, train, init_codebook)
        out = _VQHead(self.num_classes, 3, self.upsampling, name="segmentation_head")(dec, train)
        return out, commit, usage


@register("vqcanetv2")
class VQCANetv2(nn.Module):
    """cca-resnet encoder variant (modified_vqunet/net.py:760-835):
    per-stage CCA inside the encoder."""

    encoder_name: str
    num_classes: int
    vq_cfg: Any
    encoder_weights: Optional[str] = None
    in_channels: int = 3
    decoder_channels: Optional[Tuple[int, ...]] = None
    depth: int = 5
    upsampling: int = 2
    cca: Tuple[bool, ...] = (False, False, False, True, True)

    @nn.compact
    def __call__(self, x, train: bool = False, init_codebook: bool = False):
        name = self.encoder_name if "cca" in self.encoder_name else "cca" + self.encoder_name
        encoder, enc_ch = make_encoder(name, self.in_channels, self.depth, cca=tuple(self.cca),
                                       module_name="encoder")
        features = list(encoder(x, train)[1:])
        vq_list = make_vq_module(dict(self.vq_cfg), list(enc_ch), self.depth)
        commit = jnp.float32(0.0)
        usages = []
        for i, vq in enumerate(vq_list):
            q, _idx, c, u = vq(features[i], train=train, init_codebook=init_codebook)
            features[i] = q
            if c is not None:
                commit = commit + c
            if u is not None:
                usages.append(u)
        commit = commit / len(features)
        dec_ch = _decoder_channels(enc_ch, self.decoder_channels)
        dec = UnetDecoder(dec_ch, name="decoder")(features, train)
        out = _VQHead(self.num_classes, 3, self.upsampling, name="segmentation_head")(dec, train)
        usage_vec = jnp.stack(usages) if usages else jnp.zeros((0,), jnp.float32)
        return out, commit, usage_vec


@register("vqcanetv3")
class VQCANetv3(nn.Module):
    """CCAUnetDecoder variant (modified_vqunet/net.py:688-759)."""

    encoder_name: str
    num_classes: int
    vq_cfg: Any
    encoder_weights: Optional[str] = None
    in_channels: int = 3
    decoder_channels: Optional[Tuple[int, ...]] = None
    depth: int = 5
    upsampling: int = 2
    cca: Tuple[bool, ...] = (True, True, False, False, False)

    @nn.compact
    def __call__(self, x, train: bool = False, init_codebook: bool = False):
        core = VQUnetCore(self.encoder_name, FrozenDict(dict(self.vq_cfg)), self.in_channels,
                          self.decoder_channels, self.depth, decoder_cca=tuple(self.cca),
                          name="core")
        dec, commit, usage, dec_ch, _feats = core(x, train, init_codebook)
        out = _VQHead(self.num_classes, 3, self.upsampling, name="segmentation_head")(dec, train)
        return out, commit, usage


@register("vqcanetv4")
class VQCANetv4(nn.Module):
    """In-encoder CCA + VQ (modified_vqunet/net.py:623-685): the ccavq
    encoder quantizes its own stage outputs."""

    encoder_name: str
    num_classes: int
    vq_cfg: Any
    encoder_weights: Optional[str] = None
    in_channels: int = 3
    decoder_channels: Optional[Tuple[int, ...]] = None
    depth: int = 5
    upsampling: int = 2
    cca: Tuple[bool, ...] = (True, True, False, False, False)

    @nn.compact
    def __call__(self, x, train: bool = False, init_codebook: bool = False):
        name = self.encoder_name if "ccavq" in self.encoder_name else "ccavq" + self.encoder_name
        encoder, enc_ch = make_encoder(name, self.in_channels, self.depth,
                                       cca=tuple(self.cca), vq_cfg=dict(self.vq_cfg),
                                       module_name="encoder")
        feats, commit, usage = encoder(x, train, init_codebook)
        dec_ch = _decoder_channels(enc_ch, self.decoder_channels)
        dec = UnetDecoder(dec_ch, name="decoder")(feats[1:], train)
        out = _VQHead(self.num_classes, 3, self.upsampling, name="segmentation_head")(dec, train)
        return out, commit, usage


@register("drsavqunet")
class DRSAVQUnet(VQATUnet):
    """DRSAM attention on the non-VQ stages (modified_vqunet/net.py:907-981)."""

    @nn.compact
    def __call__(self, x, train: bool = False, init_codebook: bool = False):
        core = VQUnetCore(self.encoder_name, FrozenDict(dict(self.vq_cfg)), self.in_channels,
                          self.decoder_channels, self.depth, pre_vq="drsam_identity",
                          name="core")
        dec, commit, usage, dec_ch, _feats = core(x, train, init_codebook)
        out = _VQHead(self.num_classes, 3, self.upsampling, name="segmentation_head")(dec, train)
        return out, commit, usage


@register("vqpatchunet")
class VQPatchUNet(VQATUnet):
    """ConvMixer stem replaces the resnet conv1/bn1/relu
    (modified_vqunet/net.py:505-563)."""

    mixer_depth: int = 3

    @nn.compact
    def __call__(self, x, train: bool = False, init_codebook: bool = False):
        core = VQUnetCore(self.encoder_name, FrozenDict(dict(self.vq_cfg)), self.in_channels,
                          self.decoder_channels, self.depth, stem="convmixer",
                          mixer_depth=self.mixer_depth, name="core")
        dec, commit, usage, dec_ch, _feats = core(x, train, init_codebook)
        out = _VQHead(self.num_classes, 3, self.upsampling, name="segmentation_head")(dec, train)
        return out, commit, usage


@register("vqimdbnet")
class VQIMDBNet(VQATUnet):
    """IMDB block at the deepest stage (modified_vqunet/net.py:565-620)."""

    @nn.compact
    def __call__(self, x, train: bool = False, init_codebook: bool = False):
        core = VQUnetCore(self.encoder_name, FrozenDict(dict(self.vq_cfg)), self.in_channels,
                          self.decoder_channels, self.depth, pre_vq="imdb_deepest", name="core")
        dec, commit, usage, dec_ch, _feats = core(x, train, init_codebook)
        out = _VQHead(self.num_classes, 3, self.upsampling, name="segmentation_head")(dec, train)
        return out, commit, usage
