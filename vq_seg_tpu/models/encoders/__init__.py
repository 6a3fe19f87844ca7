"""Encoder factory (reference models/encoders/__init__.py:8-32).

``make_encoder(name, ...)`` dispatches on the name with the reference's
``ccavq``/``cca`` resnet prefixes; returns an *unbound* Flax module — params
come from ``.init``.  Pretrained torch weights are converted offline via
``vq_seg_tpu.utils.torch_weights`` (this environment has no network egress,
so ``weights`` may be a local .pth path or None; URL names are recorded but
not fetched).
"""
from __future__ import annotations

import re
from typing import Optional

from vq_seg_tpu.models.encoders.resnet import (  # noqa: F401
    CCAVQResNetEncoder,
    ResNetEncoder,
    resnet_encoders,
)
from vq_seg_tpu.models.encoders.vgg import VGGEncoder, vgg_encoders  # noqa: F401

# pretrained-weight URL registry mirroring reference
# models/encoders/pretrained_settings.py:5-20 (recorded for provenance; the
# converter consumes locally supplied .pth files).
PRETRAINED_URLS = {
    "resnet18": {
        "imagenet": "https://download.pytorch.org/models/resnet18-5c106cde.pth",
        "imagenet_ssl": "https://dl.fbaipublicfiles.com/semiweaksupervision/model_files/semi_supervised_resnet18-d92f0530.pth",
        "imagenet_swsl": "https://dl.fbaipublicfiles.com/semiweaksupervision/model_files/semi_weakly_supervised_resnet18-118f1556.pth",
    },
    "resnet50": {
        "imagenet": "https://download.pytorch.org/models/resnet50-19c8e357.pth",
        "imagenet_ssl": "https://dl.fbaipublicfiles.com/semiweaksupervision/model_files/semi_supervised_resnet50-08389792.pth",
        "imagenet_swsl": "https://dl.fbaipublicfiles.com/semiweaksupervision/model_files/semi_weakly_supervised_resnet50-16a12f1b.pth",
    },
    "convnext_tiny": {"imagenet": "https://download.pytorch.org/models/convnext_tiny-983f1562.pth"},
    "convnext_small": {"imagenet": "https://download.pytorch.org/models/convnext_small-0c510722.pth"},
    "convnext_base": {"imagenet": "https://download.pytorch.org/models/convnext_base-6075fbad.pth"},
    "convnext_large": {"imagenet": "https://download.pytorch.org/models/convnext_large-ea097f82.pth"},
}


def make_encoder(name: str, in_channels: int = 3, depth: int = 5, weights: Optional[str] = None,
                 padding_mode: str = "zeros", output_stride: int = 32,
                 module_name: Optional[str] = None, **kwargs):
    """Build an encoder module by name.

    Returns (module, encoder_channels).  ``weights`` is carried as metadata;
    conversion/loading of torch checkpoints happens in the trainer via
    utils/torch_weights (functional params, not in-place mutation).
    """
    if "resnet" in name:
        if "ccavq" in name:
            base = re.sub("ccavq", "", name)
            p = resnet_encoders[base]
            vq_cfg = kwargs.pop("vq_cfg", {
                "num_embeddings": [0, 0, 512, 512, 512],
                "distance": "euclidean",
                "kmeans_init": True,
            })
            enc = CCAVQResNetEncoder(
                out_channels=p["out_channels"], block=p["block"], layers=p["layers"],
                vq_cfg=tuple(sorted(dict(vq_cfg).items(), key=lambda kv: kv[0]))
                if isinstance(vq_cfg, dict) else vq_cfg,
                depth=depth, in_channels=in_channels, padding_mode=padding_mode,
                groups=p.get("groups", 1), width_per_group=p.get("width_per_group", 64),
                **kwargs,
            )
        else:
            cca = None
            if "cca" in name:
                base = re.sub("cca", "", name)
                cca = kwargs.pop("cca", (False, False, True, True, True))
            else:
                base = name
            p = resnet_encoders[base]
            enc = ResNetEncoder(
                out_channels=p["out_channels"], block=p["block"], layers=p["layers"],
                depth=depth, in_channels=in_channels, padding_mode=padding_mode,
                output_stride=output_stride, groups=p.get("groups", 1),
                width_per_group=p.get("width_per_group", 64), cca=cca,
                name=module_name, **kwargs,
            )
        return enc, enc.encoder_channels()
    if "vgg" in name:
        p = vgg_encoders[name]
        enc = VGGEncoder(out_channels=p["out_channels"], config=p["config"],
                         batch_norm=p["batch_norm"], depth=depth, in_channels=in_channels,
                         name=module_name)
        return enc, enc.encoder_channels()
    if "convnext" in name:
        from vq_seg_tpu.models.encoders.convnext import ConvNeXtEncoder, convnext_encoders

        p = convnext_encoders[name]
        # ConvNeXt has 4 resolution levels (strides 4/8/16/32) — clamp depth
        enc = ConvNeXtEncoder(depths=p["depths"], dims=p["dims"],
                              depth=min(depth, 4), in_channels=in_channels,
                              name=module_name)
        return enc, enc.encoder_channels()
    raise KeyError(f"unknown encoder: {name}")
