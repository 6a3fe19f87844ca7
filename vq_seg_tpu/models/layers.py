"""Shared NHWC building blocks for all networks.

TPU-first notes:
  * layout is NHWC end-to-end (TPU conv native layout; the reference is NCHW).
  * reflect/replicate/circular conv padding (reference
    models/encoders/resnet.py:130-148 rewrites every conv's padding_mode) is
    an explicit ``jnp.pad`` before a VALID conv — XLA fuses the pad into the
    convolution window read.
  * two bilinear resizes exist in the reference with *different* corner
    conventions: ``F.interpolate(mode='bilinear')`` (half-pixel,
    align_corners=False — decoder skip upsampling, unet/decoder.py:35) and
    ``nn.UpsamplingBilinear2d`` (align_corners=True — final x2 head upsample,
    e.g. modified_vqunet/net.py:215).  Both are provided; the align-corners
    variant is a static gather+lerp (shapes are static under jit).
"""
from __future__ import annotations

from typing import Any, Callable, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

# torch kaiming_normal_(mode="fan_out", nonlinearity="relu"), the torchvision
# resnet conv init.
kaiming_normal = nn.initializers.variance_scaling(2.0, "fan_out", "normal")
# torch default Conv2d init is kaiming_uniform(a=sqrt(5)) == uniform
# variance-scaling with gain 1/3 on fan_in.
torch_conv_default = nn.initializers.variance_scaling(1.0 / 3.0, "fan_in", "uniform")

# ---------------------------------------------------------------------------
# Global compute dtype (mixed precision)
#
# The reference trains under torch AMP (train_…v2.py:114,151).  The TPU
# equivalent: params stay f32, conv/BN compute in bf16.  Because flax module
# dtypes are fixed at construction and our modules are built inside traced
# functions, the policy is a process-global read at TRACE time — set it (or
# use the context manager) around state creation + the first train-step call
# and every conv/BN picks it up.  Losses/metrics cast back to f32.
# ---------------------------------------------------------------------------
_COMPUTE_DTYPE = [None]


def set_compute_dtype(dtype):
    """Set the global conv/BN compute dtype (None = f32).  Affects modules
    traced AFTER the call."""
    _COMPUTE_DTYPE[0] = dtype


def current_compute_dtype(explicit=None):
    return explicit if explicit is not None else _COMPUTE_DTYPE[0]


class compute_dtype:
    """Context manager: with compute_dtype(jnp.bfloat16): ... (trace-time)."""

    def __init__(self, dtype):
        self.dtype = dtype

    def __enter__(self):
        self.prev = _COMPUTE_DTYPE[0]
        _COMPUTE_DTYPE[0] = self.dtype

    def __exit__(self, *exc):
        _COMPUTE_DTYPE[0] = self.prev

# ---------------------------------------------------------------------------
# Decoder BN hyperparameter override (reference init_weight: cfg.train.bn_eps
# / cfg.train.bn_momentum are applied to the DECODER's BatchNorms only,
# models/__init__.py:19-26 + train_…v2.py:74-80).  Same trace-time-global
# idiom as the compute dtype: trainers set it from config before tracing;
# UnetDecoder reads it.  Momentum is torch-style (new-stat fraction, 0.1
# default) and converted to the flax convention (1 - torch) at the read.
# ---------------------------------------------------------------------------
_DECODER_BN = [None, None]  # (eps, torch_momentum)


def set_decoder_bn_overrides(eps=None, torch_momentum=None):
    _DECODER_BN[0] = eps
    _DECODER_BN[1] = torch_momentum


def decoder_bn_params():
    """(flax_eps, flax_momentum) for decoder BatchNorms."""
    eps = _DECODER_BN[0] if _DECODER_BN[0] is not None else 1e-5
    mom = 0.9 if _DECODER_BN[1] is None else 1.0 - _DECODER_BN[1]
    return eps, mom


_PAD_MODE = {"zeros": None, "reflect": "reflect", "replicate": "edge", "circular": "wrap"}


class ConvPad(nn.Module):
    """Conv2d with torch-style symmetric int padding and padding_mode support.

    Mirrors the surface of ``torch.nn.Conv2d(..., padding_mode=...)`` that the
    reference uses everywhere (e.g. models/encoders/resnet.py:125).
    """

    features: int
    kernel_size: Tuple[int, int] | int = 3
    strides: Tuple[int, int] | int = 1
    padding: int = 0
    dilation: int = 1
    groups: int = 1
    use_bias: bool = True
    padding_mode: str = "zeros"
    kernel_init: Callable = kaiming_normal
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        ks = self.kernel_size if isinstance(self.kernel_size, tuple) else (self.kernel_size,) * 2
        st = self.strides if isinstance(self.strides, tuple) else (self.strides,) * 2
        p = self.padding
        pad_cfg = ((p, p), (p, p))
        mode = _PAD_MODE[self.padding_mode]
        if mode is not None and p > 0:
            x = jnp.pad(x, ((0, 0), (p, p), (p, p), (0, 0)), mode=mode)
            pad_cfg = ((0, 0), (0, 0))
        return nn.Conv(
            self.features,
            ks,
            strides=st,
            padding=pad_cfg,
            kernel_dilation=(self.dilation, self.dilation),
            feature_group_count=self.groups,
            use_bias=self.use_bias,
            kernel_init=self.kernel_init,
            dtype=current_compute_dtype(self.dtype),
        )(x)


class BatchNorm(nn.Module):
    """BatchNorm2d with torch defaults (eps 1e-5, running-stat momentum 0.1,
    i.e. flax momentum 0.9).  ``train`` selects batch vs running stats."""

    momentum: float = 0.9
    epsilon: float = 1e-5
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool):
        return nn.BatchNorm(
            use_running_average=not train,
            momentum=self.momentum,
            epsilon=self.epsilon,
            dtype=current_compute_dtype(self.dtype),
        )(x)


class ConvBNReLU(nn.Module):
    """conv -> BN -> ReLU (reference unet/decoder.py:7-10 and ubiquitous)."""

    features: int
    kernel_size: int = 3
    strides: int = 1
    padding: Optional[int] = None  # default: (k-1)//2, the torch 'same' idiom
    dilation: int = 1
    groups: int = 1
    use_bias: bool = False
    padding_mode: str = "zeros"
    act: Optional[Callable] = nn.relu
    bn_eps: float = 1e-5
    bn_momentum: float = 0.9

    @nn.compact
    def __call__(self, x, train: bool):
        pad = self.padding if self.padding is not None else (self.kernel_size - 1) // 2
        x = ConvPad(
            self.features, self.kernel_size, self.strides, pad, self.dilation,
            self.groups, self.use_bias, self.padding_mode,
        )(x)
        x = BatchNorm(epsilon=self.bn_eps, momentum=self.bn_momentum)(x, train)
        if self.act is not None:
            x = self.act(x)
        return x


def max_pool_same(x, window: int = 3, stride: int = 2, padding: int = 1):
    """torch MaxPool2d(k, s, p): explicit -inf padding (nn.max_pool pads the
    reduce_window identity, which for max is -inf — matching torch)."""
    return nn.max_pool(
        x, (window, window), strides=(stride, stride),
        padding=((padding, padding), (padding, padding)),
    )


def global_avg_pool(x, keepdims: bool = True):
    """AdaptiveAvgPool2d(1) over NHWC."""
    return jnp.mean(x, axis=(1, 2), keepdims=keepdims)


def resize_bilinear(x, size: Tuple[int, int]):
    """F.interpolate(mode='bilinear', align_corners=False) over NHWC."""
    n, _, _, c = x.shape
    return jax.image.resize(x, (n, size[0], size[1], c), method="bilinear", antialias=False)


def resize_nearest(x, size: Tuple[int, int]):
    """F.interpolate(mode='nearest') over NHW[C] — EXACT torch semantics:
    src_idx = floor(out_idx * in/out).

    (jax.image.resize 'nearest' rounds half-pixel centers, which picks the
    *other* pixel when downsampling by an integer factor — e.g. odd rows
    where torch picks even.  That shifted the prototype loss's gt grid every
    step; measured |dproto| 4.7e-2 against the torch transcription.  A static
    gather reproduces torch bit-exactly and costs the same.)
    """
    h, w = x.shape[1], x.shape[2]
    oh, ow = size
    iy = np.floor(np.arange(oh) * (h / oh)).astype(np.int32)
    ix = np.floor(np.arange(ow) * (w / ow)).astype(np.int32)
    return x[:, iy][:, :, ix]


def _ac_weights(in_size: int, out_size: int):
    if out_size == 1 or in_size == 1:
        i0 = np.zeros(out_size, np.int32)
        return i0, i0, np.zeros(out_size, np.float32)
    pos = np.linspace(0.0, in_size - 1.0, out_size)
    i0 = np.floor(pos).astype(np.int32)
    i0 = np.minimum(i0, in_size - 2)
    w = (pos - i0).astype(np.float32)
    return i0, i0 + 1, w


def upsample_bilinear_ac(x, scale: int | None = None, size: Tuple[int, int] | None = None):
    """nn.UpsamplingBilinear2d: bilinear with align_corners=True (NHWC).

    Static gather + lerp along H then W; shapes are trace-time constants so
    XLA sees two fused gathers.  For narrow channel counts (C < 128 — e.g.
    the 3-class head output) the lane dimension would be mostly idle, so the
    interpolation runs in an NCHW-internal layout with W in lanes (measured
    2x faster at C=3, bit-identical).
    """
    n, h, w, c = x.shape
    if size is None:
        size = (h * scale, w * scale)
    oh, ow = size
    if (oh, ow) == (h, w):
        return x
    i0, i1, wy = _ac_weights(h, oh)
    j0, j1, wx = _ac_weights(w, ow)
    if c < 128:
        z = x.transpose(0, 3, 1, 2)  # (N, C, H, W): W in lanes
        z = (1.0 - wy)[None, None, :, None] * z[:, :, i0] + wy[None, None, :, None] * z[:, :, i1]
        z = (1.0 - wx)[None, None, None, :] * z[:, :, :, j0] + wx[None, None, None, :] * z[:, :, :, j1]
        return z.transpose(0, 2, 3, 1)
    x = (1.0 - wy)[None, :, None, None] * x[:, i0] + wy[None, :, None, None] * x[:, i1]
    x = (1.0 - wx)[None, None, :, None] * x[:, :, j0] + wx[None, None, :, None] * x[:, :, j1]
    return x


def torch_linear_init(key, shape, dtype=jnp.float32):
    """torch nn.Linear/Embedding-style default init helpers live with the
    modules that need exact parity; generic layers use flax defaults."""
    return nn.initializers.lecun_normal()(key, shape, dtype)
