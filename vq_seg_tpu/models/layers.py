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

import functools
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


# ---------------------------------------------------------------------------
# Layer-implementation toggles (trace-time globals, same idiom as the compute
# dtype above).  Both "optimized" variants shipped in round 4 on per-op trace
# evidence; the round-5 STEP-level A/B (tools/ab_layers_r05.py, real v5e,
# AB_LAYERS_R05.json) measured the flagship default profile:
#
#   max_pool_custom_vjp  upsample_matmul   img/s    ms/step
#          True               True         37.86    211.3   (round-4 shipped)
#          False              True         46.12    173.5   <- shipped default
#          True               False        37.36    214.1
#          False              False        45.39    176.3   (round-3 behavior)
#
# The max_pool custom VJP's per-op trace win (3.8 ms) was real but its 9-tap
# unrolled backward costs ~38 ms/step of extra HBM traffic at 512^2 — a 19%
# END-TO-END regression (the BENCH_r04 mystery).  It stays available behind
# the toggle for narrow shapes; the default is XLA's select-and-scatter.
# The matmul upsample is a genuine +1.6% at step level and stays on.
# ---------------------------------------------------------------------------
_LAYER_IMPL = {"max_pool_custom_vjp": False, "upsample_matmul": True}


def set_layer_impl(**kwargs):
    """Override layer implementation choices at trace time.

    Keys: ``max_pool_custom_vjp`` (unrolled compare+pad backward vs XLA's
    select-and-scatter), ``upsample_matmul`` (constant-matmul align-corners
    upsample for C<128 vs gather+lerp)."""
    for k, v in kwargs.items():
        if k not in _LAYER_IMPL:
            raise KeyError(k)
        _LAYER_IMPL[k] = bool(v)


def max_pool_same(x, window: int = 3, stride: int = 2, padding: int = 1):
    """torch MaxPool2d(k, s, p): explicit -inf padding (nn.max_pool pads the
    reduce_window identity, which for max is -inf — matching torch).

    Two backward implementations, toggled by set_layer_impl (gradients are
    bit-identical — tests/test_encoder_parity.py pins them):

      * plain nn.max_pool with XLA's native select-and-scatter gradient —
        the DEFAULT: the round-5 step-level A/B (AB_LAYERS_R05.json)
        measured it 46.1 vs 37.9 img/s on the flagship step.
      * custom VJP re-deriving the routing as ``window^2`` fused compare +
        interior-pad + add steps (same first-match routing as torch /
        select-and-scatter).  Its per-op trace looked 3.8 ms cheaper for
        the stem pool, but the 9 full-size padded adds cost ~38 ms/step of
        HBM traffic at 512^2 — the BENCH_r04 regression.  Kept behind the
        toggle as a reference implementation.
    """
    if _LAYER_IMPL["max_pool_custom_vjp"]:
        return _max_pool_same_vjp(x, window, stride, padding)
    return nn.max_pool(
        x, (window, window), strides=(stride, stride),
        padding=((padding, padding), (padding, padding)),
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3))
def _max_pool_same_vjp(x, window: int = 3, stride: int = 2, padding: int = 1):
    return nn.max_pool(
        x, (window, window), strides=(stride, stride),
        padding=((padding, padding), (padding, padding)),
    )


def _max_pool_same_fwd(x, window, stride, padding):
    y = nn.max_pool(
        x, (window, window), strides=(stride, stride),
        padding=((padding, padding), (padding, padding)),
    )
    return y, (x, y)


def _max_pool_same_bwd(window, stride, padding, res, g):
    x, y = res
    n, h, w, c = x.shape
    oh, ow = y.shape[1], y.shape[2]
    xp = jnp.pad(x, ((0, 0), (padding, padding), (padding, padding), (0, 0)),
                 constant_values=-jnp.inf)
    hp, wp = h + 2 * padding, w + 2 * padding
    span_h, span_w = (oh - 1) * stride + 1, (ow - 1) * stride + 1
    zero = jnp.zeros((), g.dtype)
    dxp = jnp.zeros((n, hp, wp, c), g.dtype)
    assigned = jnp.zeros((n, oh, ow, c), bool)
    for di in range(window):
        for dj in range(window):
            x_win = jax.lax.slice(xp, (0, di, dj, 0),
                                  (n, di + span_h, dj + span_w, c),
                                  (1, stride, stride, 1))
            take = (x_win == y) & ~assigned
            contrib = jnp.where(take, g, zero)
            # interior padding scatters the stride-2 output grid back onto
            # input positions di + stride*k — no scatter op, fuses with add
            dxp = dxp + jax.lax.pad(contrib, zero, (
                (0, 0, 0),
                (di, hp - di - span_h, stride - 1),
                (dj, wp - dj - span_w, stride - 1),
                (0, 0, 0)))
            assigned = assigned | take
    dx = jax.lax.slice(dxp, (0, padding, padding, 0),
                       (n, padding + h, padding + w, c))
    return (dx,)


_max_pool_same_vjp.defvjp(_max_pool_same_fwd, _max_pool_same_bwd)


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


def _lerp_matrix(in_size: int, out_size: int):
    """(out, in) interpolation matrix for align_corners bilinear: each row
    holds the two lerp weights of `_ac_weights` (<=2 nonzeros)."""
    i0, i1, w = _ac_weights(in_size, out_size)
    m = np.zeros((out_size, in_size), np.float32)
    np.add.at(m, (np.arange(out_size), i0), 1.0 - w)
    np.add.at(m, (np.arange(out_size), i1), w)
    return m


def upsample_bilinear_ac(x, scale: int | None = None, size: Tuple[int, int] | None = None):
    """nn.UpsamplingBilinear2d: bilinear with align_corners=True (NHWC).

    For narrow channel counts (C < 128 — e.g. the 3-class head output at
    full resolution) a gather+lerp leaves the TPU lane dimension idle and
    XLA picks pathological layouts for the gathered tensors — profiled at
    ~15 ms/step of the flagship default (round-4 trace: the 7 ms
    `add_bitcast_fusion` + six ~1.4 ms gather fusions all pointed here).
    Instead the two 1-D lerps are expressed as small constant matmuls
    (out_h x h and out_w x w, <=2 nonzeros per row) contracted on the MXU
    at HIGHEST precision: zero gathers, zero transposes, and the zeros
    contribute exactly 0.0f so results match the lerp formula to the ulp.
    For wide channels the lane-friendly gather+lerp stays.
    """
    n, h, w, c = x.shape
    if size is None:
        size = (h * scale, w * scale)
    oh, ow = size
    if (oh, ow) == (h, w):
        return x
    if c < 128 and _LAYER_IMPL["upsample_matmul"]:
        mh = jnp.asarray(_lerp_matrix(h, oh))
        mw = jnp.asarray(_lerp_matrix(w, ow))
        dt = x.dtype
        x = jnp.einsum("oh,nhwc->nowc", mh, x.astype(jnp.float32),
                       precision=jax.lax.Precision.HIGHEST)
        x = jnp.einsum("pw,nhwc->nhpc", mw, x,
                       precision=jax.lax.Precision.HIGHEST)
        return x.astype(dt)
    i0, i1, wy = _ac_weights(h, oh)
    j0, j1, wx = _ac_weights(w, ow)
    x = (1.0 - wy)[None, :, None, None] * x[:, i0] + wy[None, :, None, None] * x[:, i1]
    x = (1.0 - wx)[None, None, :, None] * x[:, :, j0] + wx[None, None, :, None] * x[:, :, j1]
    return x


def torch_linear_init(key, shape, dtype=jnp.float32):
    """torch nn.Linear/Embedding-style default init helpers live with the
    modules that need exact parity; generic layers use flax defaults."""
    return nn.initializers.lecun_normal()(key, shape, dtype)
