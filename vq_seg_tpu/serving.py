"""TPU-native serving / inference path.

The reference's only inference surface is the evaluator
(``test_detailviz.py:31-163``: batch-1 torch forward, score bilinearly
upsampled to mask size, argmax on host).  This module is the
deployment-oriented counterpart, optimized for what actually dominates TPU
inference cost at production batch sizes:

* **Transfers** — images cross host→device as ``uint8`` (4× less traffic
  than f32) and labels come back as ``uint8`` class ids (12× less than f32
  logits); normalisation (``/255``), the official-protocol bilinear score
  upsample, and the argmax all run on device.
* **Weights** — optional ``half=True`` stores params in bfloat16 (halves
  HBM weight reads, the bandwidth floor of small-batch inference) and
  traces the forward under the bf16 compute policy (mirrors training AMP).
  BatchNorm running stats and VQ codebooks stay f32.
* **Compile** — the forward is AOT lowered + compiled at construction for
  the fixed serving shape; first ``__call__`` pays zero compile.
* **Latency hiding** — :meth:`Predictor.predict_stream` keeps one batch in
  flight: batch *k+1* is dispatched before batch *k*'s labels are fetched,
  so host↔device transfer overlaps TPU compute (JAX dispatch is async; the
  blocking point is the ``np.asarray`` fetch).

Example::

    pred = Predictor.from_checkpoint(cfg, "runs/x/ckpoints/last.ckpt",
                                     batch_size=8)
    labels = pred(imgs_uint8)                 # (B, H, W) uint8 class ids
    for lab in pred.predict_stream(batches):  # pipelined
        ...
"""
from __future__ import annotations

from typing import Iterable, Iterator, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .models.layers import compute_dtype, resize_bilinear
from .models.networks import make_model


def _cast_params_bf16(variables):
    """bf16-store the learned params; keep BN running stats (tiny, numerics-
    sensitive through 1/sqrt(var+eps)) and frozen VQ codebooks (argmin
    distance comparisons) in f32."""
    out = dict(variables)
    out["params"] = jax.tree_util.tree_map(
        lambda a: a.astype(jnp.bfloat16) if jnp.issubdtype(a.dtype, jnp.floating) else a,
        variables["params"])
    return out


def _quantize_params_int8(variables):
    """Weight-only int8: per-output-channel symmetric quantization of every
    weight tensor with >=2 dims (conv kernels HWIO, dense kernels IO — the
    last axis is the output channel in both); vectors (BN scale/bias, conv
    bias) stay bf16.  Returns (int8/bf16 pytree, f32 scale pytree aligned to
    it; scale=None marks unquantized leaves).  Dequantisation happens inside
    the jitted forward as ``q.astype(bf16) * scale`` — XLA folds the convert+
    multiply into the consuming conv's input fusion, so weights live in HBM
    at 1 byte/elem (half the bf16 predictor's weight traffic, 4x f32)."""
    def q(a):
        if not (jnp.issubdtype(a.dtype, jnp.floating) and a.ndim >= 2):
            return a.astype(jnp.bfloat16) if jnp.issubdtype(a.dtype, jnp.floating) else a, None
        amax = jnp.max(jnp.abs(a), axis=tuple(range(a.ndim - 1)), keepdims=True)
        scale = jnp.where(amax > 0, amax / 127.0, 1.0).astype(jnp.float32)
        qa = jnp.clip(jnp.round(a / scale), -127, 127).astype(jnp.int8)
        return qa, scale

    leaves, treedef = jax.tree_util.tree_flatten(variables["params"])
    pairs = [q(a) for a in leaves]
    params_q = jax.tree_util.tree_unflatten(treedef, [p[0] for p in pairs])
    out = dict(variables)
    out["params"] = params_q
    return out, [p[1] for p in pairs]  # scales: flat list aligned to leaves


def _dequantize_params(params_q, scales):
    """Inverse of `_quantize_params_int8` inside the traced forward: scales
    is the flat leaf-aligned list it returned (None = leaf not quantized)."""
    leaves, treedef = jax.tree_util.tree_flatten(params_q)
    deq = [l if s is None else l.astype(jnp.bfloat16) * s.astype(jnp.bfloat16)
           for l, s in zip(leaves, scales)]
    return jax.tree_util.tree_unflatten(treedef, deq)


class Predictor:
    """Fixed-shape, AOT-compiled segmentation predictor.

    Parameters
    ----------
    model:        a network from :func:`make_model` (forward returns logits
                  or a tuple with logits first, like every registry entry).
    variables:    its variable collections (``model_1`` of a checkpoint).
    input_hw:     (H, W) the model consumes — ``cfg.resize``.
    batch_size:   serving batch; partial final batches are padded internally.
    output_hw:    if given, logits are bilinearly upsampled to this size on
                  device before argmax — the official eval protocol
                  (test_detailviz.py:107-145 resizes the score map to the
                  native mask size).  None = argmax at model resolution.
    half:         bf16 weights + bf16 compute policy (default True).
    mesh:         optional :class:`jax.sharding.Mesh` — the serving batch is
                  sharded over its ``data`` axis and the weights replicated,
                  so one predictor drives every chip of a pod slice
                  (``batch_size`` is the GLOBAL batch and must divide by the
                  data-axis size).  Eval has no cross-sample coupling, so
                  sharded output == single-chip output exactly.
    quant:        ``"int8"`` stores weights int8 with per-output-channel
                  scales (dequantised to bf16 inside the compiled forward) —
                  half the bf16 predictor's weight HBM traffic; accuracy
                  delta is gated in tools/serving_bench.py --int8.
    spatial:      with ``mesh``, shard image ROWS (H) over the data axis
                  instead of the batch — the TPU-native way to put every
                  chip on ONE image when the workload is batch-1 latency,
                  not throughput.  GSPMD's spatial partitioner inserts the
                  conv halo exchanges over ICI; no model changes.  H must
                  divide by the data-axis size.
    """

    def __init__(self, model, variables, *, input_hw: Tuple[int, int],
                 batch_size: int = 1, output_hw: Optional[Tuple[int, int]] = None,
                 half: bool = True, mesh=None, spatial: bool = False,
                 quant: Optional[str] = None):
        self.batch_size = int(batch_size)
        self.input_hw = tuple(input_hw)
        self.output_hw = tuple(output_hw) if output_hw is not None else None
        self.mesh = mesh
        self.quant = quant

        if spatial and mesh is None:
            raise ValueError("spatial=True requires a mesh")
        if quant not in (None, "int8"):
            raise ValueError(f"quant must be None or 'int8', got {quant!r}")
        scales = None
        if quant == "int8":
            # weight-only int8 (implies bf16 compute); see _quantize_params_int8
            variables, scales = _quantize_params_int8(variables)
            half = True
        elif half:
            variables = _cast_params_bf16(variables)
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            from .parallel import batch_sharding, replicated
            n_data = mesh.shape["data"]
            if spatial:
                if self.input_hw[0] % n_data:
                    raise ValueError(
                        f"spatial serving: H {self.input_hw[0]} must divide "
                        f"by the mesh data axis ({n_data})")
                self._in_sharding = NamedSharding(mesh, P(None, "data"))
            else:
                if self.batch_size % n_data:
                    raise ValueError(
                        f"batch_size {self.batch_size} must divide by the "
                        f"mesh data axis ({n_data})")
                self._in_sharding = batch_sharding(mesh)
            variables = jax.device_put(variables, replicated(mesh))
            if scales is not None:
                scales = [None if s is None else jax.device_put(s, replicated(mesh))
                          for s in scales]
        else:
            self._in_sharding = None
            variables = jax.device_put(variables)
        self._vars = variables

        out_hw = self.output_hw

        def forward(vars_, img_u8):
            if scales is not None:
                vars_ = dict(vars_)
                vars_["params"] = _dequantize_params(vars_["params"], scales)
            x = img_u8.astype(jnp.float32) / 255.0
            out = model.apply(vars_, x, train=False)
            logits = out[0] if isinstance(out, tuple) else out
            logits = logits.astype(jnp.float32)
            if out_hw is not None and tuple(logits.shape[1:3]) != out_hw:
                logits = resize_bilinear(logits, out_hw)
            return jnp.argmax(logits, axis=-1).astype(jnp.uint8)

        img_spec = jax.ShapeDtypeStruct(
            (self.batch_size, *self.input_hw, 3), jnp.uint8,
            sharding=self._in_sharding)
        # trace under the bf16 policy so conv/BN compute in bf16 (the same
        # trace-time global the trainers use — models/layers.py)
        with compute_dtype(jnp.bfloat16 if half else None):
            self._fn = jax.jit(forward).lower(self._vars, img_spec).compile()

    @classmethod
    def from_checkpoint(cls, cfg, weights_path: str, **kw):
        """Build from a config (``cfg.model`` schema) + checkpoint path.
        Accepts both the full CPS contract (uses ``model_1``) and a bare
        variables tree."""
        from .utils.ckpoints import load_full

        model = make_model(cfg.model)
        ck = load_full(weights_path)
        variables = ck.get("model_1", ck)
        kw.setdefault("input_hw", (cfg.resize, cfg.resize))
        return cls(model, variables, **kw)

    # -- dispatch/fetch split (predict_stream pipelines across it) ---------

    def _dispatch(self, imgs: np.ndarray):
        """Enqueue one forward; returns (device_labels, real_batch)."""
        n = imgs.shape[0]
        if imgs.ndim != 4 or imgs.shape[1:3] != self.input_hw or imgs.shape[3] != 3:
            raise ValueError(
                f"expected (B, {self.input_hw[0]}, {self.input_hw[1]}, 3) "
                f"uint8, got {imgs.shape}")
        if n > self.batch_size:
            raise ValueError(f"batch {n} > serving batch_size {self.batch_size}")
        if n < self.batch_size:  # pad the final partial batch
            pad = np.zeros((self.batch_size - n, *imgs.shape[1:]), imgs.dtype)
            imgs = np.concatenate([imgs, pad], axis=0)
        dev = (jax.device_put(imgs.astype(np.uint8), self._in_sharding)
               if self._in_sharding is not None else jnp.asarray(imgs, jnp.uint8))
        return self._fn(self._vars, dev), n

    @staticmethod
    def _fetch(handle) -> np.ndarray:
        dev_labels, n = handle
        return np.asarray(dev_labels)[:n]

    def __call__(self, imgs: np.ndarray) -> np.ndarray:
        """(B≤batch_size, H, W, 3) uint8 → (B, oh, ow) uint8 class ids."""
        return self._fetch(self._dispatch(np.asarray(imgs)))

    def predict_stream(self, batches: Iterable[np.ndarray]) -> Iterator[np.ndarray]:
        """Yield labels for an iterable of image batches with one batch kept
        in flight (dispatch k+1 before fetching k)."""
        pending = None
        for imgs in batches:
            handle = self._dispatch(np.asarray(imgs))
            if pending is not None:
                yield self._fetch(pending)
            pending = handle
        if pending is not None:
            yield self._fetch(pending)
