"""Vector quantizer Flax modules.

Functional re-design of reference ``vector_quantizer/vq_img.py`` and
``vector_quantizer/__init__.py``:

  * ``VectorQuantizer`` — per-stage codebook (euclidean vq_img.py:133-190,
    cosine :65-130, wrapper :193-244).  NHWC layout.  The codebook lives in
    the non-trainable ``codebook`` variable collection: in the reference the
    euclidean codebook provably receives no gradient (STE detaches the
    code path and the commitment loss detaches the quantize), and the EMA
    ``decay`` arg is stored but never used — the codebook is frozen at its
    k-means init.  Making it a non-param variable encodes that fact.
  * the reference's *lazy* k-means init on the first training forward
    (vq_img.py:165-166,179-190) becomes an explicit functional phase: call
    ``apply(..., init_codebook=True, mutable=["codebook"], rngs={"kmeans": k})``
    once on a real batch before training.
  * ``make_vq_module`` — int vs per-stage-list ``num_embeddings`` with 0 ->
    pass-through Identity (vector_quantizer/__init__.py:5-32).

Returns per call: (quantize NHWC, embed_index (B,H,W), commitment_loss
scalar, code_usage scalar) — the reference tuple contract.
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from vq_seg_tpu.ops.kmeans import kmeans, l2norm
from vq_seg_tpu.ops.vq import (
    code_usage_percent,
    commitment_loss,
    quantize_ste,
    vq_assign,
)


class VQIdentity(nn.Module):
    """Stage pass-through for num_embeddings == 0
    (vector_quantizer/__init__.py:27-32)."""

    @nn.compact
    def __call__(self, x, train: bool = False, init_codebook: bool = False):
        return x, None, None, None


class VectorQuantizer(nn.Module):
    """One codebook over the channel dim of an NHWC feature map.

    ``ema=True`` (``vq_cfg.ema`` in configs, OFF by default for parity)
    activates the standard VQ-VAE EMA codebook update using ``decay`` — the
    knob the reference constructor stores but never uses (vq_img.py:199):
    per train forward, cluster sizes and per-code feature sums are blended
    with factor ``decay`` and the codebook becomes the Laplace-smoothed
    running mean (van den Oord et al., appendix A.1).  Requires the train
    step to apply with ``mutable=["batch_stats", "codebook"]`` (the cps and
    supervised/selfsup steps do); assignment/STE/commitment in the same
    forward still use the pre-update codebook.  Under GSPMD the counts and
    sums reduce over the sharded batch/space axes automatically, so every
    device computes the same update and the codebook stays replicated.

    ``restart_threshold > 0`` (``vq_cfg.restart_threshold``, requires
    ``ema=True``) additionally revives dead codes: after the EMA update,
    any code whose EMA cluster size fell below the threshold is reseeded
    with the batch feature that the current codebook covers WORST (largest
    quantization residual; distinct dead codes take distinct residual
    ranks).  Deterministic — no RNG stream is needed inside the jitted
    train step — and the classic split-the-worst-point heuristic places
    revived codes where quantization error actually is, unlike uniform
    random reseeding.  The reseeded code's EMA state resets to unit mass
    at the feature.  OFF by default: the reference has no restart (its
    code_usage telemetry just reports the dead fraction)."""

    dim: int
    num_embeddings: int
    embedding_dim: Optional[int] = None
    decay: float = 0.8  # parity default: stored-but-unused unless ema=True
    eps: float = 1e-5
    kmeans_init: bool = False
    kmeans_iters: int = 10
    distance: str = "euclidean"
    commitment_weight: float = 1.0
    num_codebook: int = 1
    ema: bool = False
    restart_threshold: float = 0.0

    @property
    def _edim(self) -> int:
        return self.embedding_dim if self.embedding_dim is not None else self.dim

    @nn.compact
    def __call__(self, x, train: bool = False, init_codebook: bool = False):
        if self.distance not in ("euclidean", "cosine"):
            raise ValueError(f"unknown distance {self.distance}")
        if self.restart_threshold > 0 and not self.ema:
            raise ValueError(
                "restart_threshold requires ema=True (the EMA cluster size "
                "is the usage signal that marks a code dead)")
        k, ed = self.num_embeddings, self._edim

        def _default_init():
            # uniform in [-1/K, 1/K] (vq_img.py:88-89,156-157); with
            # kmeans_init the uniform values are placeholders overwritten by
            # the explicit init phase.
            key = self.make_rng("params")
            return jax.random.uniform(key, (k, ed), jnp.float32, -1.0 / k, 1.0 / k)

        codebook = self.variable("codebook", "embedding", _default_init)
        cluster_size = embed_avg = None
        if self.ema:
            # EMA state rides in the codebook collection so checkpoints and
            # the init phase carry it with the embedding
            cluster_size = self.variable(
                "codebook", "cluster_size", lambda: jnp.ones((k,), jnp.float32))
            embed_avg = self.variable(
                "codebook", "embed_avg", lambda: codebook.value)

        x = x.astype(jnp.float32)
        b, h, w, c = x.shape
        flat = x.reshape(b * h * w, c)

        if init_codebook and self.kmeans_init:
            if not self.is_mutable_collection("codebook"):
                raise ValueError(
                    "init_codebook=True requires mutable=['codebook'] in apply()"
                )
            feats = l2norm(flat) if self.distance == "cosine" else flat
            means, _ = kmeans(
                self.make_rng("kmeans"), feats, k, self.kmeans_iters,
                use_cosine_sim=(self.distance == "cosine"),
            )
            codebook.value = means
            if self.ema:
                # running mean == the k-means mean at unit mass
                cluster_size.value = jnp.ones((k,), jnp.float32)
                embed_avg.value = means

        cb = codebook.value
        if self.distance == "cosine":
            # the reference re-l2-normalises the stored weight in-place every
            # forward (vq_img.py:100); the codebook is frozen here, so using
            # the normalised value is equivalent.
            feats, cb = l2norm(flat), l2norm(cb)
        else:
            feats = flat

        idx, quantized, counts = vq_assign(feats, cb, metric=self.distance)
        usage = code_usage_percent(counts)

        if (train and self.ema and not init_codebook
                and self.is_mutable_collection("codebook")):
            # assignment above used the pre-update codebook; the EMA update
            # takes effect from the next forward (standard VQ-VAE ordering).
            # stop_gradient: the statistics must not leak into the loss AD.
            sg_feats = jax.lax.stop_gradient(feats)
            sums = jax.ops.segment_sum(sg_feats, idx, num_segments=k)
            d = self.decay
            new_cs = d * cluster_size.value + (1.0 - d) * counts.astype(jnp.float32)
            new_ea = d * embed_avg.value + (1.0 - d) * sums
            n = jnp.sum(new_cs)
            smoothed = (new_cs + self.eps) / (n + k * self.eps) * n
            new_cb = new_ea / smoothed[:, None]
            if self.distance == "cosine":
                new_cb = l2norm(new_cb)
            if self.restart_threshold > 0:
                dead = new_cs < self.restart_threshold
                # worst-covered batch features, one residual rank per code;
                # wrap when the batch has fewer points than codes
                err = jnp.sum((sg_feats - quantized) ** 2, axis=-1)
                # top-k residuals only (k candidates), not a full N-sort
                _, top = jax.lax.top_k(err, min(k, err.shape[0]))
                cand = sg_feats[top[jnp.arange(k) % top.shape[0]]]
                new_cb = jnp.where(dead[:, None], cand, new_cb)
                new_ea = jnp.where(dead[:, None], cand, new_ea)
                new_cs = jnp.where(dead, jnp.ones_like(new_cs), new_cs)
            cluster_size.value, embed_avg.value = new_cs, new_ea
            codebook.value = new_cb

        quantized = quantized.reshape(b, h, w, ed)
        loss = jnp.float32(0.0)
        if train:
            quantized = quantize_ste(x, quantized)
            if self.commitment_weight > 0:
                loss = commitment_loss(x, quantized, self.commitment_weight)
        return quantized, idx.reshape(b, h, w), loss, usage


def make_vq_module(vq_cfg, encoder_channels: Sequence[int], depth: int):
    """Build the per-stage codebook list (vector_quantizer/__init__.py:5-32).

    ``vq_cfg.num_embeddings`` may be an int (same K at every stage) or a
    per-stage list where 0 means pass-through.  ``encoder_channels`` includes
    the input channels at index 0, as in the reference.
    """
    cfg = dict(vq_cfg)
    num_embeddings = cfg.pop("num_embeddings")
    valid = {f.name for f in dataclasses.fields(VectorQuantizer)}
    cfg = {kk: v for kk, v in cfg.items() if kk in valid}
    if isinstance(num_embeddings, int):
        return [
            VectorQuantizer(dim=encoder_channels[i + 1], num_embeddings=num_embeddings, **cfg)
            for i in range(depth)
        ]
    if isinstance(num_embeddings, (list, tuple)):
        assert depth == len(num_embeddings), (
            "depth and length of vq_cfg.num_embeddings must be the same"
        )
        mods = []
        for i, k in enumerate(num_embeddings):
            if k == 0:
                mods.append(VQIdentity())
            elif k > 0:
                mods.append(VectorQuantizer(dim=encoder_channels[i + 1], num_embeddings=k, **cfg))
            else:
                raise ValueError(f"{k} is not an available number of embeddings")
        return mods
    raise TypeError(f"{type(num_embeddings)} is not an available type")
