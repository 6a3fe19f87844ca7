"""Dense-CRF post-processing (reference utils/crf.py:5-35), pure JAX.

The reference wraps pydensecrf (permutohedral-lattice mean field).  That C
library is neither TPU-runnable nor installed here; this is a from-scratch
mean-field dense CRF whose message passing uses
  * a separable spatial Gaussian (pos_xy_std) — exact, via 1-D convolutions;
  * a windowed bilateral kernel (bi_xy_std, bi_rgb_std) — local
    approximation of the reference's full-image bilateral term: messages are
    gathered over a (2R+1)^2 neighbourhood with colour-modulated Gaussian
    weights.  With the reference's bi_xy_std=50 the true kernel is
    near-global; the windowed form keeps the dominant short-range mass and
    runs as one jitted program on TPU.  Documented divergence; CRF is an
    optional eval-time refinement (used only by deprecated test scripts).

Default compat/std parameters match the reference ctor
(iter_max=10, bi_w=7, bi_xy_std=50, bi_rgb_std=4, pos_w=3, pos_xy_std=3).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def _gauss_kernel1d(std: float, radius: int):
    x = np.arange(-radius, radius + 1, dtype=np.float32)
    k = np.exp(-0.5 * (x / std) ** 2)
    return jnp.asarray(k)


def _separable_blur(q, std: float, radius: int):
    """q: (H, W, C); Gaussian blur along H then W (kernel NOT normalised —
    dense-CRF messages are unnormalised Gaussian sums)."""
    k = _gauss_kernel1d(std, radius)
    pad = radius
    qp = jnp.pad(q, ((pad, pad), (0, 0), (0, 0)))
    qh = sum(k[i] * qp[i:i + q.shape[0]] for i in range(2 * radius + 1))
    qp = jnp.pad(qh, ((0, 0), (pad, pad), (0, 0)))
    return sum(k[i] * qp[:, i:i + q.shape[1]] for i in range(2 * radius + 1))


def _bilateral_message(q, image, xy_std: float, rgb_std: float, radius: int):
    """Windowed bilateral filtering of q by joint spatial+colour affinity.
    q: (H, W, C) beliefs, image: (H, W, 3) in [0, 255].  The (2R+1)^2-1
    neighbourhood is a lax.scan over shift offsets (an unrolled python loop
    would blow up compile time at R=5)."""
    norm_img = image / rgb_std
    offs = [(dy, dx) for dy in range(-radius, radius + 1)
            for dx in range(-radius, radius + 1) if (dy, dx) != (0, 0)]
    dydx = jnp.asarray(offs, jnp.int32)
    spatial = jnp.asarray(
        np.exp(-0.5 * (np.asarray(offs) ** 2).sum(-1) / (xy_std * xy_std)),
        jnp.float32)

    def step(acc, inp):
        (dy, dx), sp = inp
        q_s = jnp.roll(q, (dy, dx), axis=(0, 1))
        img_s = jnp.roll(norm_img, (dy, dx), axis=(0, 1))
        colour = jnp.exp(-0.5 * jnp.sum((norm_img - img_s) ** 2, axis=-1, keepdims=True))
        return acc + sp * colour * q_s, None

    out, _ = jax.lax.scan(step, jnp.zeros_like(q), ((dydx[:, 0], dydx[:, 1]), spatial))
    return out


class DenseCRF:
    """Callable mirroring the reference surface: ``crf(image, prob_map)``
    with image (H,W,3) float [0,1] and prob_map (H,W,C) softmax scores
    (reference is CHW; here channel-last), returning refined (H,W,C) Q."""

    def __init__(self, iter_max: int = 10, bi_w: float = 7, bi_xy_std: float = 50,
                 bi_rgb_std: float = 4, pos_w: float = 3, pos_xy_std: float = 3,
                 bilateral_radius: int = 5):
        self.iter_max = iter_max
        self.bi_w = bi_w
        self.bi_xy_std = bi_xy_std
        self.bi_rgb_std = bi_rgb_std
        self.pos_w = pos_w
        self.pos_xy_std = pos_xy_std
        self.bilateral_radius = bilateral_radius
        self._run = jax.jit(partial(self._inference))

    def _inference(self, image, prob_map):
        unary = -jnp.log(jnp.maximum(prob_map, 1e-12))  # unary_from_softmax
        spatial_radius = int(max(1, round(2 * self.pos_xy_std)))
        q = prob_map

        def body(_, q):
            # message passing
            m_pos = _separable_blur(q, self.pos_xy_std, spatial_radius) - q
            m_bi = _bilateral_message(q, image * 255.0, self.bi_xy_std,
                                      self.bi_rgb_std, self.bilateral_radius)
            # Potts compatibility: other-label message mass raises the energy
            pairwise = self.pos_w * m_pos + self.bi_w * m_bi
            energy = unary + (jnp.sum(pairwise, axis=-1, keepdims=True) - pairwise)
            return jax.nn.softmax(-energy, axis=-1)

        return jax.lax.fori_loop(0, self.iter_max, body, q)

    def __call__(self, image, prob_map):
        image = jnp.asarray(image, jnp.float32)
        prob_map = jnp.asarray(prob_map, jnp.float32)
        return self._run(image, prob_map)
