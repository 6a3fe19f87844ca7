"""Dense-CRF post-processing (reference utils/crf.py:5-35), pure JAX.

The reference wraps pydensecrf (permutohedral-lattice mean field with
DIAG_KERNEL + NORMALIZE_SYMMETRIC).  That C library is neither TPU-runnable
nor installed here, so this module provides

  * ``dense_crf_exact`` — a brute-force NumPy transcription of the dense
    (all-pairs) mean-field formulation for small images: symmetric kernel
    normalisation ``m = n * (K @ (n * q))`` with ``n = 1/sqrt(K @ 1)``
    (self-interaction included, as in the permutohedral filter), Potts
    compatibility via ``energy = unary + (sum_c m - m)``.  This is the
    ground truth the TPU implementation is quantified against
    (tests/test_crf_exact.py).
  * ``DenseCRF`` — the jitted TPU implementation: the spatial Gaussian is an
    exact truncated separable blur; the bilateral term is TWO-LEVEL —
    an exact windowed sum within radius R (the high-frequency mass) plus a
    coarse-grid global pass (cell size ``coarse_stride``) for the long-range
    mass that the reference's bi_xy_std=50 kernel carries.  Both kernels are
    symmetrically normalised like the exact form.

Default compat/std parameters match the reference ctor
(iter_max=10, bi_w=7, bi_xy_std=50, bi_rgb_std=4, pos_w=3, pos_xy_std=3).
Measured vs ``dense_crf_exact`` at those parameters (48x48 random blobs):
see tests/test_crf_exact.py — mean |dQ| and argmax agreement are asserted
there and reported in PARITY.md.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------------------
# exact reference (NumPy, O(n^2) — for tests / small images)
# ---------------------------------------------------------------------------
def dense_crf_exact(image, prob_map, iter_max: int = 10, bi_w: float = 7,
                    bi_xy_std: float = 50, bi_rgb_std: float = 4,
                    pos_w: float = 3, pos_xy_std: float = 3):
    """All-pairs mean-field dense CRF.  image (H,W,3) in [0,1]; prob_map
    (H,W,C) softmax scores.  Returns refined (H,W,C) Q."""
    h, w, c = prob_map.shape
    n = h * w
    yy, xx = np.mgrid[0:h, 0:w]
    pos = np.stack([xx.ravel(), yy.ravel()], -1).astype(np.float64)

    def kernel(feats):
        d2 = ((feats[:, None, :] - feats[None, :, :]) ** 2).sum(-1)
        return np.exp(-0.5 * d2)

    k_pos = kernel(pos / pos_xy_std)
    rgb = (image.reshape(n, 3).astype(np.float64) * 255.0) / bi_rgb_std
    k_bi = kernel(np.concatenate([pos / bi_xy_std, rgb], -1))
    n_pos = 1.0 / np.sqrt(k_pos @ np.ones(n) + 1e-20)
    n_bi = 1.0 / np.sqrt(k_bi @ np.ones(n) + 1e-20)

    unary = -np.log(np.maximum(prob_map.reshape(n, c).astype(np.float64), 1e-12))
    q = prob_map.reshape(n, c).astype(np.float64)
    for _ in range(iter_max):
        m_pos = n_pos[:, None] * (k_pos @ (n_pos[:, None] * q))
        m_bi = n_bi[:, None] * (k_bi @ (n_bi[:, None] * q))
        pairwise = pos_w * m_pos + bi_w * m_bi
        energy = unary + (pairwise.sum(-1, keepdims=True) - pairwise)
        e = np.exp(-(energy - energy.min(-1, keepdims=True)))
        q = e / e.sum(-1, keepdims=True)
    return q.reshape(h, w, c).astype(np.float32)


# ---------------------------------------------------------------------------
# TPU implementation
# ---------------------------------------------------------------------------
def _gauss_kernel1d(std: float, radius: int):
    x = np.arange(-radius, radius + 1, dtype=np.float32)
    k = np.exp(-0.5 * (x / std) ** 2)
    return jnp.asarray(k)


def _separable_blur(q, std: float, radius: int):
    """q: (H, W, C); truncated Gaussian blur along H then W (self included)."""
    k = _gauss_kernel1d(std, radius)
    pad = radius
    qp = jnp.pad(q, ((pad, pad), (0, 0), (0, 0)))
    qh = sum(k[i] * qp[i:i + q.shape[0]] for i in range(2 * radius + 1))
    qp = jnp.pad(qh, ((0, 0), (pad, pad), (0, 0)))
    return sum(k[i] * qp[:, i:i + q.shape[1]] for i in range(2 * radius + 1))


def _window_bilateral(q, norm_img, xy_std: float, radius: int):
    """Windowed bilateral sum of q (self INCLUDED) over a (2R+1)^2
    neighbourhood; colour pre-scaled by rgb_std.  lax.scan over offsets."""
    offs = [(dy, dx) for dy in range(-radius, radius + 1)
            for dx in range(-radius, radius + 1)]
    dydx = jnp.asarray(offs, jnp.int32)
    spatial = jnp.asarray(
        np.exp(-0.5 * (np.asarray(offs, np.float32) ** 2).sum(-1) / (xy_std * xy_std)),
        jnp.float32)

    def step(acc, inp):
        (dy, dx), sp = inp
        q_s = jnp.roll(q, (dy, dx), axis=(0, 1))
        img_s = jnp.roll(norm_img, (dy, dx), axis=(0, 1))
        colour = jnp.exp(-0.5 * jnp.sum((norm_img - img_s) ** 2, axis=-1, keepdims=True))
        return acc + sp * colour * q_s, None

    out, _ = jax.lax.scan(step, jnp.zeros_like(q), ((dydx[:, 0], dydx[:, 1]), spatial))
    return out


def _coarse_bilateral(q, norm_img, xy_std: float, radius: int, stride: int):
    """Long-range bilateral mass from a coarse grid: each stride x stride
    cell contributes stride^2 * k_xy(x_i, X_J) * k_rgb(c_i, C_J) * mean q_J,
    with cells whose center lies within ``radius`` (already covered by the
    window) excluded.  scan over coarse cells."""
    h, w, c = q.shape
    ch, cw = h // stride, w // stride
    if ch == 0 or cw == 0:
        return jnp.zeros_like(q)

    def pool(x):
        ndim_c = x.shape[-1]
        t = x[: ch * stride, : cw * stride].reshape(ch, stride, cw, stride, ndim_c)
        return t.mean(axis=(1, 3))

    q_c = pool(q).reshape(-1, c)                     # (J, C)
    img_c = pool(norm_img).reshape(-1, norm_img.shape[-1])
    yy, xx = np.mgrid[0:ch, 0:cw]
    centers = np.stack([(yy.ravel() + 0.5) * stride - 0.5,
                        (xx.ravel() + 0.5) * stride - 0.5], -1).astype(np.float32)
    fy, fx = np.mgrid[0:h, 0:w]
    fpos = jnp.asarray(np.stack([fy, fx], -1).astype(np.float32))  # (H, W, 2)
    area = float(stride * stride)

    def step(acc, inp):
        center, cq, cimg = inp
        d2 = jnp.sum((fpos - center) ** 2, axis=-1)
        k_xy = jnp.exp(-0.5 * d2 / (xy_std * xy_std))
        # exclude the short-range zone the exact window already covers
        k_xy = jnp.where(d2 <= float(radius * radius), 0.0, k_xy)
        k_rgb = jnp.exp(-0.5 * jnp.sum((norm_img - cimg) ** 2, axis=-1))
        return acc + (area * k_xy * k_rgb)[..., None] * cq[None, None, :], None

    out, _ = jax.lax.scan(step, jnp.zeros_like(q),
                          (jnp.asarray(centers), q_c, img_c))
    return out


class DenseCRF:
    """Callable mirroring the reference surface: ``crf(image, prob_map)``
    with image (H,W,3) float [0,1] and prob_map (H,W,C) softmax scores
    (reference is CHW; here channel-last), returning refined (H,W,C) Q."""

    def __init__(self, iter_max: int = 10, bi_w: float = 7, bi_xy_std: float = 50,
                 bi_rgb_std: float = 4, pos_w: float = 3, pos_xy_std: float = 3,
                 bilateral_radius: int = 8, coarse_stride: int = 4):
        self.iter_max = iter_max
        self.bi_w = bi_w
        self.bi_xy_std = bi_xy_std
        self.bi_rgb_std = bi_rgb_std
        self.pos_w = pos_w
        self.pos_xy_std = pos_xy_std
        self.bilateral_radius = bilateral_radius
        self.coarse_stride = coarse_stride
        self._run = jax.jit(partial(self._inference))

    def _bilateral(self, q, norm_img):
        fine = _window_bilateral(q, norm_img, self.bi_xy_std, self.bilateral_radius)
        # cap the coarse grid at ~48 cells per dim so native-resolution eval
        # images (e.g. CWFID 1296x966) stay at <=~2.3k scan steps; the
        # long-range kernel (bi_xy_std=50) varies slowly enough for ~25 px
        # cells
        h, w = q.shape[:2]
        stride = max(self.coarse_stride, -(-max(h, w) // 48))
        coarse = _coarse_bilateral(q, norm_img, self.bi_xy_std,
                                   self.bilateral_radius, stride)
        return fine + coarse

    def _inference(self, image, prob_map):
        unary = -jnp.log(jnp.maximum(prob_map, 1e-12))  # unary_from_softmax
        spatial_radius = int(max(1, round(3 * self.pos_xy_std)))
        norm_img = image * 255.0 / self.bi_rgb_std
        ones = jnp.ones(prob_map.shape[:2] + (1,), prob_map.dtype)
        # symmetric kernel normalisation, as pydensecrf's NORMALIZE_SYMMETRIC
        n_pos = jax.lax.rsqrt(_separable_blur(ones, self.pos_xy_std,
                                              spatial_radius) + 1e-20)
        n_bi = jax.lax.rsqrt(self._bilateral(ones, norm_img) + 1e-20)

        def body(_, q):
            m_pos = n_pos * _separable_blur(n_pos * q, self.pos_xy_std, spatial_radius)
            m_bi = n_bi * self._bilateral(n_bi * q, norm_img)
            pairwise = self.pos_w * m_pos + self.bi_w * m_bi
            # Potts compatibility: other-label message mass raises the energy
            energy = unary + (jnp.sum(pairwise, axis=-1, keepdims=True) - pairwise)
            return jax.nn.softmax(-energy, axis=-1)

        return jax.lax.fori_loop(0, self.iter_max, body, prob_map)

    def __call__(self, image, prob_map):
        image = jnp.asarray(image, jnp.float32)
        prob_map = jnp.asarray(prob_map, jnp.float32)
        return self._run(image, prob_map)
