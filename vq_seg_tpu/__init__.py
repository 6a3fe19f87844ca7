"""vq_seg_tpu — a TPU-native framework for VQ semi-supervised semantic segmentation.

A ground-up JAX / Flax / pjit / Pallas re-design of the capabilities of the
reference PyTorch research codebase ``chaeyeongyun/VQ_SEG`` (semi-supervised
crop/weed segmentation with per-stage vector-quantized U-Nets, class-prototype
angular-margin losses and Cross-Pseudo-Supervision training).

Design stance (TPU-first, not a port):
  * everything on the compute path is a pure function under ``jax.jit``
  * models are Flax Linen modules in NHWC layout (TPU-native conv layout)
  * the VQ codebook lookup (pairwise distance -> argmin -> gather -> usage)
    is a fused Pallas TPU kernel with an XLA fallback (``vq_seg_tpu.ops``)
  * stateful reference behaviours (lazy k-means codebook init, in-place
    l2 re-normalisation of prototype weights) become explicit functional
    state transitions executed by the trainer
  * scaling is a ``jax.sharding.Mesh`` with ``data`` / ``model`` axes;
    collectives are inserted by XLA GSPMD (no comm library)
"""

__version__ = "0.1.0"

from vq_seg_tpu.config import Config, load_config

__all__ = ["Config", "load_config", "Predictor", "__version__"]


def __getattr__(name):
    # lazy: serving pulls in model registries; keep bare config imports light
    if name == "Predictor":
        from vq_seg_tpu.serving import Predictor
        return Predictor
    raise AttributeError(name)
