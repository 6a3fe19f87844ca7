"""Trainers + schedules.

  * ``cps``        — the flagship Cross-Pseudo-Supervision loop (fused step)
  * ``supervised`` — supervised loop (deprecated/train_sup.py semantics)
  * ``selfsup``    — VQ-VAE codebook pretraining
  * ``variants``   — plain CPS, UniMatch, salient-loss CPS steps
  * ``schedules``  — stateless LR schedules (reference lr_schedulers.py)
  * ``sweep``      — hyper-parameter search driver (optuna replacement)
"""
from vq_seg_tpu.training.schedules import (  # noqa: F401
    cosine_annealing,
    make_lr_schedule,
    warmup_poly,
)
