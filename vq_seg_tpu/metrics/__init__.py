from vq_seg_tpu.metrics.measurement import (  # noqa: F401
    Measurement,
    accuracy,
    confusion_matrix,
    f1score,
    miou,
    precision,
    recall,
)
