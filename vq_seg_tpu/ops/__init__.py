from vq_seg_tpu.ops.kmeans import kmeans  # noqa: F401
from vq_seg_tpu.ops.vq import code_usage_percent, vq_assign, vq_assign_xla  # noqa: F401
