from vq_seg_tpu.utils import seg_tools  # noqa: F401
from vq_seg_tpu.utils.seed import seed_everything  # noqa: F401
