from vq_seg_tpu.parallel.mesh import (  # noqa: F401
    batch_sharding,
    make_mesh,
    replicated,
    shard_batch_fn,
)
from vq_seg_tpu.parallel.zero import (  # noqa: F401
    opt_bytes_per_chip,
    shard_opt_state,
    zero_opt_shardings,
)
