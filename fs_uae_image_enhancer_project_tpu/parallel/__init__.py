from .mesh import (  # noqa: F401
    accum_batch_sharding,
    batch_sharding,
    make_mesh,
    replicate,
    replicated,
    shard_batch,
)
from .train_step import (  # noqa: F401
    TrainState,
    init_train_state,
    make_optimizer,
    make_train_step,
    merge_bn_buffers,
    split_bn_buffers,
)
