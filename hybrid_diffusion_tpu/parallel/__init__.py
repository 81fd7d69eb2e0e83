from .distributed import maybe_initialize, process_info
from .mesh import make_mesh, local_device_count
from .sharding import (
    batch_sharding,
    param_shardings,
    shard_batch,
    shard_state,
    shard_params,
    state_shardings,
    make_sharded_train_step,
    make_sharded_sampler,
)
