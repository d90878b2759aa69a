from .mesh import batch_sharding, initialize_distributed, make_mesh, replicated  # noqa: F401
from .dp import (  # noqa: F401
    make_dp_eval_step,
    make_dp_train_step,
    shard_batch_to_mesh,
    stack_shards,
)
