from .mesh import batch_sharding, initialize_distributed, make_mesh, replicated  # noqa: F401
from .dp import (  # noqa: F401
    make_dp_eval_step,
    make_dp_predict_fn,
    make_dp_train_step,
    shard_batch_to_mesh,
    stack_shards,
)
from .ep import (  # noqa: F401
    make_ep_apply,
    make_ep_loss_and_grad,
    partition_batch,
    shard_ep_batch,
)
from .halo import (  # noqa: F401
    HaloPads,
    build_halo_partition,
    estimate_halo_pads,
    make_halo_apply,
    make_halo_eval_step,
    make_halo_loss_and_grad,
    make_halo_train_step,
    shard_halo_batch,
)
from .hybrid import (  # noqa: F401
    build_dp_halo_batch,
    build_hybrid_batch,
    make_dp_halo_eval_step,
    make_dp_halo_loss_and_grad,
    make_dp_halo_train_step,
    make_hybrid_loss_and_grad,
    make_hybrid_mesh,
    shard_dp_halo_batch,
    shard_hybrid_batch,
)
from .pp import (  # noqa: F401
    make_pp_energy_and_forces,
    make_pp_loss_and_grad,
    merge_pp_variables,
    split_pp_variables,
    stack_microbatches,
)
from .tp import (  # noqa: F401
    make_tp_energy_and_forces,
    make_tp_loss_and_grad,
    shard_tp_variables,
    tp_param_specs,
)
