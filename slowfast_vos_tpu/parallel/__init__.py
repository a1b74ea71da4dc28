from slowfast_vos_tpu.parallel.distributed import (  # noqa: F401
    get_rank,
    get_world_size,
    init_distributed_mode,
    is_main_process,
    local_batch_slice,
    save_on_master,
)
from slowfast_vos_tpu.parallel.dp_infer import (  # noqa: F401
    DeviceParallelInference,
    infer_mesh,
)
from slowfast_vos_tpu.parallel.mesh import make_mesh  # noqa: F401
from slowfast_vos_tpu.parallel.sharded import (  # noqa: F401
    make_sharded_train_step,
    replicate_state,
    shard_windows,
)
