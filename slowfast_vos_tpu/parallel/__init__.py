from slowfast_vos_tpu.parallel.mesh import make_mesh  # noqa: F401
from slowfast_vos_tpu.parallel.sharded import (  # noqa: F401
    make_sharded_train_step,
    replicate_state,
    shard_windows,
)
