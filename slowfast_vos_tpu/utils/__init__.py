from slowfast_vos_tpu.utils.metrics import MetricsLogger  # noqa: F401
from slowfast_vos_tpu.utils.checkpoint import save_checkpoint, restore_checkpoint  # noqa: F401
