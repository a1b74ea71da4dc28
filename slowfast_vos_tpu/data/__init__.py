from slowfast_vos_tpu.data.davis import DavisIndex, load_sequence  # noqa: F401
from slowfast_vos_tpu.data.windows import train_windows  # noqa: F401
