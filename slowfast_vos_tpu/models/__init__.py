from slowfast_vos_tpu.models.resnet_fpn import ResNet50FPN  # noqa: F401
from slowfast_vos_tpu.models.slowfast import SlowFastTemporal  # noqa: F401
