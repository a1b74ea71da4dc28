from slowfast_vos_tpu.convert.torchvision_weights import (  # noqa: F401
    convert_state_dict,
    load_torch_checkpoint,
)
