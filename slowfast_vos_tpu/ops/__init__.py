from slowfast_vos_tpu.ops.boxes import (  # noqa: F401
    box_area,
    box_iou,
    clip_boxes,
    encode_boxes,
    decode_boxes,
    remove_small_boxes_mask,
)
from slowfast_vos_tpu.ops.nms import nms_mask, batched_nms_mask  # noqa: F401
from slowfast_vos_tpu.ops.roi_align import roi_align, multiscale_roi_align  # noqa: F401
from slowfast_vos_tpu.ops.paste_masks import paste_masks_in_image  # noqa: F401
