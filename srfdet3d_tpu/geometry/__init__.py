from .boxes import (
    normalize_bbox,
    denormalize_bbox,
    boxes3d_to_corners3d,
    bev_corners,
)
from .iou import (
    rotated_iou_bev,
    iou_3d,
    rotated_nms_bev,
    multiclass_nms_3d,
)
