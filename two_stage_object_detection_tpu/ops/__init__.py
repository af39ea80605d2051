from two_stage_object_detection_tpu.ops.geometry import (  # noqa: F401
    bbox_iou,
    bbox2loc,
    loc2bbox,
    xywh2xyxy,
    clip_boxes,
)
from two_stage_object_detection_tpu.ops.anchors import (  # noqa: F401
    generate_basic_anchor,
    enumerate_shifted_anchor,
)
from two_stage_object_detection_tpu.ops.nms import nms, nms_padded  # noqa: F401
from two_stage_object_detection_tpu.ops.roi_pool import roi_pool, roi_align  # noqa: F401
