from two_stage_object_detection_tpu.nets.rpn import (  # noqa: F401
    RPNHead, create_proposals)
from two_stage_object_detection_tpu.nets.roi_head import RoIHead  # noqa: F401
from two_stage_object_detection_tpu.nets.targets import (  # noqa: F401
    anchor_target, proposal_target)
from two_stage_object_detection_tpu.nets.losses import (  # noqa: F401
    fast_rcnn_loc_loss, softmax_cross_entropy_with_ignore)
from two_stage_object_detection_tpu.nets.detector import FasterRCNN  # noqa: F401
