from two_stage_object_detection_tpu.data.coco import (  # noqa: F401
    CocoIndex, load_coco)
from two_stage_object_detection_tpu.data.pipeline import (  # noqa: F401
    DetectionDataset, Loader)
