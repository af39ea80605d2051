from two_stage_object_detection_tpu.models.hardnet import (  # noqa: F401
    HarDNetFeatureExtraction,
    GlobalAvgPoolClassifier,
)
from two_stage_object_detection_tpu.models.resnet import (  # noqa: F401
    ResNetFeatureExtraction,
)
from two_stage_object_detection_tpu.models.registry import build_backbone  # noqa: F401
