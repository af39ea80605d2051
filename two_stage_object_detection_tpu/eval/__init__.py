from two_stage_object_detection_tpu.eval.metrics import (  # noqa: F401
    compute_ap, compute_coco_summary, compute_map, filter_pr)
