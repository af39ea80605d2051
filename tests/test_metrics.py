import numpy as np

from two_stage_object_detection_tpu.eval.metrics import (
    compute_ap, compute_map, filter_pr)


def test_filter_pr_and_compute_ap_worked_example():
    """The reference's own worked PR example (utils/utils.py:41-61)."""
    x = np.array([
        [0.5, 5 / 7],
        [0.44, 4 / 7],
        [0.375, 3 / 7],
        [0.43, 3 / 7],
        [0.5, 3 / 7],
        [0.4, 2 / 7],
        [0.5, 2 / 7],
        [0.66, 2 / 7],
        [1, 2 / 7],
        [1, 1 / 7],
    ], np.float32)
    pr = filter_pr(x, 7)
    assert pr.shape == (8, 2)
    # recall levels descend from 1 to 0
    np.testing.assert_allclose(pr[:, 1], np.arange(7, -1, -1) / 7)
    # precision at recall 5/7 is 0.5; at 2/7 the max is 1.0
    assert pr[2, 0] == np.float32(0.5)
    assert pr[5, 0] == np.float32(1.0)
    ap = compute_ap(pr)
    assert 0 < ap <= 1


def test_compute_ap_perfect_detector():
    pr = np.array([[1.0, 1.0], [1.0, 0.5], [1.0, 0.0]], np.float32)
    assert compute_ap(pr) == 1.0


def test_compute_ap_empty():
    assert compute_ap(np.zeros((0, 2))) == 0.0


def _one_image(pred_boxes, pred_scores, pred_labels, gt_boxes, gt_labels):
    return ([(np.asarray(pred_boxes, np.float32),
              np.asarray(pred_scores, np.float32),
              np.asarray(pred_labels))],
            [(np.asarray(gt_boxes, np.float32), np.asarray(gt_labels))])


def test_map_perfect_match():
    preds, gts = _one_image(
        [[0, 0, 10, 10], [20, 20, 30, 30]], [0.9, 0.8], [1, 2],
        [[0, 0, 10, 10], [20, 20, 30, 30]], [1, 2])
    res = compute_map(preds, gts, num_classes=2, iou_threshold=0.5)
    assert res["mAP"] == 1.0
    assert res["class_metrics"][1]["TP"] == 1
    assert res["class_metrics"][2]["TP"] == 1


def test_map_wrong_class_is_fp_and_fn():
    preds, gts = _one_image(
        [[0, 0, 10, 10]], [0.9], [2],
        [[0, 0, 10, 10]], [1])
    res = compute_map(preds, gts, num_classes=2, iou_threshold=0.5)
    assert res["mAP"] == 0.0
    assert res["class_metrics"][1]["FN"] == 1
    assert res["class_metrics"][2]["FP"] == 1


def test_map_gt_matched_once():
    """Duplicate detections of one GT: only the best is a TP."""
    preds, gts = _one_image(
        [[0, 0, 10, 10], [0.5, 0, 10, 10], [1, 0, 10, 10]],
        [0.9, 0.8, 0.7], [1, 1, 1],
        [[0, 0, 10, 10]], [1])
    res = compute_map(preds, gts, num_classes=1, iou_threshold=0.5)
    m = res["class_metrics"][1]
    assert m["TP"] == 1 and m["FP"] == 2 and m["FN"] == 0
    # AP = 1: the TP is the highest-scoring prediction
    assert res["mAP"] == 1.0


def test_map_classes_without_gt_excluded():
    """A class with predictions but no GT anywhere must not drag mAP to 0
    by itself (fixes the reference's append-0 defect)."""
    preds, gts = _one_image(
        [[0, 0, 10, 10], [50, 50, 60, 60]], [0.9, 0.8], [1, 2],
        [[0, 0, 10, 10]], [1])
    res = compute_map(preds, gts, num_classes=5, iou_threshold=0.5)
    assert res["mAP"] == 1.0  # only class 1 has GT; it is perfectly detected


def test_map_threshold_sensitivity():
    preds, gts = _one_image(
        [[0, 0, 10, 10]], [0.9], [1],
        [[0, 0, 10, 12]], [1])  # IoU = 10/12 ~ 0.833
    hi = compute_map(preds, gts, 1, iou_threshold=0.9)["mAP"]
    lo = compute_map(preds, gts, 1, iou_threshold=0.5)["mAP"]
    assert lo == 1.0 and hi == 0.0


def test_map_multiple_images():
    p1, g1 = _one_image([[0, 0, 10, 10]], [0.9], [1], [[0, 0, 10, 10]], [1])
    p2, g2 = _one_image([[5, 5, 9, 9]], [0.8], [1], [[0, 0, 10, 10]], [1])
    res = compute_map(p1 + p2, g1 + g2, 1, iou_threshold=0.5)
    m = res["class_metrics"][1]
    assert m["TP"] == 1 and m["FP"] == 1 and m["FN"] == 1
    # precision at recall .5 is 1 (highest-scoring pred is the TP)
    assert 0.4 < res["mAP"] <= 0.5 + 1e-6


# ----------------------------------------------------------- COCO summary
def _one(boxes, scores, labels):
    import numpy as np
    return (np.asarray(boxes, np.float32), np.asarray(scores, np.float32),
            np.asarray(labels, np.int64))


def _gt(boxes, labels):
    import numpy as np
    return (np.asarray(boxes, np.float32), np.asarray(labels, np.int64))


def test_coco_summary_perfect():
    import numpy as np
    from two_stage_object_detection_tpu.eval.metrics import compute_coco_summary
    preds = [_one([[10, 10, 50, 50]], [0.9], [1])]
    gts = [_gt([[10, 10, 50, 50]], [1])]
    s = compute_coco_summary(preds, gts, num_classes=1)
    assert s["AP"] == 1.0 and s["AP50"] == 1.0 and s["AP75"] == 1.0
    assert s["AR1"] == 1.0 and s["AR100"] == 1.0
    # 40x40 = 1600 px^2 -> medium bin only
    assert s["APmedium"] == 1.0 and s["APsmall"] == 0.0 and s["APlarge"] == 0.0


def test_coco_summary_area_bins_and_ignore():
    import numpy as np
    from two_stage_object_detection_tpu.eval.metrics import compute_coco_summary
    # small GT (16x16=256), large GT (100x100); only the large is detected
    preds = [_one([[0, 0, 100, 100]], [0.9], [1])]
    gts = [_gt([[0, 0, 16, 16], [0, 0, 100, 100]], [1, 1])]
    s = compute_coco_summary(preds, gts, num_classes=1)
    assert s["APlarge"] == 1.0
    assert s["APsmall"] == 0.0
    # in the small bin the large GT is IGNORED: the detection matches it and
    # is dropped, so it must not count as a small-bin false positive
    # (it would drag APsmall's precision but APsmall is 0 only for recall)
    assert s["ARsmall"] == 0.0 and s["ARlarge"] == 1.0
    # overall: 1 of 2 GTs found
    assert 0.4 < s["AR100"] <= 0.5


def test_coco_summary_det_side_ignore():
    """An unmatched detection whose own area is outside the bin is dtIg,
    not an FP (advisor round-2: a spurious small det must not drag APlarge)."""
    from two_stage_object_detection_tpu.eval.metrics import compute_coco_summary
    # second det: 10x10=100 px^2, matches nothing
    preds = [_one([[0, 0, 100, 100], [200, 200, 210, 210]], [0.9, 0.95], [1, 1])]
    gts = [_gt([[0, 0, 100, 100]], [1])]
    s = compute_coco_summary(preds, gts, num_classes=1)
    # large bin: the small unmatched det is ignored -> perfect AP
    assert s["APlarge"] == 1.0
    # overall bin: the small det IS in range -> counts as FP, higher-scored
    assert s["AP"] < 1.0


def test_coco_summary_nonignored_gt_first():
    """A higher-IoU ignored GT must not block an above-threshold match to a
    non-ignored GT (pycocotools non-ignored-first ordering)."""
    from two_stage_object_detection_tpu.eval.metrics import compute_coco_summary
    det = [0.0, 0.0, 120.0, 120.0]
    gt_a = [0.0, 0.0, 90.0, 90.0]           # IoU with det = 8100/14400 = .5625
    gt_b = [0.0, 0.0, 120.0, 120.0]         # IoU with det = 1.0, area 14400
    preds = [_one([det], [0.9], [1])]
    gts = [_gt([gt_b, gt_a], [1, 1])]
    # medium bin (32^2..96^2): gt_a in range, gt_b ignored (14400 > 9216).
    # det IoU 1.0 with ignored gt_b, 0.5625 with in-range gt_a: the match
    # must go to gt_a -> ARmedium recalls it at IoU thresholds <= 0.55.
    s = compute_coco_summary(preds, gts, num_classes=1,
                             iou_thresholds=[0.5])
    assert s["ARmedium"] == 1.0


def test_coco_summary_maxdets():
    import numpy as np
    from two_stage_object_detection_tpu.eval.metrics import compute_coco_summary
    # two GTs, two good detections; AR1 can only recall one
    preds = [_one([[0, 0, 50, 50], [60, 60, 100, 100]], [0.9, 0.8], [1, 1])]
    gts = [_gt([[0, 0, 50, 50], [60, 60, 100, 100]], [1, 1])]
    s = compute_coco_summary(preds, gts, num_classes=1, max_dets=(1, 10, 100))
    assert s["AR1"] == 0.5
    assert s["AR10"] == 1.0 and s["AR100"] == 1.0
