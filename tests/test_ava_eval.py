"""AVA mAP evaluator known-answer tests."""

import numpy as np

from slowfast_tpu.utils.ava_eval import (
    compute_average_precision,
    evaluate_detections,
    _iou_matrix,
)


def test_iou_matrix():
    a = np.array([[0, 0, 10, 10]], np.float64)
    b = np.array([[0, 0, 10, 10], [5, 5, 15, 15], [20, 20, 30, 30]], np.float64)
    iou = _iou_matrix(a, b)[0]
    np.testing.assert_allclose(iou, [1.0, 25.0 / 175.0, 0.0])


def test_perfect_detection_ap_is_one():
    gt_boxes = {"v,0001": [[0.1, 0.1, 0.5, 0.5]]}
    gt_labels = {"v,0001": [1]}
    det_boxes = {"v,0001": [[0.1, 0.1, 0.5, 0.5]]}
    det_labels = {"v,0001": [1]}
    det_scores = {"v,0001": [0.9]}
    aps = evaluate_detections(
        gt_boxes, gt_labels, det_boxes, det_labels, det_scores, [1]
    )
    assert aps[1] == 1.0


def test_half_recall():
    # Two GT boxes, only one detected -> AP = 0.5 with perfect precision.
    gt_boxes = {"v,0001": [[0.0, 0.0, 0.2, 0.2], [0.5, 0.5, 0.9, 0.9]]}
    gt_labels = {"v,0001": [1, 1]}
    det_boxes = {"v,0001": [[0.0, 0.0, 0.2, 0.2]]}
    det_labels = {"v,0001": [1]}
    det_scores = {"v,0001": [0.9]}
    aps = evaluate_detections(
        gt_boxes, gt_labels, det_boxes, det_labels, det_scores, [1]
    )
    assert abs(aps[1] - 0.5) < 1e-9


def test_false_positive_lowers_ap():
    gt_boxes = {"v,0001": [[0.0, 0.0, 0.2, 0.2]]}
    gt_labels = {"v,0001": [1]}
    # One correct detection (lower score) + one FP (higher score).
    det_boxes = {"v,0001": [[0.7, 0.7, 0.9, 0.9], [0.0, 0.0, 0.2, 0.2]]}
    det_labels = {"v,0001": [1, 1]}
    det_scores = {"v,0001": [0.95, 0.9]}
    aps = evaluate_detections(
        gt_boxes, gt_labels, det_boxes, det_labels, det_scores, [1]
    )
    # Precision at the hit = 1/2, recall 1 -> AP = 0.5.
    assert abs(aps[1] - 0.5) < 1e-9


def test_duplicate_detection_is_fp():
    gt_boxes = {"v,0001": [[0.0, 0.0, 0.2, 0.2]]}
    gt_labels = {"v,0001": [1]}
    det_boxes = {"v,0001": [[0.0, 0.0, 0.2, 0.2], [0.0, 0.0, 0.2, 0.2]]}
    det_labels = {"v,0001": [1, 1]}
    det_scores = {"v,0001": [0.9, 0.8]}
    aps = evaluate_detections(
        gt_boxes, gt_labels, det_boxes, det_labels, det_scores, [1]
    )
    assert aps[1] == 1.0  # first matches; duplicate FP after full recall


def test_ap_computation_matches_sklearn_shape():
    precision = np.array([1.0, 0.5, 2.0 / 3.0])
    recall = np.array([0.5, 0.5, 1.0])
    ap = compute_average_precision(precision, recall)
    assert 0.0 < ap <= 1.0
