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


def test_mini_groundtruth_subsamples_sec_mod_4(tmp_path):
    """Val-during-training evaluates against the sec%4==0 mini GT; final
    test (and FULL_TEST_ON_VAL) keeps the full GT (reference
    meters.py:28-43, VERDICT r2 missing #5)."""
    from slowfast_tpu.utils import ava_eval

    csv = tmp_path / "gt.csv"
    rows = []
    for sec in (900, 901, 902, 903, 904, 908):
        rows.append(f"vid1,{sec:04d},0.1,0.1,0.5,0.5,1,1")
    csv.write_text("".join(r + "\n" for r in rows))

    full = ava_eval.read_csv(str(csv), class_whitelist={1})
    assert len(full[0]) == 6
    mini = ava_eval.get_ava_mini_groundtruth(full)
    assert set(mini[0].keys()) == {"vid1,0900", "vid1,0904", "vid1,0908"}
    for i in range(3):
        for key in mini[i]:
            assert mini[i][key] == full[i][key]


def test_avameter_uses_mini_gt_for_val(tmp_path):
    from slowfast_tpu.config import get_cfg
    from slowfast_tpu.utils.meters import AVAMeter

    ann = tmp_path / "ann"
    ann.mkdir()
    (ann / "label_map.pbtxt").write_text(
        'item {\n  name: "stand"\n  id: 1\n}\n'
    )
    gt_rows = [
        "vid1,0900,0.1,0.1,0.5,0.5,1,1",
        "vid1,0901,0.1,0.1,0.5,0.5,1,1",
    ]
    (ann / "gt.csv").write_text("\n".join(gt_rows) + "\n")

    cfg = get_cfg()
    cfg.AVA.ANNOTATION_DIR = str(ann)
    cfg.AVA.LABEL_MAP_FILE = "label_map.pbtxt"
    cfg.AVA.GROUNDTRUTH_FILE = "gt.csv"
    cfg.AVA.EXCLUSION_FILE = "none.csv"
    cfg.OUTPUT_DIR = str(tmp_path)

    val = AVAMeter(10, cfg, mode="val")
    assert set(val.groundtruth[0].keys()) == {"vid1,0900"}  # sec%4==0 only
    test = AVAMeter(10, cfg, mode="test")
    assert set(test.groundtruth[0].keys()) == {"vid1,0900", "vid1,0901"}
    cfg.AVA.FULL_TEST_ON_VAL = True
    val_full = AVAMeter(10, cfg, mode="val")
    assert set(val_full.groundtruth[0].keys()) == {"vid1,0900", "vid1,0901"}
