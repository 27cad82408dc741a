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
