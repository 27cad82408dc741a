"""End-to-end training on the synthetic dataset: the full trainer loop
(loader -> jitted step -> meters -> checkpoint) with zero I/O."""

import glob
import os

import numpy as np

from slowfast_tpu.config import get_cfg
from slowfast_tpu.config.defaults import assert_and_infer_cfg


def test_train_quickstart_synthetic(tmp_path):
    cfg = get_cfg()
    cfg.merge_from_file("configs/synthetic/QUICKSTART_C2D.yaml")
    cfg.OUTPUT_DIR = str(tmp_path)
    cfg.TRAIN.BATCH_SIZE = 8
    cfg.DATA.NUM_FRAMES = 4
    cfg.DATA.TRAIN_CROP_SIZE = 32
    cfg.DATA.TEST_CROP_SIZE = 32
    cfg.MODEL.NUM_CLASSES = 4
    cfg.SOLVER.MAX_EPOCH = 1
    cfg.DATA_LOADER.NUM_WORKERS = 2
    cfg.TPU.COMPUTE_DTYPE = "float32"
    cfg = assert_and_infer_cfg(cfg)
    # Shrink the synthetic set so one epoch is a few steps.
    cfg.DATA.SYNTHETIC_SIZE = 32

    from slowfast_tpu.engine.trainer import train

    state = train(cfg)
    assert int(state.step) == 4  # 32 samples / batch 8
    # Checkpoint written at epoch 1.
    ckpts = glob.glob(os.path.join(str(tmp_path), "checkpoints", "*"))
    assert ckpts, "no checkpoint written"


def test_synthetic_dataset_shapes():
    cfg = get_cfg()
    cfg.MODEL.ARCH = "slowfast"
    cfg.MODEL.NUM_CLASSES = 7
    cfg.SLOWFAST.ALPHA = 4
    cfg.DATA.NUM_FRAMES = 8
    cfg.DATA.TRAIN_CROP_SIZE = 32
    cfg.DATA.INPUT_CHANNEL_NUM = [3, 3]
    from slowfast_tpu.data.build import build_dataset

    ds = build_dataset("syntheticvideo", cfg, "train")
    inputs, label, index, _, _ = ds[3]
    assert len(inputs) == 2  # slow + fast pathways
    assert inputs[0].shape == (2, 32, 32, 3)
    assert inputs[1].shape == (8, 32, 32, 3)
    assert 0 <= label < 7 and index == 3
    # Deterministic: same index -> identical pixels and label.
    again, label2, *_ = ds[3]
    np.testing.assert_array_equal(inputs[1], again[1])
    assert label2 == label
