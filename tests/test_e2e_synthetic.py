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


def test_precise_bn_and_tensorboard_wired(tmp_path):
    """BN.USE_PRECISE_STATS must actually change batch_stats at the eval
    cadence, and TENSORBOARD.ENABLE must produce event files — both wired
    into the epoch loop (reference train_net.py:604-607, 698-710)."""
    import jax

    cfg = get_cfg()
    cfg.merge_from_file("configs/synthetic/QUICKSTART_C2D.yaml")
    cfg.OUTPUT_DIR = str(tmp_path)
    cfg.TRAIN.BATCH_SIZE = 8
    cfg.DATA.NUM_FRAMES = 4
    cfg.DATA.TRAIN_CROP_SIZE = 32
    cfg.DATA.TEST_CROP_SIZE = 32
    cfg.MODEL.NUM_CLASSES = 4
    cfg.SOLVER.MAX_EPOCH = 1
    cfg.SOLVER.BASE_LR = 1e-8  # ~frozen params: precise-BN dominates stats
    cfg.SOLVER.WARMUP_EPOCHS = 0.0
    cfg.DATA_LOADER.NUM_WORKERS = 2
    cfg.TPU.COMPUTE_DTYPE = "float32"
    cfg.BN.USE_PRECISE_STATS = True
    cfg.BN.NUM_BATCHES_PRECISE = 2
    cfg.TENSORBOARD.ENABLE = True
    cfg = assert_and_infer_cfg(cfg)
    cfg.DATA.SYNTHETIC_SIZE = 16

    from slowfast_tpu.engine.trainer import train

    # Run once without precise BN for the baseline stats.
    import copy

    cfg_base = copy.deepcopy(cfg)
    cfg_base.BN.USE_PRECISE_STATS = False
    cfg_base.TENSORBOARD.ENABLE = False
    cfg_base.OUTPUT_DIR = str(tmp_path / "base")
    os.makedirs(cfg_base.OUTPUT_DIR, exist_ok=True)
    state_base = train(cfg_base)

    state = train(cfg)
    diffs = [
        float(np.abs(np.asarray(a) - np.asarray(b)).max())
        for a, b in zip(
            jax.tree_util.tree_leaves(state.batch_stats),
            jax.tree_util.tree_leaves(state_base.batch_stats),
        )
    ]
    assert max(diffs) > 1e-6, "precise-BN did not change batch stats"
    event_files = glob.glob(
        os.path.join(str(tmp_path), "runs-*", "events.out.tfevents.*")
    )
    assert event_files, "no tensorboard event files written"


def test_repeated_augmentation_num_sample(tmp_path):
    """AUG.NUM_SAMPLE=2 trains end to end: each dataset item contributes
    NUM_SAMPLE independently-augmented clips flattened into the batch
    (reference loader.py:20-45 multiple_samples_collate)."""
    cfg = get_cfg()
    cfg.merge_from_file("configs/synthetic/QUICKSTART_C2D.yaml")
    cfg.OUTPUT_DIR = str(tmp_path)
    cfg.TRAIN.BATCH_SIZE = 4
    cfg.DATA.NUM_FRAMES = 4
    cfg.DATA.TRAIN_CROP_SIZE = 32
    cfg.DATA.TEST_CROP_SIZE = 32
    cfg.MODEL.NUM_CLASSES = 4
    cfg.SOLVER.MAX_EPOCH = 1
    cfg.DATA_LOADER.NUM_WORKERS = 2
    cfg.TPU.COMPUTE_DTYPE = "float32"
    cfg.AUG.ENABLE = True
    cfg.AUG.NUM_SAMPLE = 2
    cfg = assert_and_infer_cfg(cfg)
    cfg.DATA.SYNTHETIC_SIZE = 8

    from slowfast_tpu.data import construct_loader

    loader = construct_loader(cfg, "train")
    inputs, labels, index, times, meta = next(iter(loader))
    # 4 items x 2 samples = 8 rows, duplicated labels/indices pairwise.
    assert inputs[0].shape[0] == 8
    assert labels.shape[0] == 8
    np.testing.assert_array_equal(labels[0::2], labels[1::2])
    np.testing.assert_array_equal(index[0::2], index[1::2])

    from slowfast_tpu.engine.trainer import train

    state = train(cfg)
    assert int(state.step) == 2  # 8 samples / batch 4


def test_synthetic_dataset_shapes():
    cfg = get_cfg()
    cfg.MODEL.ARCH = "slowfast"
    cfg.MODEL.NUM_CLASSES = 7
    cfg.SLOWFAST.ALPHA = 4
    cfg.DATA.NUM_FRAMES = 8
    cfg.DATA.TRAIN_CROP_SIZE = 32
    cfg.DATA.INPUT_CHANNEL_NUM = [3, 3]
    from slowfast_tpu.data.build import build_dataset

    # uint8 pipeline (default): ONE uint8 clip; the device splits pathways.
    ds = build_dataset("syntheticvideo", cfg, "train")
    inputs, label, index, _, _ = ds[3]
    assert len(inputs) == 1
    assert inputs[0].shape == (8, 32, 32, 3)
    assert inputs[0].dtype == np.uint8
    assert 0 <= label < 7 and index == 3
    again, label2, *_ = ds[3]
    np.testing.assert_array_equal(inputs[0], again[0])
    assert label2 == label

    # float path: normalized slow+fast pathways on host.
    cfg.TPU.UINT8_PIPELINE = False
    ds = build_dataset("syntheticvideo", cfg, "train")
    inputs, label, index, _, _ = ds[3]
    assert len(inputs) == 2  # slow + fast pathways
    assert inputs[0].shape == (2, 32, 32, 3)
    assert inputs[1].shape == (8, 32, 32, 3)


def test_chunked_csv_loading(tmp_path):
    """DATA.LOADER_CHUNK_SIZE keeps only a csv slice resident and SKIP_ROWS
    selects the slice (reference kinetics.py:159-172)."""
    csv = tmp_path / "train.csv"
    csv.write_text("".join(f"video_{i}.mp4 {i}\n" for i in range(6)))
    cfg = get_cfg()
    cfg.DATA.PATH_TO_DATA_DIR = str(tmp_path)
    cfg.DATA.LOADER_CHUNK_SIZE = 2
    cfg.DATA.LOADER_CHUNK_OVERALL_SIZE = 6

    from slowfast_tpu.data.kinetics import Kinetics

    ds = Kinetics(cfg, "train")
    assert len(ds) == 2
    assert ds._labels == [0, 1]

    cfg.DATA.SKIP_ROWS = 4
    ds = Kinetics(cfg, "train")
    assert ds._labels == [4, 5]
