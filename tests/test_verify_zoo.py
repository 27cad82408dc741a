"""Tests for the model-zoo verification tool (tools/verify_zoo.py).

No released weights are available in this environment, so these validate
the runnable protocol: every zoo entry builds its eval config with the
documented views/crops, and the tool's eval path runs end to end on the
synthetic dataset (random init) producing top-1/top-5 stats.
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")

from tools.verify_zoo import ZOO, build_cfg  # noqa: E402


@pytest.mark.parametrize("name", sorted(ZOO))
def test_zoo_entry_builds_eval_cfg(name):
    cfg = build_cfg(name, "ckpt.pyth", "/data")
    entry = ZOO[name]
    assert cfg.TEST.NUM_ENSEMBLE_VIEWS == entry["views"]
    assert cfg.TEST.NUM_SPATIAL_CROPS == entry["crops"]
    assert cfg.TEST.CHECKPOINT_TYPE == entry["ckpt_type"]
    assert not cfg.TRAIN.ENABLE and cfg.TEST.ENABLE
    # Expected numbers present for the pass/fail gate.
    assert entry["top1"] is not None


def test_protocol_runs_end_to_end(tmp_path):
    """The verification protocol executes on synthetic data: multi-view
    ensembling, meter finalize, top-k stats (random init => chance-level)."""
    cfg = build_cfg(
        "C2D_NOPOOL_8x8_R50", "", str(tmp_path),
        batch=4,
        opts=[
            "RESNET.DEPTH", "18",
            "RESNET.NUM_BLOCK_TEMP_KERNEL", "[[2],[2],[2],[2]]",
            "DATA.NUM_FRAMES", "4",
            "DATA.TEST_CROP_SIZE", "64",
            "TEST.DATASET", "syntheticvideo",
            "DATA.SYNTHETIC_SIZE", "4",
            "TEST.NUM_ENSEMBLE_VIEWS", "2",
            "TEST.NUM_SPATIAL_CROPS", "1",
            "MODEL.NUM_CLASSES", "16",
            "TPU.COMPUTE_DTYPE", "float32",
            "OUTPUT_DIR", str(tmp_path),
            "DATA_LOADER.NUM_WORKERS", "0",
        ],
    )
    from slowfast_tpu.engine.tester import test

    stats = test(cfg)[0]
    assert "top1_acc" in stats and "top5_acc" in stats
    assert np.isfinite(float(stats["top1_acc"]))
