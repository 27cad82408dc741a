"""Multigrid schedule tests against reference semantics."""

import numpy as np
import pytest

from slowfast_tpu.config import get_cfg
from slowfast_tpu.utils.multigrid import (
    MultigridSchedule,
    get_current_long_cycle_shape,
)


def _mg_cfg():
    cfg = get_cfg()
    cfg.MULTIGRID.LONG_CYCLE = True
    cfg.SOLVER.STEPS = [0, 16, 24, 28]
    cfg.SOLVER.LRS = [1, 0.1, 0.01, 0.001]
    cfg.SOLVER.MAX_EPOCH = 32
    cfg.SOLVER.LR_POLICY = "steps_with_relative_lrs"
    cfg.TRAIN.BATCH_SIZE = 64
    cfg.DATA.NUM_FRAMES = 16
    cfg.DATA.TRAIN_CROP_SIZE = 224
    cfg.NUM_GPUS = 8
    return cfg


def test_long_cycle_schedule_structure():
    cfg = _mg_cfg()
    mg = MultigridSchedule()
    cfg = mg.init_multigrid(cfg)
    assert mg.schedule is not None
    # Epochs strictly increasing; shapes follow the 4 long-cycle factors.
    epochs = [s[-1] for s in mg.schedule]
    assert all(b >= a for a, b in zip(epochs, epochs[1:]))
    # The compute budget B*T*S^2 is ~constant across shapes.
    budgets = [s[1][0] * s[1][1] * s[1][2] ** 2 for s in mg.schedule]
    base = 16 * 224 ** 2
    for b in budgets:
        assert 0.5 * base <= b <= 2.1 * base
    # MAX_EPOCH rescaled by EPOCH_FACTOR.
    assert cfg.SOLVER.MAX_EPOCH == mg.schedule[-1][-1]


def test_update_long_cycle_changes_shape_and_bn():
    cfg = _mg_cfg()
    mg = MultigridSchedule()
    cfg = mg.init_multigrid(cfg)
    cfg, changed = mg.update_long_cycle(cfg, cur_epoch=0)
    assert changed
    # First cycle shape: T/4, S/sqrt(2) rounded.
    assert cfg.DATA.NUM_FRAMES == 4
    assert cfg.DATA.TRAIN_CROP_SIZE == 158
    assert cfg.TRAIN.BATCH_SIZE > 64  # batch grows to hold compute constant
    assert cfg.MULTIGRID.LONG_CYCLE_SAMPLING_RATE == cfg.DATA.SAMPLING_RATE * 4


def test_current_shape_lookup():
    schedule = [(0, [4, 8, 158], 10), (1, [1, 16, 224], 20)]
    assert get_current_long_cycle_shape(schedule, 5) == [4, 8, 158]
    assert get_current_long_cycle_shape(schedule, 15) == [1, 16, 224]
    assert get_current_long_cycle_shape(schedule, 99) == [1, 16, 224]


def test_long_cycle_transition_e2e(tmp_path, monkeypatch):
    """Full train() across a long-cycle shape change (VERDICT r2 #7):
    the rebuild at the boundary (reference build_trainer,
    tools/train_net.py:627-649) must keep the loss finite (the NaN guard
    raises otherwise), keep LR continuous (epoch_exact-driven schedule),
    compile the new (B, T, S) bucket, and checkpoint at the boundary."""
    import json
    import os

    from slowfast_tpu.config.defaults import assert_and_infer_cfg
    from slowfast_tpu.engine.trainer import train
    from slowfast_tpu.solver.lr_policy import get_lr_at_epoch

    # Deterministic 2-entry schedule: epoch 0 at (B=16, T=2, S=48), epoch 1
    # back at the default (B=8, T=4, S=64).
    monkeypatch.setattr(
        MultigridSchedule,
        "get_long_cycle_schedule",
        lambda self, cfg: [(0, [2, 2, 48], 1), (1, [1, 4, 64], 2)],
    )

    cfg = get_cfg()
    cfg.MULTIGRID.LONG_CYCLE = True
    cfg.TRAIN.DATASET = "syntheticvideo"
    cfg.TEST.DATASET = "syntheticvideo"
    cfg.DATA.SYNTHETIC_SIZE = 32
    cfg.DATA.NUM_FRAMES = 4
    cfg.DATA.TRAIN_CROP_SIZE = 64
    cfg.DATA.TEST_CROP_SIZE = 64
    cfg.TRAIN.BATCH_SIZE = 8
    cfg.TRAIN.CHECKPOINT_PERIOD = 1
    cfg.TRAIN.EVAL_PERIOD = 10  # skip val epochs (covered elsewhere)
    cfg.SOLVER.MAX_EPOCH = 2
    cfg.SOLVER.STEPS = [0, 1, 2]
    cfg.SOLVER.LRS = [1, 0.1]
    cfg.SOLVER.BASE_LR = 0.01
    cfg.SOLVER.LR_POLICY = "cosine"
    cfg.SOLVER.WARMUP_EPOCHS = 0.0
    cfg.MODEL.MODEL_NAME = "ResNet"
    cfg.MODEL.ARCH = "c2d"
    cfg.MODEL.NUM_CLASSES = 8
    cfg.RESNET.DEPTH = 18
    cfg.RESNET.NUM_BLOCK_TEMP_KERNEL = [[1], [1], [1], [1]]
    cfg.TPU.COMPUTE_DTYPE = "float32"
    cfg.DATA_LOADER.NUM_WORKERS = 1
    cfg.LOG_PERIOD = 1
    cfg.NUM_GPUS = 8
    cfg.OUTPUT_DIR = str(tmp_path)
    cfg = assert_and_infer_cfg(cfg)

    train(cfg)

    # Checkpoint at the boundary epoch (and the final epoch).
    ckpts = sorted(os.listdir(os.path.join(str(tmp_path), "checkpoints")))
    assert len(ckpts) >= 2, ckpts

    # LR continuity across the rebuild: every logged train-iter LR matches
    # the epoch-exact schedule (cur_epoch + cur_iter/data_size), including
    # the first iteration after the shape change.
    stats = []
    with open(os.path.join(str(tmp_path), "json_stats.log")) as f:
        for line in f:
            s = json.loads(line.split("json_stats: ", 1)[1])
            if s.get("_type") == "train_iter":
                stats.append(s)
    # Both shapes ran: epoch 1 has 2 iters (B=16 of 32), epoch 2 has 4.
    epochs_seen = {s["epoch"].split("/")[0] for s in stats}
    assert epochs_seen == {"1", "2"}, epochs_seen
    post = [s for s in stats if s["epoch"].split("/")[0] == "2"]
    data_size = len(post)
    for i, s in enumerate(post):
        expected = get_lr_at_epoch(cfg, 1.0 + i / data_size)
        # json_stats rounds floats to 5 decimals (logging.log_json_stats).
        assert s["lr"] == pytest.approx(expected, abs=5.1e-6), (
            f"LR discontinuity after multigrid rebuild at iter {i}: "
            f"{s['lr']} vs {expected}"
        )
