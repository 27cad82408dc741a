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
