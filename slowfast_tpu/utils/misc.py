"""Misc utilities: NaN guards, model info, flop counting, eval cadence.

Reference: slowfast/utils/misc.py:27-418.
"""

import math

import numpy as np

from . import logging as logging_utils

logger = logging_utils.get_logger(__name__)


def check_nan_losses(loss):
    """Abort on NaN loss (reference misc.py:27-34)."""
    if math.isnan(loss):
        raise RuntimeError("ERROR: Got NaN losses")


def params_count(params):
    """Number of parameters in a pytree."""
    import jax

    return sum(int(np.prod(p.shape)) for p in jax.tree_util.tree_leaves(params))


def gpu_mem_usage():
    from .meters import gpu_mem_usage as f

    return f()


def cpu_mem_usage():
    """(usage_GB, total_GB) best-effort."""
    try:
        import psutil

        vram = psutil.virtual_memory()
        return (vram.total - vram.available) / 1024 ** 3, vram.total / 1024 ** 3
    except ImportError:
        return 0.0, 0.0


def get_flop_stats(model, cfg, variables, is_train=False):
    """Analytical FLOPs via XLA cost analysis (replaces fvcore counters,
    reference misc.py:79-197)."""
    import jax

    from slowfast_tpu.models.build import dummy_inputs

    inputs = dummy_inputs(cfg, batch_size=1)
    if cfg.DETECTION.ENABLE:
        # RoI-head models take boxes (batch_idx, x1, y1, x2, y2); one box
        # on the single dummy clip (reference misc.py:134-139 box input).
        import jax.numpy as jnp

        boxes = jnp.array([[0, 0, 0, 32, 32]], jnp.float32)
        fwd = jax.jit(lambda v, x: model.apply(v, x, boxes, train=False))
    else:
        fwd = jax.jit(lambda v, x: model.apply(v, x, train=False))
    compiled = fwd.lower(variables, inputs).compile()
    cost = compiled.cost_analysis()
    if isinstance(cost, list):
        cost = cost[0] if cost else {}
    return float(cost.get("flops", 0.0)) / 1e9  # GFLOPs per clip


def log_model_info(model, cfg, variables, is_train=True):
    """(reference misc.py:168-197)"""
    n_params = params_count(variables["params"])
    logger.info("Model: %s", cfg.MODEL.MODEL_NAME)
    logger.info("Params: {:,}".format(n_params))
    try:
        gflops = get_flop_stats(model, cfg, variables, is_train)
        logger.info("Flops: %.2f GFLOPs / clip", gflops)
    except Exception as e:  # cost analysis can be backend-dependent
        logger.info("Flop analysis unavailable: %s", e)
    return n_params


def is_eval_epoch(cfg, cur_epoch, multigrid_schedule=None):
    """(reference misc.py:200-219)"""
    if cur_epoch + 1 == cfg.SOLVER.MAX_EPOCH:
        return True
    if multigrid_schedule is not None:
        prev_epoch = 0
        for s in multigrid_schedule:
            if cur_epoch < s[-1]:
                period = max((s[-1] - prev_epoch) // cfg.MULTIGRID.EVAL_FREQ + 1, 1)
                return (cur_epoch - prev_epoch) % period == 0
            prev_epoch = s[-1]
    return (cur_epoch + 1) % cfg.TRAIN.EVAL_PERIOD == 0


def frozen_bn_stats(model):
    """No-op placeholder: frozen BN is a module flag (MODEL.FROZEN_BN)."""
    return model


def aggregate_sub_bn_stats(state):
    """Sub-BN running stats are already aggregated at every update
    (see models/batchnorm.py), so this is the identity; kept for API
    parity with reference misc.aggregate_sub_bn_stats:372-387."""
    return state
