"""Precise-BN: recompute BN running statistics over N batches.

Reference: fvcore update_bn_stats used at tools/train_net.py:425-446 and the
local reimplementation slowfast/utils/bn_helper.py:11-76. Semantics match
fvcore: running_mean/var become the plain average of per-batch statistics
over BN.NUM_BATCHES_PRECISE batches.

The per-batch statistics are recovered from the module's EMA update
algebraically (batch = (new - (1-m) * old) / m), so no model surgery is
needed.
"""

import jax
import jax.numpy as jnp

from slowfast_tpu.utils import logging as logging_utils

logger = logging_utils.get_logger(__name__)

BN_MOMENTUM = 0.1  # BatchNorm3D default (torch convention)


def compute_precise_bn_stats(cfg, model, state, loader, num_batches):
    """Returns state with batch_stats replaced by precise averages."""
    if not jax.tree_util.tree_leaves(state.batch_stats):
        return state

    from slowfast_tpu.engine.steps import _maybe_device_preprocess

    @jax.jit
    def batch_stats_of(params, stats, inputs):
        inputs = _maybe_device_preprocess(cfg, inputs)
        _, mutated = model.apply(
            {"params": params, "batch_stats": stats},
            inputs,
            train=True,
            mutable=["batch_stats"],
            rngs={"dropout": jax.random.PRNGKey(0)},
        )
        new = mutated["batch_stats"]
        # Invert the EMA update to recover this batch's statistics.
        return jax.tree_util.tree_map(
            lambda n, o: (n - (1.0 - BN_MOMENTUM) * o) / BN_MOMENTUM, new, stats
        )

    acc = None
    count = 0
    for i, (inputs, labels, index, times, meta) in enumerate(loader):
        if i >= num_batches:
            break
        jin = [jnp.asarray(x) for x in inputs]
        bstats = batch_stats_of(state.params, state.batch_stats, jin)
        acc = (
            bstats
            if acc is None
            else jax.tree_util.tree_map(jnp.add, acc, bstats)
        )
        count += 1
    if count == 0:
        return state
    precise = jax.tree_util.tree_map(lambda a: a / count, acc)
    logger.info("Updated precise BN stats over %d batches.", count)
    return state.replace(batch_stats=precise)
