"""Training driver for pipeline parallelism (``TPU.PIPELINE_PARTITIONS > 1``).

The standard trainer (engine/trainer.py) drives ONE jitted step over ONE
GSPMD mesh; GPipe stages are instead placed programs on disjoint device
groups (parallel/pipeline.py), so they need their own epoch loop. This
driver mirrors the reference epoch-loop semantics (tools/train_net.py:
493-758: shuffle, train epoch, checkpoint cadence, eval cadence) on top
of :class:`~slowfast_tpu.parallel.pipeline.MViTPipeline`.

Differences from the single-mesh loop, both inherent to the schedule:

- No ``DevicePrefetcher``/async metric readback: ``train_step`` already
  host-syncs once per step to combine the per-stage grad norms into the
  TRUE global clip (reference ``clip_grad_norm_`` semantics); microbatch
  H2D copies overlap compute inside the step via async dispatch instead.
- Checkpoints are written in the STANDARD full-model format: per-stage
  params are assembled into one tree (param names are identical to the
  single-program model's), so pipeline checkpoints fine-tune/test
  anywhere; the optimizer state is the per-stage tuple, so exact resume
  requires the same PIPELINE_PARTITIONS/devices.
"""

import math
import pprint

import jax
import numpy as np

from slowfast_tpu.data import construct_loader, shuffle_dataset
from slowfast_tpu.models import build_model
from slowfast_tpu.parallel import mesh as mesh_lib
from slowfast_tpu.parallel.pipeline import MViTPipeline
from slowfast_tpu.utils import checkpoint as cu
from slowfast_tpu.utils import logging as logging_utils
from slowfast_tpu.utils.meters import EpochTimer, TrainMeter, ValMeter

logger = logging_utils.get_logger(__name__)


def train_pipeline(cfg):
    """Full pipeline-parallel training entry; returns the per-stage states."""
    from slowfast_tpu.engine.trainer import _is_eval_epoch, eval_epoch
    from slowfast_tpu.models.build import init_model

    mesh_lib.init_distributed(cfg)
    logging_utils.setup_logging(cfg.OUTPUT_DIR, mesh_lib.is_master_proc())
    logger.info("Pipeline train with config:")
    logger.info(pprint.pformat(cfg.to_dict()))

    np.random.seed(cfg.RNG_SEED)
    rng = jax.random.PRNGKey(cfg.RNG_SEED)

    train_loader = construct_loader(cfg, "train")
    val_loader = construct_loader(cfg, "val")
    steps_per_epoch = max(len(train_loader), 1)

    model = build_model(cfg)
    pipe = MViTPipeline(cfg, model, steps_per_epoch=steps_per_epoch)

    batch_size = int(cfg.TRAIN.BATCH_SIZE) // max(int(cfg.NUM_SHARDS), 1)
    if batch_size % pipe.n_micro:
        raise ValueError(
            f"per-host batch {batch_size} is not divisible by "
            f"TPU.PIPELINE_MICROBATCHES={pipe.n_micro}"
        )
    dp = pipe.meshes[0].devices.size
    if (batch_size // pipe.n_micro) % dp:
        raise ValueError(
            f"microbatch {batch_size // pipe.n_micro} is not divisible by "
            f"the per-stage data axis ({dp} devices)"
        )
    logger.info(
        "pipeline: %d stages x %d-way data parallel, %d microbatches, "
        "stage bounds %s",
        pipe.n_stages, dp, pipe.n_micro, pipe.bounds,
    )

    # Full-model init on the default device, then split across stages —
    # identical param values/RNG streams to the single-program trainer, so
    # a run is bitwise comparable across PIPELINE_PARTITIONS settings.
    variables = jax.jit(lambda r: init_model(model, cfg, rng=r, train=True))(
        rng
    )
    states = pipe.init_states(variables=jax.device_get(variables))
    del variables
    states, start_epoch = _load_states(cfg, pipe, states)

    train_meter = TrainMeter(steps_per_epoch, cfg)
    val_meter = ValMeter(len(val_loader), cfg)
    epoch_timer = EpochTimer()

    def eval_fn(cur_states, batch):
        # Pad the host batch up to the per-stage data axis; eval_epoch
        # trims predictions back to n_real itself.
        inputs = [np.asarray(x) for x in batch["inputs"]]
        n = inputs[0].shape[0]
        pad = (-n) % dp
        if pad:
            inputs = [
                np.concatenate([x, np.repeat(x[-1:], pad, axis=0)]) for x in inputs
            ]
        return pipe.eval_step(cur_states, {"inputs": inputs})

    logger.info("Start epoch: %d", start_epoch + 1)
    for cur_epoch in range(start_epoch, cfg.SOLVER.MAX_EPOCH):
        shuffle_dataset(train_loader, cur_epoch)
        epoch_timer.epoch_tic()
        states = _train_epoch(
            train_loader, states, pipe, train_meter, cur_epoch, cfg, rng
        )
        epoch_timer.epoch_toc()
        logger.info(
            "Epoch %d takes %.2fs. Epochs from %d to %d take %.2fs in average.",
            cur_epoch + 1,
            epoch_timer.last_epoch_time(),
            start_epoch + 1,
            cur_epoch + 1,
            epoch_timer.avg_epoch_time(),
        )
        if cu.is_checkpoint_epoch(cfg, cur_epoch):
            cu.save_checkpoint(
                cfg.OUTPUT_DIR,
                _to_full_state(pipe, states),
                cur_epoch,
                cfg,
                background=True,
            )
        if _is_eval_epoch(cfg, cur_epoch) and not cfg.MASK.ENABLE:
            eval_epoch(
                val_loader, states, eval_fn, val_meter, cur_epoch, cfg,
                mesh=None,
            )
    cu.wait_for_saves()
    logger.info("training done")
    return states


def _train_epoch(train_loader, states, pipe, meter, cur_epoch, cfg, rng):
    data_size = len(train_loader)
    meter.iter_tic()
    for cur_iter, (inputs, labels, index, times, meta) in enumerate(
        train_loader
    ):
        meter.data_toc()
        batch = {
            "inputs": [np.asarray(x) for x in inputs],
            "labels": np.asarray(labels),
        }
        states, m = pipe.train_step(
            states,
            batch,
            rng,
            epoch_exact=cur_epoch + cur_iter / data_size,
        )
        if math.isnan(m["loss"]):
            raise RuntimeError(
                f"ERROR: Got NaN losses at epoch {cur_epoch} iter {cur_iter}"
            )
        meter.update_stats(
            m.get("top1_err"),
            m.get("top5_err"),
            m["loss"],
            m["lr"],
            batch["labels"].shape[0] * cfg.NUM_SHARDS,
        )
        meter.iter_toc()
        meter.log_iter_stats(cur_epoch, cur_iter)
        meter.iter_tic()
    meter.log_epoch_stats(cur_epoch)
    meter.reset()
    return states


def _to_full_state(pipe, states):
    """Host TrainState in the standard checkpoint layout: assembled
    full-model params (tests/fine-tunes load it like any checkpoint) +
    the per-stage optimizer-state tuple (exact pipeline resume)."""
    from slowfast_tpu.engine.steps import TrainState

    return TrainState(
        step=int(states[0].step),
        params=pipe.assemble_params(states),
        batch_stats={},
        opt_state=tuple(jax.device_get(st.opt_state) for st in states),
    )


def _load_states(cfg, pipe, states):
    """Auto-resume / explicit init through the standard checkpoint logic
    (utils/checkpoint.load_train_checkpoint), then re-split across stages."""
    full = _to_full_state(pipe, states)
    loaded, start_epoch = cu.load_train_checkpoint(cfg, full)
    if loaded is full and start_epoch == 0:
        return states, 0  # nothing to restore
    stage_params = pipe.split_params(loaded.params)
    restored = []
    for s, st in enumerate(states):
        new = st.replace(
            params=jax.device_put(stage_params[s], pipe.repl_sh[s])
        )
        if start_epoch:  # exact resume: optimizer state + step came along
            new = new.replace(
                opt_state=jax.device_put(
                    loaded.opt_state[s], pipe.repl_sh[s]
                ),
                step=jax.device_put(
                    np.asarray(loaded.step, np.int32), pipe.repl_sh[s]
                ),
            )
        restored.append(new)
    return restored, start_epoch
