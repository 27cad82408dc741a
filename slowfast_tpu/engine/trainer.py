"""Training driver (reference tools/train_net.py:33-758).

Single-controller SPMD: one python process per host drives all local chips;
the jitted train step runs the forward/backward/update with the batch
sharded over the mesh ``data`` axis. Eval epochs reuse the jitted eval step.
"""

import math
import pprint

import jax
import jax.numpy as jnp
import numpy as np

from slowfast_tpu.config import assert_and_infer_cfg  # noqa: F401
from slowfast_tpu.data import construct_loader, shuffle_dataset
from slowfast_tpu.engine.steps import (
    create_train_state,
    make_eval_step,
    make_train_step,
)
from slowfast_tpu.models import build_model
from slowfast_tpu.parallel import mesh as mesh_lib
from slowfast_tpu.solver.optimizer import construct_optimizer
from slowfast_tpu.utils import checkpoint as cu
from slowfast_tpu.utils import logging as logging_utils
from slowfast_tpu.utils import metrics
from slowfast_tpu.utils import misc
from slowfast_tpu.utils.meters import AVAMeter, EpochTimer, TrainMeter, ValMeter

logger = logging_utils.get_logger(__name__)


def _to_batch(inputs, labels, extra=None, dtype=jnp.float32):
    batch = {
        "inputs": [jnp.asarray(x) for x in inputs],
        "labels": jnp.asarray(labels),
    }
    if extra is not None and "boxes" in extra:
        batch["boxes"] = jnp.asarray(extra["boxes"])
    if extra is not None and "mask" in extra:
        batch["mask"] = jnp.asarray(extra["mask"])
    return batch


def train_epoch(
    train_loader, state, step_fn, meter, cur_epoch, cfg, mesh, lr_fn, rng
):
    data_size = len(train_loader)
    meter.iter_tic()
    for cur_iter, (inputs, labels, index, times, meta) in enumerate(train_loader):
        batch = _to_batch(inputs, labels, meta)
        batch = mesh_lib.shard_batch(batch, mesh)
        meter.data_toc()

        state, m = step_fn(state, batch, rng)
        loss = float(m["loss"])
        if math.isnan(loss):
            raise RuntimeError(f"ERROR: Got NaN losses at epoch {cur_epoch}")
        lr = float(lr_fn(int(state.step) - 1))
        top1 = float(m["top1_err"]) if "top1_err" in m else None
        top5 = float(m["top5_err"]) if "top5_err" in m else None
        meter.iter_toc()
        meter.update_stats(top1, top5, loss, lr, labels.shape[0] * cfg.NUM_SHARDS)
        meter.log_iter_stats(cur_epoch, cur_iter)
        meter.iter_tic()
    meter.log_epoch_stats(cur_epoch)
    meter.reset()
    return state


def eval_epoch(val_loader, state, eval_fn, meter, cur_epoch, cfg):
    meter.iter_tic()
    for cur_iter, (inputs, labels, index, times, meta) in enumerate(val_loader):
        batch = _to_batch(inputs, labels, meta)
        preds = eval_fn(state, batch)
        preds = np.asarray(preds)
        labels_np = np.asarray(labels)
        if cfg.DETECTION.ENABLE:
            meter.update_stats(preds, meta["ori_boxes"], meta["metadata"])
        elif cfg.DATA.MULTI_LABEL:
            meter.update_predictions(preds, labels_np)
        else:
            k1, k5 = metrics.topks_correct(
                jnp.asarray(preds), jnp.asarray(labels_np), (1, 5)
            )
            b = preds.shape[0]
            meter.update_stats(
                (1.0 - float(k1) / b) * 100.0,
                (1.0 - float(k5) / b) * 100.0,
                b * cfg.NUM_SHARDS,
            )
        meter.iter_toc()
        meter.log_iter_stats(cur_epoch, cur_iter)
        meter.iter_tic()
    stats = meter.log_epoch_stats(cur_epoch)
    meter.reset()
    return stats


def train_ssl(cfg):
    """SSL pretraining loop (ContrastiveModel)."""
    from slowfast_tpu.engine.ssl_steps import (
        create_ssl_train_state,
        make_ssl_train_step,
    )

    mesh_lib.init_distributed(cfg)
    logging_utils.setup_logging(cfg.OUTPUT_DIR, mesh_lib.is_master_proc())
    np.random.seed(cfg.RNG_SEED)
    rng = jax.random.PRNGKey(cfg.RNG_SEED)
    mesh = mesh_lib.create_mesh(cfg)
    model = build_model(cfg)
    train_loader = construct_loader(cfg, "train")
    steps_per_epoch = max(len(train_loader), 1)

    from slowfast_tpu.models.build import dummy_inputs

    variables = model.init(
        {"params": rng, "dropout": jax.random.fold_in(rng, 1)},
        dummy_inputs(cfg, 2),
        train=True,
    )
    tx, lr_fn = construct_optimizer(variables["params"], cfg, steps_per_epoch)
    state = create_ssl_train_state(cfg, model, tx, rng=rng)
    del variables
    step_fn = make_ssl_train_step(
        cfg, model, tx, mesh=mesh, steps_per_epoch=steps_per_epoch,
        donate=cfg.TPU.DONATE,
    )
    train_meter = TrainMeter(steps_per_epoch, cfg)

    for cur_epoch in range(cfg.SOLVER.MAX_EPOCH):
        shuffle_dataset(train_loader, cur_epoch)
        for cur_iter, (views, labels, index, times, meta) in enumerate(train_loader):
            v1, v2 = views[0], views[1]
            batch = {
                "inputs": [jnp.asarray(x) for x in v1],
                "inputs2": [jnp.asarray(x) for x in v2],
                "index": jnp.asarray(index),
            }
            batch = mesh_lib.shard_batch(batch, mesh)
            state, m = step_fn(state, batch, rng)
            loss = float(m["loss"])
            lr = float(lr_fn(int(state.step) - 1))
            train_meter.update_stats(None, None, loss, lr, len(index) * cfg.NUM_SHARDS)
            train_meter.log_iter_stats(cur_epoch, cur_iter)
        train_meter.log_epoch_stats(cur_epoch)
        train_meter.reset()
        if cu.is_checkpoint_epoch(cfg, cur_epoch):
            cu.save_checkpoint(cfg.OUTPUT_DIR, state, cur_epoch, cfg)
        if cfg.CONTRASTIVE.KNN_ON and misc.is_eval_epoch(cfg, cur_epoch):
            # Online kNN probe against the instance memory bank
            # (reference train_net.py eval hooks + contrastive eval_knn).
            from slowfast_tpu.engine.ssl_steps import knn_eval

            val_loader = construct_loader(cfg, "val")
            train_labels = np.asarray(
                getattr(train_loader.dataset, "_labels", []), np.int64
            )
            acc = knn_eval(cfg, model, state, train_labels, val_loader)
            if acc is not None:
                logger.info(
                    "knn eval epoch %d: top1 %.2f%%", cur_epoch + 1, acc
                )
    logger.info("ssl training done")
    return state


def train(cfg):
    """Full training entry (reference train_net.py:493-758)."""
    if cfg.MODEL.MODEL_NAME == "ContrastiveModel":
        return train_ssl(cfg)
    mesh_lib.init_distributed(cfg)
    logging_utils.setup_logging(cfg.OUTPUT_DIR, mesh_lib.is_master_proc())
    logger.info("Train with config:")
    logger.info(pprint.pformat(cfg.to_dict()))

    np.random.seed(cfg.RNG_SEED)
    rng = jax.random.PRNGKey(cfg.RNG_SEED)

    # Multigrid schedule setup (reference train_net.py:510-515).
    multigrid = None
    if cfg.MULTIGRID.LONG_CYCLE or cfg.MULTIGRID.SHORT_CYCLE:
        from slowfast_tpu.utils.multigrid import MultigridSchedule

        multigrid = MultigridSchedule()
        cfg = multigrid.init_multigrid(cfg)
        if cfg.MULTIGRID.LONG_CYCLE:
            cfg, _ = multigrid.update_long_cycle(cfg, cur_epoch=0)

    mesh = mesh_lib.create_mesh(cfg)
    model = build_model(cfg)

    train_loader = construct_loader(cfg, "train")
    val_loader = construct_loader(cfg, "val")
    steps_per_epoch = max(len(train_loader), 1)

    from slowfast_tpu.models.build import init_model

    variables = jax.jit(lambda r: init_model(model, cfg, rng=r, train=True))(rng)
    tx, lr_fn = construct_optimizer(variables["params"], cfg, steps_per_epoch)
    state = create_train_state(cfg, model, tx, rng=rng)
    del variables

    state, start_epoch = cu.load_train_checkpoint(cfg, state)

    step_fn = make_train_step(cfg, model, tx, mesh=mesh, donate=cfg.TPU.DONATE)
    eval_fn = make_eval_step(cfg, model, mesh=mesh)

    if cfg.DETECTION.ENABLE:
        train_meter = TrainMeter(steps_per_epoch, cfg)
        val_meter = AVAMeter(len(val_loader), cfg, mode="val")
        if hasattr(val_loader.dataset, "_video_idx_to_name"):
            val_meter.set_video_idx_to_name(val_loader.dataset._video_idx_to_name)
    else:
        train_meter = TrainMeter(steps_per_epoch, cfg)
        val_meter = ValMeter(len(val_loader), cfg)
    epoch_timer = EpochTimer()

    logger.info("Start epoch: %d", start_epoch + 1)
    for cur_epoch in range(start_epoch, cfg.SOLVER.MAX_EPOCH):
        if multigrid is not None and cfg.MULTIGRID.LONG_CYCLE:
            cfg, changed = multigrid.update_long_cycle(cfg, cur_epoch)
            if changed:
                # Rebuild loaders + jitted steps for the new (B,T,S) bucket
                # (reference build_trainer, train_net.py:627-649). Model
                # params are shape-independent and carry over.
                model = build_model(cfg)
                train_loader = construct_loader(cfg, "train")
                val_loader = construct_loader(cfg, "val")
                steps_per_epoch = max(len(train_loader), 1)
                step_fn = make_train_step(
                    cfg, model, tx, mesh=mesh, donate=cfg.TPU.DONATE
                )
                eval_fn = make_eval_step(cfg, model, mesh=mesh)
                train_meter = TrainMeter(steps_per_epoch, cfg)
                val_meter = ValMeter(len(val_loader), cfg)
        shuffle_dataset(train_loader, cur_epoch)
        epoch_timer.epoch_tic()
        state = train_epoch(
            train_loader, state, step_fn, train_meter, cur_epoch, cfg, mesh,
            lr_fn, rng,
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
            cu.save_checkpoint(cfg.OUTPUT_DIR, state, cur_epoch, cfg)
        if _is_eval_epoch(cfg, cur_epoch):
            eval_epoch(val_loader, state, eval_fn, val_meter, cur_epoch, cfg)

    logger.info("training done")
    return state


def _is_eval_epoch(cfg, cur_epoch):
    """(reference misc.is_eval_epoch :200-219)"""
    if cur_epoch + 1 == cfg.SOLVER.MAX_EPOCH:
        return True
    return (cur_epoch + 1) % cfg.TRAIN.EVAL_PERIOD == 0
