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
    if extra is not None and "box_mask" in extra:
        batch["box_mask"] = jnp.asarray(extra["box_mask"])
    if extra is not None and "mask" in extra:
        batch["mask"] = jnp.asarray(extra["mask"])
    return batch


def _drive_epoch(loader, state, step_fn, stage, consume, meter, cur_epoch,
                 cfg, rng):
    """Shared epoch driver: H2D/compute overlap + ASYNC metric readback.

    Staging (device_put + shard) of batch N+1 runs on a background thread
    while the step for batch N runs (the reference's pinned-memory
    non_blocking copies, train_net.py:79-98). Per-step ``float(m["loss"])``
    would block the host on every device step, serializing dispatch and
    compute — instead device metric handles are buffered and only
    materialized every LOG_PERIOD iterations; the NaN guard (reference
    misc.check_nan_losses) runs on the same cadence. ``consume(it, m,
    loss, bs)`` does the meter/writer bookkeeping for one materialized
    step.
    """
    from slowfast_tpu.parallel.prefetch import DevicePrefetcher

    log_period = max(int(cfg.LOG_PERIOD), 1)
    pending = []  # (cur_iter, device_metrics, global_batch_size)

    def flush():
        for it, m, bs in pending:
            loss = float(m["loss"])
            if math.isnan(loss):
                raise RuntimeError(
                    f"ERROR: Got NaN losses at epoch {cur_epoch} iter {it}"
                )
            consume(it, m, loss, bs)
            meter.log_iter_stats(cur_epoch, it)
        pending.clear()

    meter.iter_tic()
    for cur_iter, batch, bs in DevicePrefetcher(
        enumerate(loader), stage, depth=max(cfg.TPU.PREFETCH, 1)
    ):
        meter.data_toc()
        state, m = step_fn(state, batch, rng)
        pending.append((cur_iter, m, bs))
        meter.iter_toc()
        if (cur_iter + 1) % log_period == 0:
            flush()
        meter.iter_tic()
    flush()
    meter.log_epoch_stats(cur_epoch)
    meter.reset()
    return state


def train_epoch(
    train_loader, state, step_fn, meter, cur_epoch, cfg, mesh, rng,
    writer=None,
):
    """One supervised training epoch (see _drive_epoch for the overlap /
    async-readback scheme)."""
    data_size = len(train_loader)
    is_ava_meter = isinstance(meter, AVAMeter)

    def consume(it, m, loss, bs):
        if is_ava_meter:
            # Detection training logs through AVAMeter(mode=train) for
            # json-stats parity (reference train_net.py:596-601).
            meter.update_stats(None, None, None, loss, float(m["lr"]))
        else:
            top1 = float(m["top1_err"]) if "top1_err" in m else None
            top5 = float(m["top5_err"]) if "top5_err" in m else None
            meter.update_stats(top1, top5, loss, float(m["lr"]), bs)
        if writer is not None:
            scalars = {"Train/loss": loss, "Train/lr": float(m["lr"])}
            if not is_ava_meter and "top1_err" in m:
                scalars["Train/Top1_err"] = float(m["top1_err"])
                scalars["Train/Top5_err"] = float(m["top5_err"])
            writer.add_scalars(
                scalars, global_step=data_size * cur_epoch + it
            )

    def stage(args):
        cur_iter, (inputs, labels, index, times, meta) = args
        batch = _to_batch(inputs, labels, meta)
        batch["epoch_exact"] = jnp.asarray(
            cur_epoch + cur_iter / data_size, jnp.float32
        )
        batch = mesh_lib.shard_batch(batch, mesh)
        return cur_iter, batch, labels.shape[0] * cfg.NUM_SHARDS

    return _drive_epoch(
        train_loader, state, step_fn, stage, consume, meter, cur_epoch, cfg,
        rng,
    )


def eval_epoch(val_loader, state, eval_fn, meter, cur_epoch, cfg, mesh=None,
               writer=None):
    tb_preds, tb_labels = [], []
    meter.iter_tic()
    for cur_iter, (inputs, labels, index, times, meta) in enumerate(val_loader):
        batch = _to_batch(inputs, labels, meta)
        # eval step shardings cover inputs/labels/boxes only
        batch.pop("mask", None)
        batch.pop("box_mask", None)
        n_real = len(np.asarray(labels))
        if mesh is not None:
            batch, n_real = mesh_lib.pad_batch_for_mesh(batch, mesh)
            batch = mesh_lib.shard_batch(batch, mesh)
        preds = eval_fn(state, batch)
        preds = np.asarray(jax.device_get(preds))
        if not cfg.DETECTION.ENABLE:
            preds = preds[:n_real]
        labels_np = np.asarray(labels)[:n_real]
        if cfg.DETECTION.ENABLE:
            # Unpad: keep predictions for real boxes only (row order matches
            # the ragged ori_boxes/metadata emitted by detection_collate).
            valid = np.asarray(meta["box_mask"]).reshape(-1) > 0
            preds = preds[: valid.size]
            meter.update_stats(preds[valid], meta["ori_boxes"], meta["metadata"])
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
        if writer is not None and not cfg.DETECTION.ENABLE:
            tb_preds.append(preds)
            tb_labels.append(labels_np)
        meter.iter_toc()
        meter.log_iter_stats(cur_epoch, cur_iter)
        meter.iter_tic()
    stats = meter.log_epoch_stats(cur_epoch)
    if writer is not None:
        scalars = {}
        for k in ("top1_err", "top5_err", "map"):
            if stats and k in stats:
                try:
                    scalars[f"Val/{k}"] = float(stats[k])
                except (TypeError, ValueError):
                    pass
        if scalars:
            writer.add_scalars(scalars, global_step=cur_epoch)
        if tb_preds and not cfg.DATA.MULTI_LABEL:
            writer.plot_eval(
                np.concatenate(tb_preds), np.concatenate(tb_labels),
                global_step=cur_epoch,
            )
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
    train_loader = construct_loader(cfg, "train")
    steps_per_epoch = max(len(train_loader), 1)

    # The instance memory banks are indexed by video id: LENGTH must equal
    # the dataset size or bank reads gather out of bounds (the reference
    # logs an error and resizes, contrastive.py:135-150 init_knn_labels).
    num_videos = getattr(train_loader.dataset, "num_videos", 0)
    if num_videos and cfg.CONTRASTIVE.LENGTH != num_videos:
        logger.warning(
            "CONTRASTIVE.LENGTH %d != dataset size %d; resizing memory banks",
            cfg.CONTRASTIVE.LENGTH,
            num_videos,
        )
        cfg.CONTRASTIVE.LENGTH = num_videos
    model = build_model(cfg)

    from slowfast_tpu.models.build import dummy_inputs

    variables = model.init(
        {"params": rng, "dropout": jax.random.fold_in(rng, 1)},
        dummy_inputs(cfg, 2),
        train=True,
    )
    tx, lr_fn = construct_optimizer(variables["params"], cfg, steps_per_epoch)
    state = create_ssl_train_state(cfg, model, tx, rng=rng)
    del variables
    # Auto-resume restores the FULL SSL state (params, optimizer, momentum
    # encoder EMA, queues, memory banks) — an interrupted pretrain continues
    # where it stopped (reference resumes via load_train_checkpoint).
    state, start_epoch = cu.load_train_checkpoint(cfg, state)
    if start_epoch:
        logger.info("Resuming SSL training from epoch %d", start_epoch + 1)
    state = mesh_lib.commit_state(state, mesh)
    step_fn = make_ssl_train_step(
        cfg, model, tx, mesh=mesh, steps_per_epoch=steps_per_epoch,
        donate=cfg.TPU.DONATE,
    )
    train_meter = TrainMeter(steps_per_epoch, cfg)

    def consume(it, m, loss, bs):
        train_meter.update_stats(None, None, loss, float(m["lr"]), bs)

    def stage(args):
        cur_iter, (views, labels, index, times, meta) = args
        v1, v2 = views[0], views[1]
        batch = {
            "inputs": [jnp.asarray(x) for x in v1],
            "inputs2": [jnp.asarray(x) for x in v2],
            "index": jnp.asarray(index),
            # Clip temporal position, consumed by the time-indexed 2d
            # memory bank (reference forward(..., time=...) :358).
            "time": jnp.asarray(
                np.asarray(times, np.float32).reshape(len(index), -1)[:, 0]
            ),
        }
        bs = len(index) * cfg.NUM_SHARDS
        return cur_iter, mesh_lib.shard_batch(batch, mesh), bs

    for cur_epoch in range(start_epoch, cfg.SOLVER.MAX_EPOCH):
        shuffle_dataset(train_loader, cur_epoch)
        state = _drive_epoch(
            train_loader, state, step_fn, stage, consume, train_meter,
            cur_epoch, cfg, rng,
        )
        if cu.is_checkpoint_epoch(cfg, cur_epoch):
            cu.save_checkpoint(
                cfg.OUTPUT_DIR, state, cur_epoch, cfg, background=True
            )
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
    cu.wait_for_saves()
    logger.info("ssl training done")
    return state


def train(cfg):
    """Full training entry (reference train_net.py:493-758)."""
    if cfg.MODEL.MODEL_NAME == "ContrastiveModel":
        return train_ssl(cfg)
    if int(cfg.TPU.PIPELINE_PARTITIONS) > 1:
        # GPipe stages are placed programs on disjoint device groups, not
        # a GSPMD mesh axis — they get their own epoch driver.
        from slowfast_tpu.engine.pipeline_trainer import train_pipeline

        return train_pipeline(cfg)
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
    if cfg.LOG_MODEL_INFO and mesh_lib.is_master_proc():
        misc.log_model_info(model, cfg, variables, is_train=True)
    state = create_train_state(cfg, model, tx, rng=rng)
    del variables

    state, start_epoch = cu.load_train_checkpoint(cfg, state)
    # Commit placement up front: an uncommitted state makes the step's
    # second call a jit-cache MISS (full ~60s recompile on the tunneled
    # chip) because step outputs are committed (parallel/mesh.py).
    state = mesh_lib.commit_state(state, mesh)

    step_fn = make_train_step(
        cfg, model, tx, mesh=mesh, donate=cfg.TPU.DONATE, epoch_in_batch=True
    )
    eval_fn = make_eval_step(cfg, model, mesh=mesh)

    if cfg.DETECTION.ENABLE:
        train_meter = AVAMeter(steps_per_epoch, cfg, mode="train")
        val_meter = AVAMeter(len(val_loader), cfg, mode="val")
        if hasattr(val_loader.dataset, "_video_idx_to_name"):
            val_meter.set_video_idx_to_name(val_loader.dataset._video_idx_to_name)
    else:
        train_meter = TrainMeter(steps_per_epoch, cfg)
        val_meter = ValMeter(len(val_loader), cfg)
    epoch_timer = EpochTimer()

    # TensorBoard writer, master-only (reference train_net.py:604-607).
    writer = None
    if cfg.TENSORBOARD.ENABLE and mesh_lib.is_master_proc():
        from slowfast_tpu.visualization.tensorboard_vis import TensorboardWriter

        writer = TensorboardWriter(cfg)

    logger.info("Start epoch: %d", start_epoch + 1)
    for cur_epoch in range(start_epoch, cfg.SOLVER.MAX_EPOCH):
        # Chunked-csv rotation: advance the resident slice and rebuild the
        # train loader (reference train_net.py:614-625).
        if cur_epoch > 0 and cfg.DATA.LOADER_CHUNK_SIZE > 0:
            num_chunks = math.ceil(
                cfg.DATA.LOADER_CHUNK_OVERALL_SIZE / cfg.DATA.LOADER_CHUNK_SIZE
            )
            cfg.DATA.SKIP_ROWS = (
                cur_epoch % num_chunks * cfg.DATA.LOADER_CHUNK_SIZE
            )
            logger.info("chunked loader: skip_rows %d", cfg.DATA.SKIP_ROWS)
            train_loader = construct_loader(cfg, "train")
        if multigrid is not None and cfg.MULTIGRID.LONG_CYCLE:
            cfg, changed = multigrid.update_long_cycle(cfg, cur_epoch)
            if changed:
                # Rebuild loaders + jitted steps for the new (B,T,S) bucket
                # (reference build_trainer, train_net.py:627-649). Model
                # params are shape-independent and carry over in memory (the
                # reference reloads the last checkpoint only because it
                # rebuilds the torch module); LR stays continuous because
                # the schedule is driven by epoch_exact, not the step count.
                model = build_model(cfg)
                train_loader = construct_loader(cfg, "train")
                val_loader = construct_loader(cfg, "val")
                steps_per_epoch = max(len(train_loader), 1)
                step_fn = make_train_step(
                    cfg, model, tx, mesh=mesh, donate=cfg.TPU.DONATE,
                    epoch_in_batch=True,
                )
                eval_fn = make_eval_step(cfg, model, mesh=mesh)
                train_meter = TrainMeter(steps_per_epoch, cfg)
                val_meter = ValMeter(len(val_loader), cfg)
        shuffle_dataset(train_loader, cur_epoch)
        epoch_timer.epoch_tic()
        state = train_epoch(
            train_loader, state, step_fn, train_meter, cur_epoch, cfg, mesh,
            rng, writer=writer,
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

        mg_schedule = (
            multigrid.schedule
            if multigrid is not None and cfg.MULTIGRID.LONG_CYCLE
            else None
        )
        is_checkp = cu.is_checkpoint_epoch(cfg, cur_epoch, mg_schedule)
        # Masked pretraining never evals (reference train_net.py:689-695:
        # `... and not cfg.MASK.ENABLE` — there is no val protocol for the
        # reconstruction objective; quality is judged by fine-tuning).
        is_eval = _is_eval_epoch(cfg, cur_epoch, mg_schedule) and not (
            cfg.MASK.ENABLE
        )

        # Precise-BN: replace running stats with the plain average over N
        # train batches before checkpointing/eval (reference
        # train_net.py:698-710).
        if (
            cfg.BN.USE_PRECISE_STATS
            and (is_checkp or is_eval)
            and jax.tree_util.tree_leaves(state.batch_stats)
        ):
            from slowfast_tpu.engine.precise_bn import compute_precise_bn_stats

            state = compute_precise_bn_stats(
                cfg, model, state, train_loader,
                min(cfg.BN.NUM_BATCHES_PRECISE, len(train_loader)),
            )

        if is_checkp:
            # Background write: training proceeds while the serialized
            # snapshot goes to disk (atomic tmp+rename in checkpoint.py).
            cu.save_checkpoint(
                cfg.OUTPUT_DIR, state, cur_epoch, cfg, background=True
            )
        if is_eval:
            eval_epoch(
                val_loader, state, eval_fn, val_meter, cur_epoch, cfg, mesh,
                writer=writer,
            )

    if writer is not None:
        writer.close()
    cu.wait_for_saves()
    logger.info("training done")
    return state


def _is_eval_epoch(cfg, cur_epoch, multigrid_schedule=None):
    """(reference misc.is_eval_epoch :200-219)"""
    if cur_epoch + 1 == cfg.SOLVER.MAX_EPOCH:
        return True
    if multigrid_schedule is not None:
        prev_epoch = 0
        for s in multigrid_schedule:
            if cur_epoch < s[-1]:
                period = max(
                    (s[-1] - prev_epoch) // cfg.MULTIGRID.EVAL_FREQ + 1, 1
                )
                return (s[-1] - 1 - cur_epoch) % period == 0
            prev_epoch = s[-1]
    return (cur_epoch + 1) % cfg.TRAIN.EVAL_PERIOD == 0
