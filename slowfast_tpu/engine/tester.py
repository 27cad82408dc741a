"""Multi-view test driver (reference tools/test_net.py:24-267)."""

import pickle
import pprint

import jax
import jax.numpy as jnp
import numpy as np

from slowfast_tpu.data import construct_loader
from slowfast_tpu.engine.steps import create_train_state, make_eval_step
from slowfast_tpu.models import build_model
from slowfast_tpu.parallel import mesh as mesh_lib
from slowfast_tpu.solver.optimizer import construct_optimizer
from slowfast_tpu.utils import checkpoint as cu
from slowfast_tpu.utils import logging as logging_utils
from slowfast_tpu.utils.meters import AVAMeter, TestMeter

logger = logging_utils.get_logger(__name__)


def perform_test(test_loader, state, eval_fn, test_meter, cfg, mesh=None):
    from slowfast_tpu.utils.meters import gather_ragged_across_hosts

    test_meter.iter_tic()
    for cur_iter, (inputs, labels, video_idx, times, meta) in enumerate(test_loader):
        batch = {
            "inputs": [jnp.asarray(x) for x in inputs],
            "labels": jnp.asarray(labels),
        }
        if cfg.DETECTION.ENABLE:
            batch["boxes"] = jnp.asarray(meta["boxes"])
        n_real = len(np.asarray(labels))
        if mesh is not None:
            batch, n_real = mesh_lib.pad_batch_for_mesh(batch, mesh)
            batch = mesh_lib.shard_batch(batch, mesh)
        preds = np.asarray(jax.device_get(eval_fn(state, batch)))[:n_real]
        # Cross-host gather so every host's meter sees ALL views of every
        # video (reference test_net.py:116 all_gathers preds/labels/idx);
        # no-op on a single host.
        preds = gather_ragged_across_hosts(preds)
        labels_all = gather_ragged_across_hosts(np.asarray(labels))
        video_idx_all = gather_ragged_across_hosts(np.asarray(video_idx))
        test_meter.iter_toc()
        test_meter.update_stats(preds, labels_all, video_idx_all)
        test_meter.log_iter_stats(cur_iter)
        test_meter.iter_tic()
    test_meter.finalize_metrics()
    return test_meter


def test(cfg):
    """Test entry, looping over NUM_TEMPORAL_CLIPS view counts
    (reference test_net.py:154-267)."""
    mesh_lib.init_distributed(cfg)
    logging_utils.setup_logging(cfg.OUTPUT_DIR, mesh_lib.is_master_proc())
    logger.info("Test with config:")
    logger.info(pprint.pformat(cfg.to_dict()))

    view_counts = cfg.TEST.NUM_TEMPORAL_CLIPS or [cfg.TEST.NUM_ENSEMBLE_VIEWS]
    results = []
    for num_view in view_counts:
        cfg = cfg.clone()
        cfg.TEST.NUM_ENSEMBLE_VIEWS = num_view
        results.append(_test_one(cfg))
    for views, stats in zip(view_counts, results):
        logger.info("Views %d: %s", views, stats)
    return results


def _test_one(cfg):
    mesh = mesh_lib.create_mesh(cfg)
    model = build_model(cfg)
    rng = jax.random.PRNGKey(cfg.RNG_SEED)
    from slowfast_tpu.models.build import init_model

    variables = init_model(model, cfg, rng=rng, train=False)
    if cfg.LOG_MODEL_INFO and mesh_lib.is_master_proc():
        from slowfast_tpu.utils import misc

        misc.log_model_info(model, cfg, variables, is_train=False)
    tx, _ = construct_optimizer(variables["params"], cfg, 1)
    state = create_train_state(cfg, model, tx, rng=rng)
    state = cu.load_test_checkpoint(cfg, state)
    state = mesh_lib.commit_state(state, mesh)

    test_loader = construct_loader(cfg, "test")

    if cfg.VIS_MASK.ENABLE and cfg.MASK.ENABLE and cfg.MASK.MAE_ON:
        # MAE reconstruction visualization replaces metric eval
        # (reference test_net.py:124).
        from slowfast_tpu.visualization.mae_vis import run_mae_visualization

        return run_mae_visualization(cfg, model, state, test_loader)

    eval_fn = make_eval_step(cfg, model, mesh=mesh)

    if cfg.DETECTION.ENABLE:
        meter = AVAMeter(len(test_loader), cfg, mode="test")
        if hasattr(test_loader.dataset, "_video_idx_to_name"):
            meter.set_video_idx_to_name(test_loader.dataset._video_idx_to_name)
        meter.iter_tic()
        for cur_iter, (inputs, labels, video_idx, times, meta) in enumerate(
            test_loader
        ):
            batch = {
                "inputs": [jnp.asarray(x) for x in inputs],
                "labels": jnp.asarray(labels),
                "boxes": jnp.asarray(meta["boxes"]),
            }
            batch, _ = mesh_lib.pad_batch_for_mesh(batch, mesh)
            batch = mesh_lib.shard_batch(batch, mesh)
            preds = np.asarray(jax.device_get(eval_fn(state, batch)))
            valid = np.asarray(meta["box_mask"]).reshape(-1) > 0
            preds = preds[: valid.size]
            meter.iter_toc()
            meter.update_stats(preds[valid], meta["ori_boxes"], meta["metadata"])
            meter.log_iter_stats(None, cur_iter)
            meter.iter_tic()
        full_map = meter.finalize_metrics()
        return {"map": full_map}

    dataset = test_loader.dataset
    num_clips = cfg.TEST.NUM_ENSEMBLE_VIEWS * cfg.TEST.NUM_SPATIAL_CROPS
    num_videos = dataset.num_videos // num_clips
    assert dataset.num_videos % num_clips == 0, (
        "total test videos must be divisible by views x crops"
    )
    test_meter = TestMeter(
        num_videos,
        num_clips,
        cfg.MODEL.NUM_CLASSES,
        len(test_loader),
        multi_label=cfg.DATA.MULTI_LABEL,
        ensemble_method=cfg.DATA.ENSEMBLE_METHOD,
        output_dir=cfg.OUTPUT_DIR,
    )
    test_meter = perform_test(test_loader, state, eval_fn, test_meter, cfg, mesh)

    if cfg.TEST.SAVE_RESULTS_PATH and mesh_lib.is_master_proc():
        with open(cfg.TEST.SAVE_RESULTS_PATH, "wb") as f:
            pickle.dump(
                [test_meter.video_preds, test_meter.video_labels], f
            )
    return dict(test_meter.stats)
