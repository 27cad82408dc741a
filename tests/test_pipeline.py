"""Pipeline parallelism (parallel/pipeline.py): semantics equality.

The GPipe driver must reproduce the single-program train step exactly —
same loss, same global grad norm (and clipping), same updated params —
because microbatch accumulation of a mean loss over equal microbatches
is the same sum, and MViT has no cross-batch ops (LN only, no BN).
CPU-backend matmul accumulation noise bounds the tolerance (rtol 3e-3,
see tests/test_train_step.py's partitioning equality tests).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest


def _mvit_cfg(n_pipe=2, n_micro=0, clip_norm=0.0):
    from slowfast_tpu.config import get_cfg

    cfg = get_cfg()
    for k, v in (
        ("MODEL.MODEL_NAME", "MViT"),
        ("MODEL.ARCH", "mvit"),
        ("MODEL.NUM_CLASSES", 16),
        ("MODEL.LOSS_FUNC", "cross_entropy"),
        ("DATA.NUM_FRAMES", 4),
        ("DATA.TRAIN_CROP_SIZE", 32),
        ("DATA.INPUT_CHANNEL_NUM", [3]),
        ("MVIT.EMBED_DIM", 32),
        ("MVIT.NUM_HEADS", 1),
        ("MVIT.DEPTH", 4),
        ("MVIT.PATCH_KERNEL", [3, 7, 7]),
        ("MVIT.PATCH_STRIDE", [2, 4, 4]),
        ("MVIT.PATCH_PADDING", [1, 3, 3]),
        ("MVIT.DIM_MUL", [[1, 2.0], [3, 2.0]]),
        ("MVIT.HEAD_MUL", [[1, 2.0], [3, 2.0]]),
        ("MVIT.POOL_Q_STRIDE", [[1, 1, 2, 2], [3, 1, 2, 2]]),
        ("MVIT.POOL_KVQ_KERNEL", [3, 3, 3]),
        ("MVIT.POOL_KV_STRIDE_ADAPTIVE", [1, 4, 4]),
        ("MVIT.MODE", "conv"),
        ("MVIT.CLS_EMBED_ON", True),
        ("MVIT.USE_ABS_POS", True),
        ("MVIT.REL_POS_SPATIAL", True),
        ("MVIT.REL_POS_TEMPORAL", True),
        ("MVIT.RESIDUAL_POOLING", True),
        ("MVIT.DIM_MUL_IN_ATT", True),
        ("MVIT.USE_MEAN_POOLING", True),
        ("MVIT.DROPOUT_RATE", 0.0),
        ("MVIT.DROPPATH_RATE", 0.0),
        ("MODEL.DROPOUT_RATE", 0.0),
        # SGD for the post-update equality checks: adamw normalizes the
        # ~0 (softmax-shift-invariant) norm_k.bias grads, amplifying
        # CPU-backend matmul noise into full-size update differences.
        ("SOLVER.OPTIMIZING_METHOD", "sgd"),
        ("SOLVER.MOMENTUM", 0.9),
        ("SOLVER.BASE_LR", 0.01),
        ("SOLVER.CLIP_GRAD_L2NORM", clip_norm),
        ("MIXUP.ENABLE", False),
        ("TPU.COMPUTE_DTYPE", "float32"),
        ("TPU.PIPELINE_PARTITIONS", n_pipe),
        ("TPU.PIPELINE_MICROBATCHES", n_micro),
    ):
        cfg.merge_from_list([k, v])
    return cfg


def _reference_step(cfg, variables, batch, rng):
    """One step of the standard (single-program) train step."""
    from slowfast_tpu.engine.steps import create_train_state, make_train_step
    from slowfast_tpu.models import build_model
    from slowfast_tpu.solver.optimizer import construct_optimizer

    model = build_model(cfg)
    tx, _ = construct_optimizer(variables["params"], cfg, steps_per_epoch=10)
    state = create_train_state(cfg, model, tx, variables=variables)
    step = make_train_step(
        cfg, model, tx, mesh=None, donate=False, steps_per_epoch=10
    )
    jbatch = {
        "inputs": [jnp.asarray(p) for p in batch["inputs"]],
        "labels": jnp.asarray(batch["labels"]),
    }
    new_state, metrics = step(state, jbatch, rng)
    return new_state, {k: float(v) for k, v in metrics.items()}


def _tree_allclose(a, b, rtol=3e-3, atol=1e-5):
    flat_a = jax.tree_util.tree_leaves_with_path(a)
    b_map = dict(jax.tree_util.tree_leaves_with_path(b))
    for path, la in flat_a:
        lb = b_map[path]
        np.testing.assert_allclose(
            np.asarray(la),
            np.asarray(lb),
            rtol=rtol,
            atol=atol,
            err_msg=f"mismatch at {jax.tree_util.keystr(path)}",
        )


def _batch(cfg, b):
    rng = np.random.RandomState(0)
    return {
        "inputs": [
            rng.randn(
                b, cfg.DATA.NUM_FRAMES, 32, 32, 3
            ).astype(np.float32)
        ],
        "labels": (np.arange(b) % cfg.MODEL.NUM_CLASSES).astype(np.int32),
    }


@pytest.mark.parametrize("clip_norm", [0.0, 0.05])
def test_pipeline_matches_single_program(clip_norm):
    """2 stages x 2 microbatches == the plain step (loss, norm, params)."""
    from slowfast_tpu.models import build_model
    from slowfast_tpu.models.build import init_model
    from slowfast_tpu.parallel.pipeline import MViTPipeline

    cfg = _mvit_cfg(n_pipe=2, clip_norm=clip_norm)
    model = build_model(cfg)
    variables = init_model(model, cfg, rng=jax.random.PRNGKey(0), train=True)
    batch = _batch(cfg, b=4)
    rng = jax.random.PRNGKey(5)

    ref_state, ref_metrics = _reference_step(cfg, variables, batch, rng)

    pipe = MViTPipeline(
        cfg, build_model(cfg), devices=jax.devices()[:2], steps_per_epoch=10
    )
    states = pipe.init_states(variables=variables)
    states, metrics = pipe.train_step(states, batch, rng)

    assert np.isfinite(metrics["loss"])
    np.testing.assert_allclose(
        metrics["loss"], ref_metrics["loss"], rtol=3e-3
    )
    np.testing.assert_allclose(
        metrics["grad_norm"], ref_metrics["grad_norm"], rtol=3e-3
    )
    assert metrics["lr"] == pytest.approx(ref_metrics["lr"], rel=1e-6)
    _tree_allclose(
        pipe.assemble_params(states), jax.device_get(ref_state.params)
    )


def test_pipeline_composes_with_data_parallel():
    """(pipe=2) x (data=4) on the 8-device CPU mesh runs and matches."""
    from slowfast_tpu.models import build_model
    from slowfast_tpu.models.build import init_model
    from slowfast_tpu.parallel.pipeline import MViTPipeline

    cfg = _mvit_cfg(n_pipe=2)
    model = build_model(cfg)
    variables = init_model(model, cfg, rng=jax.random.PRNGKey(0), train=True)
    batch = _batch(cfg, b=8)
    rng = jax.random.PRNGKey(5)

    ref_state, ref_metrics = _reference_step(cfg, variables, batch, rng)

    pipe = MViTPipeline(
        cfg, build_model(cfg), devices=jax.devices()[:8], steps_per_epoch=10
    )
    states = pipe.init_states(variables=variables)
    states, metrics = pipe.train_step(states, batch, rng)
    np.testing.assert_allclose(metrics["loss"], ref_metrics["loss"], rtol=3e-3)
    _tree_allclose(
        pipe.assemble_params(states), jax.device_get(ref_state.params)
    )

    preds = pipe.eval_step(states, batch)
    assert preds.shape == (8, cfg.MODEL.NUM_CLASSES)
    assert np.isfinite(preds).all()


def test_pipeline_microbatch_count_invariance():
    """M=1 vs M=4 accumulate to the same update (exact mean semantics)."""
    from slowfast_tpu.models import build_model
    from slowfast_tpu.models.build import init_model
    from slowfast_tpu.parallel.pipeline import MViTPipeline

    results = []
    for n_micro in (1, 4):
        cfg = _mvit_cfg(n_pipe=2, n_micro=n_micro)
        model = build_model(cfg)
        variables = init_model(
            model, cfg, rng=jax.random.PRNGKey(0), train=True
        )
        pipe = MViTPipeline(
            cfg, model, devices=jax.devices()[:2], steps_per_epoch=10
        )
        states = pipe.init_states(variables=variables)
        states, metrics = pipe.train_step(
            states, _batch(cfg, b=4), jax.random.PRNGKey(5)
        )
        results.append((metrics, pipe.assemble_params(states)))
    np.testing.assert_allclose(
        results[0][0]["loss"], results[1][0]["loss"], rtol=3e-3
    )
    _tree_allclose(results[0][1], results[1][1])


def test_balanced_bounds_cover_depth():
    from slowfast_tpu.parallel.pipeline import balanced_stage_bounds

    cfg = _mvit_cfg()
    for n in (2, 3, 4):
        bounds = balanced_stage_bounds(cfg, n)
        assert bounds[0][0] == 0 and bounds[-1][1] == cfg.MVIT.DEPTH
        for (lo, hi), (lo2, hi2) in zip(bounds, bounds[1:]):
            assert hi == lo2 and hi > lo and hi2 > lo2


def test_pipeline_trainer_e2e(tmp_path):
    """run_net-style dispatch: trainer.train() drives the GPipe loop when
    TPU.PIPELINE_PARTITIONS > 1 — epochs, eval, checkpoint, exact resume."""
    from slowfast_tpu.engine.trainer import train
    from slowfast_tpu.utils import checkpoint as cu

    cfg = _mvit_cfg(n_pipe=2, n_micro=2)
    for k, v in (
        ("TRAIN.ENABLE", True),
        ("TRAIN.DATASET", "syntheticvideo"),
        ("TRAIN.BATCH_SIZE", 8),
        ("TRAIN.EVAL_PERIOD", 2),
        ("TRAIN.CHECKPOINT_PERIOD", 1),
        ("TRAIN.AUTO_RESUME", True),
        ("DATA.SYNTHETIC_SIZE", 8),
        ("SOLVER.MAX_EPOCH", 2),
        ("DATA_LOADER.NUM_WORKERS", 0),
        ("LOG_PERIOD", 1),
        ("OUTPUT_DIR", str(tmp_path)),
    ):
        cfg.merge_from_list([k, v])

    import pickle

    train(cfg)
    cu.wait_for_saves()
    assert cu.has_checkpoint(cfg.OUTPUT_DIR, cfg.TASK)
    path = cu.get_path_to_checkpoint(cfg.OUTPUT_DIR, 2, cfg.TASK)
    with open(path, "rb") as f:
        payload = pickle.load(f)
    # 1 step/epoch x 2 epochs; saved full-model layout (params by name).
    assert payload["epoch"] == 1 and payload["step"] == 2

    # Resume continues into epoch 3 with the exact params/opt state.
    cfg.SOLVER.MAX_EPOCH = 3
    states2 = train(cfg)
    assert int(states2[0].step) == 3


def test_pipeline_rejects_unsupported_modes():
    from slowfast_tpu.models import build_model
    from slowfast_tpu.parallel.pipeline import MViTPipeline

    cfg = _mvit_cfg(n_pipe=2)
    cfg.MIXUP.ENABLE = True
    with pytest.raises(NotImplementedError):
        MViTPipeline(cfg, build_model(cfg), devices=jax.devices()[:2])

    cfg = _mvit_cfg(n_pipe=2)
    cfg.MODEL.MODEL_NAME = "SlowFast"
    with pytest.raises(ValueError):
        MViTPipeline(cfg, None, devices=jax.devices()[:2])
