"""Checkpoint save/resume roundtrip + torch import surface."""

import os
import tempfile

import jax
import jax.numpy as jnp
import numpy as np

from slowfast_tpu.config import get_cfg
from slowfast_tpu.engine.steps import create_train_state, make_train_step
from slowfast_tpu.models import build_model
from slowfast_tpu.models.build import init_model
from slowfast_tpu.solver.optimizer import construct_optimizer
from slowfast_tpu.utils import checkpoint as cu


def _tiny_cfg(tmp):
    cfg = get_cfg()
    cfg.MODEL.MODEL_NAME = "ResNet"
    cfg.MODEL.ARCH = "c2d"
    cfg.MODEL.NUM_CLASSES = 8
    cfg.RESNET.DEPTH = 18
    cfg.RESNET.NUM_BLOCK_TEMP_KERNEL = [[2], [2], [2], [2]]
    cfg.DATA.NUM_FRAMES = 4
    cfg.DATA.TRAIN_CROP_SIZE = 32
    cfg.DATA.INPUT_CHANNEL_NUM = [3]
    cfg.TPU.COMPUTE_DTYPE = "float32"
    cfg.OUTPUT_DIR = tmp
    cfg.SOLVER.WARMUP_EPOCHS = 0.0
    return cfg


def test_native_checkpoint_roundtrip():
    with tempfile.TemporaryDirectory() as tmp:
        cfg = _tiny_cfg(tmp)
        model = build_model(cfg)
        rng = jax.random.PRNGKey(0)
        variables = init_model(model, cfg, rng=rng, train=True)
        tx, _ = construct_optimizer(variables["params"], cfg, 10)
        state = create_train_state(cfg, model, tx, rng=rng, variables=variables)

        # One step so optimizer state is non-trivial.
        step = make_train_step(cfg, model, tx, donate=False)
        batch = {
            "inputs": [jnp.ones((2, 4, 32, 32, 3))],
            "labels": jnp.zeros((2,), jnp.int32),
        }
        state, _ = step(state, batch, rng)

        path = cu.save_checkpoint(tmp, state, epoch=4, cfg=cfg)
        assert path and os.path.exists(path)
        assert cu.has_checkpoint(tmp)
        assert cu.get_last_checkpoint(tmp) == path

        fresh = create_train_state(cfg, model, tx, rng=jax.random.PRNGKey(9))
        restored, epoch = cu.load_native_checkpoint(path, fresh)
        assert epoch == 4
        for a, b in zip(
            jax.tree_util.tree_leaves(state.params),
            jax.tree_util.tree_leaves(restored.params),
        ):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        assert int(restored.step) == int(state.step)

        # auto-resume entry point: the saved epoch is the last COMPLETED
        # epoch, training resumes at the next one (reference
        # train_net.py:540).
        cfg.TRAIN.AUTO_RESUME = True
        resumed, start_epoch = cu.load_train_checkpoint(cfg, fresh)
        assert start_epoch == 5
        assert int(resumed.step) == int(state.step)

        # Fine-tune init from an explicit native path with EPOCH_RESET:
        # weights load, optimizer/step/epoch restart fresh.
        cfg.TRAIN.AUTO_RESUME = False
        cfg.TRAIN.CHECKPOINT_FILE_PATH = path
        cfg.TRAIN.CHECKPOINT_EPOCH_RESET = True
        ft, start_epoch = cu.load_train_checkpoint(cfg, fresh)
        assert start_epoch == 0
        assert int(ft.step) == 0
        np.testing.assert_array_equal(
            np.asarray(jax.tree_util.tree_leaves(ft.params)[0]),
            np.asarray(jax.tree_util.tree_leaves(state.params)[0]),
        )


def test_background_save_is_atomic_and_loadable():
    """background=True returns after the device->host snapshot; the disk
    write runs on a writer thread with tmp+os.replace, so auto-resume can
    never observe a truncated checkpoint. wait_for_saves() then makes the
    file visible and identical to a synchronous save."""
    with tempfile.TemporaryDirectory() as tmp:
        cfg = _tiny_cfg(tmp)
        model = build_model(cfg)
        rng = jax.random.PRNGKey(0)
        variables = init_model(model, cfg, rng=rng, train=True)
        tx, _ = construct_optimizer(variables["params"], cfg, 10)
        state = create_train_state(cfg, model, tx, rng=rng, variables=variables)

        path = cu.save_checkpoint(tmp, state, epoch=2, cfg=cfg, background=True)
        cu.wait_for_saves()
        assert os.path.exists(path)
        # No tmp litter, and the scan never matches dot-prefixed partials.
        d = os.path.dirname(path)
        assert not [f for f in os.listdir(d) if f.endswith(".tmp")]
        assert cu.get_last_checkpoint(tmp) == path

        fresh = create_train_state(cfg, model, tx, rng=jax.random.PRNGKey(9))
        restored, epoch = cu.load_native_checkpoint(path, fresh)
        assert epoch == 2
        for a, b in zip(
            jax.tree_util.tree_leaves(state.params),
            jax.tree_util.tree_leaves(restored.params),
        ):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

        # A crashed write (simulated partial tmp file) is invisible to the
        # auto-resume scan.
        with open(
            os.path.join(d, ".checkpoint_epoch_00009.pyth.tmp"), "wb"
        ) as f:
            f.write(b"partial")
        assert cu.get_last_checkpoint(tmp) == path


def test_checkpoint_epoch_cadence():
    cfg = get_cfg()
    cfg.TRAIN.CHECKPOINT_PERIOD = 5
    cfg.SOLVER.MAX_EPOCH = 20
    marks = [e for e in range(20) if cu.is_checkpoint_epoch(cfg, e)]
    assert marks == [4, 9, 14, 19]


def test_inflate_weight():
    w2d = np.random.RandomState(0).randn(1, 3, 3, 4, 8)
    w3d = cu.inflate_weight(w2d[0][None], 5)
    assert w3d.shape == (5, 3, 3, 4, 8)
    # Sum over T reproduces the 2D filter (the /T scaling preserves output
    # magnitude on temporally-constant input).
    np.testing.assert_allclose(w3d.sum(0), w2d[0], rtol=1e-6)


def test_clear_name_pattern_ssl_to_finetune():
    """TRAIN.CHECKPOINT_CLEAR_NAME_PATTERN=("backbone.",) strips the SSL
    wrapper prefix so a ContrastiveModel checkpoint initializes a plain
    classification model (reference checkpoint.py:298-310; used by the
    contrastive_ssl finetune/linear recipes)."""
    from slowfast_tpu.engine.ssl_steps import create_ssl_train_state

    with tempfile.TemporaryDirectory() as tmp:
        ssl_cfg = _tiny_cfg(tmp)
        ssl_cfg.MODEL.MODEL_NAME = "ContrastiveModel"
        ssl_cfg.MODEL.LOSS_FUNC = "contrastive_loss"
        ssl_cfg.CONTRASTIVE.TYPE = "simclr"
        ssl_cfg.CONTRASTIVE.DIM = 16
        ssl_cfg.CONTRASTIVE.LENGTH = 10
        ssl_model = build_model(ssl_cfg)
        rng = jax.random.PRNGKey(3)
        from slowfast_tpu.models.build import dummy_inputs

        variables = ssl_model.init(
            {"params": rng, "dropout": rng},
            dummy_inputs(ssl_cfg, 2),
            train=True,
        )
        tx, _ = construct_optimizer(variables["params"], ssl_cfg, 10)
        ssl_state = create_ssl_train_state(ssl_cfg, ssl_model, tx, rng=rng)
        path = cu.save_checkpoint(tmp, ssl_state, epoch=0, cfg=ssl_cfg)
        assert "backbone" in ssl_state.params

        ft_cfg = _tiny_cfg(tmp)
        ft_model = build_model(ft_cfg)
        ft_vars = init_model(ft_model, ft_cfg, rng=jax.random.PRNGKey(9),
                             train=True)
        ft_tx, _ = construct_optimizer(ft_vars["params"], ft_cfg, 10)
        fresh = create_train_state(ft_cfg, ft_model, ft_tx,
                                   rng=jax.random.PRNGKey(9))
        ft_cfg.TRAIN.AUTO_RESUME = False
        ft_cfg.TRAIN.CHECKPOINT_FILE_PATH = path
        ft_cfg.TRAIN.CHECKPOINT_EPOCH_RESET = True
        ft_cfg.TRAIN.CHECKPOINT_CLEAR_NAME_PATTERN = ("backbone.",)
        loaded, start_epoch = cu.load_train_checkpoint(ft_cfg, fresh)
        assert start_epoch == 0

        # Trunk weights came from the SSL backbone: compare every non-zero
        # leaf (zero-init BN params are identical in any fresh init).
        ssl_leaves = jax.tree_util.tree_leaves(
            ssl_state.params["backbone"]["s1"]
        )
        got_leaves = jax.tree_util.tree_leaves(loaded.params["s1"])
        fresh_leaves = jax.tree_util.tree_leaves(fresh.params["s1"])
        checked = 0
        for sl, gl, fl in zip(ssl_leaves, got_leaves, fresh_leaves):
            np.testing.assert_array_equal(np.asarray(gl), np.asarray(sl))
            # Constant leaves (zero-init BN biases, ones-init BN scales)
            # are identical in any fresh init; only randomly-initialized
            # kernels distinguish loaded-from-checkpoint from fresh.
            if np.unique(np.asarray(sl)).size > 1:
                assert not np.array_equal(np.asarray(gl), np.asarray(fl))
                checked += 1
        assert checked > 0
        # ... while WITHOUT the pattern nothing matches the plain tree.
        ft_cfg.TRAIN.CHECKPOINT_CLEAR_NAME_PATTERN = ()
        unloaded, _ = cu.load_train_checkpoint(ft_cfg, fresh)
        for ul, fl in zip(
            jax.tree_util.tree_leaves(unloaded.params["s1"]), fresh_leaves
        ):
            np.testing.assert_array_equal(np.asarray(ul), np.asarray(fl))
