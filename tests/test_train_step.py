"""End-to-end train-step tests on a virtual 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from slowfast_tpu.models import build_model
from slowfast_tpu.engine.steps import create_train_state, make_train_step
from slowfast_tpu.parallel.mesh import create_mesh, shard_batch
from slowfast_tpu.solver.optimizer import construct_optimizer


def _setup(cfg):
    model = build_model(cfg)
    tx, _ = construct_optimizer_params(cfg)
    state = create_train_state(cfg, model, tx, rng=jax.random.PRNGKey(0))
    return model, tx, state


def construct_optimizer_params(cfg):
    # params needed for partitioning; build via init inside create_train_state
    # here we do a two-phase: init a model to get params first.
    model = build_model(cfg)
    from slowfast_tpu.models.build import init_model

    variables = init_model(model, cfg, rng=jax.random.PRNGKey(0), train=True)
    return construct_optimizer(variables["params"], cfg, steps_per_epoch=10)


def _batch(cfg, b=8):
    rng = np.random.RandomState(0)
    t, s = cfg.DATA.NUM_FRAMES, cfg.DATA.TRAIN_CROP_SIZE
    if cfg.MODEL.ARCH in cfg.MODEL.MULTI_PATHWAY_ARCH:
        inputs = [
            jnp.asarray(rng.randn(b, t // cfg.SLOWFAST.ALPHA, s, s, 3), jnp.float32),
            jnp.asarray(rng.randn(b, t, s, s, 3), jnp.float32),
        ]
    else:
        inputs = [jnp.asarray(rng.randn(b, t, s, s, 3), jnp.float32)]
    labels = jnp.asarray(rng.randint(0, cfg.MODEL.NUM_CLASSES, b), jnp.int32)
    return {"inputs": inputs, "labels": labels}


def test_train_step_runs_and_learns(tiny_cfg):
    cfg = tiny_cfg
    cfg.MODEL.MODEL_NAME = "ResNet"
    cfg.MODEL.ARCH = "c2d"
    cfg.DATA.INPUT_CHANNEL_NUM = [3]
    cfg.SOLVER.BASE_LR = 0.01
    cfg.SOLVER.WARMUP_EPOCHS = 0.0

    model = build_model(cfg)
    from slowfast_tpu.models.build import init_model

    variables = init_model(model, cfg, rng=jax.random.PRNGKey(0), train=True)
    tx, _ = construct_optimizer(variables["params"], cfg, steps_per_epoch=10)
    state = create_train_state(cfg, model, tx, rng=jax.random.PRNGKey(0))

    step = make_train_step(cfg, model, tx, donate=False)
    batch = _batch(cfg)
    rng = jax.random.PRNGKey(1)
    losses = []
    for _ in range(8):
        state, metrics = step(state, batch, rng)
        losses.append(float(metrics["loss"]))
    assert np.isfinite(losses).all()
    # Same batch re-fed: loss must drop (memorization).
    assert losses[-1] < losses[0]
    assert int(state.step) == 8
    assert "top1_err" in metrics


def test_train_step_sharded_over_mesh(tiny_cfg):
    cfg = tiny_cfg
    cfg.MODEL.MODEL_NAME = "SlowFast"
    cfg.MODEL.ARCH = "slowfast"
    cfg.SLOWFAST.ALPHA = 4
    cfg.SLOWFAST.BETA_INV = 8
    cfg.SLOWFAST.FUSION_KERNEL_SZ = 5
    cfg.DATA.NUM_FRAMES = 4
    cfg.DATA.INPUT_CHANNEL_NUM = [3, 3]

    mesh = create_mesh(cfg)
    assert mesh.devices.size == 8

    model = build_model(cfg)
    from slowfast_tpu.models.build import init_model

    variables = init_model(model, cfg, rng=jax.random.PRNGKey(0), train=True)
    tx, _ = construct_optimizer(variables["params"], cfg, steps_per_epoch=10)
    state = create_train_state(cfg, model, tx, rng=jax.random.PRNGKey(0))

    step = make_train_step(cfg, model, tx, mesh=mesh, donate=False)
    batch = shard_batch(_batch(cfg, b=16), mesh)
    state, metrics = step(state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["loss"]))
    # Batch was sharded over 8 devices.
    assert len(batch["inputs"][0].sharding.device_set) == 8


def test_committed_state_no_second_compile(tiny_cfg):
    """commit_state places the eagerly-created state explicitly so the
    step's second call (fed the committed OUTPUT state of call 1) hits the
    jit cache. Without it the uncommitted->committed aval change forces a
    full recompile (~60s for the flagship through the tunneled chip)."""
    from slowfast_tpu.parallel.mesh import commit_state

    cfg = tiny_cfg
    cfg.MODEL.MODEL_NAME = "ResNet"
    cfg.MODEL.ARCH = "c2d"
    cfg.DATA.INPUT_CHANNEL_NUM = [3]

    model, tx, state = _setup(cfg)
    state = commit_state(state)
    step = make_train_step(cfg, model, tx, donate=False)
    batch = _batch(cfg, b=4)
    state, _ = step(state, batch, jax.random.PRNGKey(1))
    state, m = step(state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(m["loss"]))
    assert step._cache_size() == 1, "second step call recompiled"


def test_spatial_partitioning_matches_data_only_mesh(tiny_cfg):
    """2-D (data, spatial) mesh: the clip H axis is sharded and GSPMD
    inserts the conv halo exchanges; the step must be semantically
    identical to the 1-D data mesh (same loss on the same batch/rng)."""
    cfg = tiny_cfg
    cfg.MODEL.MODEL_NAME = "SlowFast"
    cfg.MODEL.ARCH = "slowfast"
    cfg.SLOWFAST.ALPHA = 4
    cfg.SLOWFAST.BETA_INV = 8
    cfg.SLOWFAST.FUSION_KERNEL_SZ = 5
    cfg.DATA.NUM_FRAMES = 4
    cfg.DATA.INPUT_CHANNEL_NUM = [3, 3]

    model = build_model(cfg)
    from slowfast_tpu.models.build import init_model

    variables = init_model(model, cfg, rng=jax.random.PRNGKey(0), train=True)
    tx, _ = construct_optimizer(variables["params"], cfg, steps_per_epoch=10)

    losses = {}
    for sp in (1, 2):
        cfg.TPU.SPATIAL_PARTITIONS = sp
        mesh = create_mesh(cfg)
        assert mesh.devices.size == 8
        if sp > 1:
            assert mesh.axis_names == ("data", "spatial")
        state = create_train_state(cfg, model, tx, rng=jax.random.PRNGKey(0))
        step = make_train_step(cfg, model, tx, mesh=mesh, donate=False)
        batch = shard_batch(_batch(cfg, b=8), mesh)
        if sp > 1:
            # H really is sharded over the spatial axis.
            spec = batch["inputs"][0].sharding.spec
            assert spec[2] == "spatial"
        state, metrics = step(state, batch, jax.random.PRNGKey(1))
        losses[sp] = float(metrics["loss"])
    assert np.isfinite(losses[1]) and np.isfinite(losses[2])
    np.testing.assert_allclose(losses[1], losses[2], rtol=2e-5)


def test_seq_partitioning_matches_data_only_mesh(tiny_cfg):
    """2-D (data, seq) mesh for the MViT family: the (B, N, C) token axis
    is sharded at every block boundary and GSPMD inserts the attention
    K/V all-gathers; the step must be semantically identical to the 1-D
    data mesh. cls token ON so the N = 1 + THW (uneven) split is
    exercised."""
    cfg = tiny_cfg
    for k, v in {
        "MODEL.MODEL_NAME": "MViT", "MODEL.ARCH": "mvit",
        "MVIT.EMBED_DIM": 32, "MVIT.NUM_HEADS": 1, "MVIT.DEPTH": 4,
        "MVIT.PATCH_KERNEL": [3, 7, 7], "MVIT.PATCH_STRIDE": [2, 4, 4],
        "MVIT.PATCH_PADDING": [1, 3, 3],
        "MVIT.DIM_MUL": [[1, 2.0], [3, 2.0]],
        "MVIT.HEAD_MUL": [[1, 2.0], [3, 2.0]],
        "MVIT.POOL_Q_STRIDE": [[1, 1, 2, 2], [3, 1, 2, 2]],
        "MVIT.POOL_KVQ_KERNEL": [3, 3, 3],
        "MVIT.POOL_KV_STRIDE_ADAPTIVE": [1, 4, 4],
        "MVIT.MODE": "conv", "MVIT.CLS_EMBED_ON": True,
        "MVIT.SEP_POS_EMBED": False, "MVIT.USE_ABS_POS": False,
        "MVIT.REL_POS_SPATIAL": True, "MVIT.REL_POS_TEMPORAL": True,
        "MVIT.RESIDUAL_POOLING": True, "MVIT.DIM_MUL_IN_ATT": True,
        "MVIT.USE_MEAN_POOLING": True, "MVIT.DROPPATH_RATE": 0.0,
        "MODEL.LOSS_FUNC": "cross_entropy",
    }.items():
        cfg.merge_from_list([k, v])
    cfg.DATA.INPUT_CHANNEL_NUM = [3]

    model = build_model(cfg)
    from slowfast_tpu.models.build import init_model

    variables = init_model(model, cfg, rng=jax.random.PRNGKey(0), train=True)
    tx, _ = construct_optimizer(variables["params"], cfg, steps_per_epoch=10)

    losses = {}
    for sq in (1, 4):
        cfg.TPU.SEQ_PARTITIONS = sq
        mesh = create_mesh(cfg)
        assert mesh.devices.size == 8
        if sq > 1:
            assert mesh.axis_names == ("data", "seq")
        state = create_train_state(cfg, model, tx, rng=jax.random.PRNGKey(0))
        step = make_train_step(cfg, model, tx, mesh=mesh, donate=False)
        batch = shard_batch(_batch(cfg, b=8), mesh)
        state, metrics = step(state, batch, jax.random.PRNGKey(1))
        losses[sq] = float(metrics["loss"])
    assert np.isfinite(losses[1]) and np.isfinite(losses[4])
    # CPU-backend einsums run through a reduced-precision matmul path
    # (~0.2% rel error even in fp32) and sharding changes the
    # accumulation split, so exact equality is not achievable here; the
    # tolerance absorbs that backend noise only.
    np.testing.assert_allclose(losses[1], losses[4], rtol=3e-3)


def test_tensor_partitioning_matches_data_only_mesh(tiny_cfg):
    """2-D (data, model) mesh for the MViT family: attention q/k/v channels
    (head-major, so heads split across chips) and the MLP hidden axis are
    sharded; GSPMD inserts the psum after the row-parallel proj/fc2. The
    step must be semantically identical to the 1-D data mesh."""
    cfg = tiny_cfg
    for k, v in {
        "MODEL.MODEL_NAME": "MViT", "MODEL.ARCH": "mvit",
        "MVIT.EMBED_DIM": 32, "MVIT.NUM_HEADS": 2, "MVIT.DEPTH": 4,
        "MVIT.PATCH_KERNEL": [3, 7, 7], "MVIT.PATCH_STRIDE": [2, 4, 4],
        "MVIT.PATCH_PADDING": [1, 3, 3],
        "MVIT.DIM_MUL": [[1, 2.0], [3, 2.0]],
        "MVIT.HEAD_MUL": [[1, 2.0], [3, 2.0]],
        "MVIT.POOL_Q_STRIDE": [[1, 1, 2, 2], [3, 1, 2, 2]],
        "MVIT.POOL_KVQ_KERNEL": [3, 3, 3],
        "MVIT.POOL_KV_STRIDE_ADAPTIVE": [1, 4, 4],
        "MVIT.MODE": "conv", "MVIT.CLS_EMBED_ON": True,
        "MVIT.SEP_POS_EMBED": False, "MVIT.USE_ABS_POS": False,
        "MVIT.REL_POS_SPATIAL": True, "MVIT.REL_POS_TEMPORAL": True,
        "MVIT.RESIDUAL_POOLING": True, "MVIT.DIM_MUL_IN_ATT": True,
        "MVIT.USE_MEAN_POOLING": True, "MVIT.DROPPATH_RATE": 0.0,
        "MODEL.LOSS_FUNC": "cross_entropy",
    }.items():
        cfg.merge_from_list([k, v])
    cfg.DATA.INPUT_CHANNEL_NUM = [3]

    model = build_model(cfg)
    from slowfast_tpu.models.build import init_model

    variables = init_model(model, cfg, rng=jax.random.PRNGKey(0), train=True)
    tx, _ = construct_optimizer(variables["params"], cfg, steps_per_epoch=10)

    losses = {}
    for tp in (1, 2):
        cfg.TPU.TENSOR_PARTITIONS = tp
        mesh = create_mesh(cfg)
        assert mesh.devices.size == 8
        if tp > 1:
            assert mesh.axis_names == ("data", "model")
        state = create_train_state(cfg, model, tx, rng=jax.random.PRNGKey(0))
        step = make_train_step(cfg, model, tx, mesh=mesh, donate=False)
        batch = shard_batch(_batch(cfg, b=8), mesh)
        state, metrics = step(state, batch, jax.random.PRNGKey(1))
        losses[tp] = float(metrics["loss"])
    assert np.isfinite(losses[1]) and np.isfinite(losses[2])
    # Same CPU-backend matmul accumulation noise bound as the seq test.
    np.testing.assert_allclose(losses[1], losses[2], rtol=3e-3)

    # Startup validation: tp must divide every block's head count, and a
    # non-MViT model has no constraint sites at all.
    import pytest

    cfg.TPU.TENSOR_PARTITIONS = 8  # heads are 2 -> 4 -> 8; 8 % 8 ok, 2 % 8 not
    with pytest.raises(ValueError, match="head count"):
        create_mesh(cfg)
    cfg.TPU.TENSOR_PARTITIONS = 2
    cfg.MODEL.MODEL_NAME = "ResNet"
    with pytest.raises(ValueError, match="MViT-family"):
        create_mesh(cfg)
    # ContrastiveModel wrapping an MViT backbone has constraint sites
    # (ssl_steps activates tp_partitioning) and must pass the gate …
    cfg.MODEL.MODEL_NAME = "ContrastiveModel"
    cfg.MODEL.ARCH = "mvit"
    assert create_mesh(cfg).axis_names == ("data", "model")
    # … but not with a conv backbone.
    cfg.MODEL.ARCH = "slowfast"
    with pytest.raises(ValueError, match="MViT-family"):
        create_mesh(cfg)


def test_global_batch_stats_match_single_device(tiny_cfg):
    """BN stats under a sharded batch must equal the unsharded computation
    (GSPMD computes global-batch statistics)."""
    cfg = tiny_cfg
    cfg.MODEL.MODEL_NAME = "ResNet"
    cfg.MODEL.ARCH = "c2d"
    cfg.DATA.INPUT_CHANNEL_NUM = [3]

    model = build_model(cfg)
    from slowfast_tpu.models.build import init_model

    variables = init_model(model, cfg, rng=jax.random.PRNGKey(0), train=True)
    batch = _batch(cfg, b=8)

    def fwd(v, x):
        return model.apply(
            v, x, train=True, mutable=["batch_stats"],
            rngs={"dropout": jax.random.PRNGKey(0)},
        )[1]["batch_stats"]

    stats_single = jax.jit(fwd)(variables, batch["inputs"])
    mesh = create_mesh(cfg)
    sharded_inputs = shard_batch(batch, mesh)["inputs"]
    stats_sharded = jax.jit(fwd)(variables, sharded_inputs)
    for a, b in zip(jax.tree.leaves(stats_single), jax.tree.leaves(stats_sharded)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=5e-4, atol=5e-4)
