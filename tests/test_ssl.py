"""SSL (contrastive) train-step tests on CPU."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from slowfast_tpu.config import get_cfg
from slowfast_tpu.engine.ssl_steps import (
    create_ssl_train_state,
    make_ssl_train_step,
)
from slowfast_tpu.models import build_model
from slowfast_tpu.solver.optimizer import construct_optimizer


def _ssl_cfg(ssl_type):
    cfg = get_cfg()
    cfg.MODEL.MODEL_NAME = "ContrastiveModel"
    cfg.MODEL.ARCH = "c2d"
    cfg.MODEL.NUM_CLASSES = 32
    cfg.MODEL.LOSS_FUNC = "contrastive_loss"
    cfg.MODEL.HEAD_ACT = "none"
    cfg.MODEL.DROPOUT_RATE = 0.0
    cfg.RESNET.DEPTH = 18
    cfg.RESNET.NUM_BLOCK_TEMP_KERNEL = [[2], [2], [2], [2]]
    cfg.CONTRASTIVE.TYPE = ssl_type
    cfg.CONTRASTIVE.DIM = 32
    cfg.CONTRASTIVE.QUEUE_LEN = 64
    cfg.CONTRASTIVE.LENGTH = 50
    cfg.CONTRASTIVE.NUM_MLP_LAYERS = 2
    cfg.CONTRASTIVE.MLP_DIM = 64
    if ssl_type == "byol":
        cfg.CONTRASTIVE.PREDICTOR_DEPTHS = [2]
    cfg.DATA.NUM_FRAMES = 4
    cfg.DATA.TRAIN_CROP_SIZE = 32
    cfg.DATA.INPUT_CHANNEL_NUM = [3]
    cfg.SOLVER.BASE_LR = 0.01
    cfg.SOLVER.WARMUP_EPOCHS = 0.0
    cfg.TPU.COMPUTE_DTYPE = "float32"
    cfg.NUM_GPUS = 1
    return cfg


def _batch(cfg, b=4):
    rng = np.random.RandomState(0)
    t, s = cfg.DATA.NUM_FRAMES, cfg.DATA.TRAIN_CROP_SIZE
    return {
        "inputs": [jnp.asarray(rng.randn(b, t, s, s, 3), jnp.float32)],
        "inputs2": [jnp.asarray(rng.randn(b, t, s, s, 3), jnp.float32)],
        "index": jnp.arange(b, dtype=jnp.int32),
    }


@pytest.mark.parametrize("ssl_type", ["moco", "byol", "simclr", "swav", "mem"])
def test_ssl_step_runs(ssl_type):
    cfg = _ssl_cfg(ssl_type)
    model = build_model(cfg)
    state = create_ssl_train_state(cfg, model, tx=None) if False else None
    # two-phase init for optimizer partitioning
    from slowfast_tpu.models.build import dummy_inputs

    rng = jax.random.PRNGKey(0)
    variables = model.init(
        {"params": rng, "dropout": rng}, dummy_inputs(cfg, 2), train=True
    )
    tx, _ = construct_optimizer(variables["params"], cfg, steps_per_epoch=10)
    state = create_ssl_train_state(cfg, model, tx, rng=rng)

    step = make_ssl_train_step(cfg, model, tx, steps_per_epoch=10, donate=False)
    batch = _batch(cfg)
    losses = []
    for _ in range(3):
        state, m = step(state, batch, jax.random.PRNGKey(1))
        losses.append(float(m["loss"]))
    assert np.isfinite(losses).all(), losses
    assert int(state.step) == 3
    if ssl_type == "moco":
        # queue pointer advanced by 3 batches of 4 keys
        assert int(state.ssl_state["ptr"]) == 12
    if ssl_type in ("moco", "byol"):
        # EMA params moved toward online params but are not equal
        h = jax.tree.leaves(state.ssl_state["hist_params"])[0]
        p = jax.tree.leaves(state.params["backbone"])[0]
        assert not np.allclose(np.asarray(h), np.asarray(p))


def test_ssl_step_runs_on_2d_mesh():
    """SSL step on a (data, spatial) mesh: explicit batch shardings and the
    partitioning contexts compose with the momentum-encoder/queue state
    updates (all state replicated, batch sharded)."""
    from slowfast_tpu.parallel.mesh import create_mesh, shard_batch

    cfg = _ssl_cfg("byol")
    cfg.TPU.SPATIAL_PARTITIONS = 2
    mesh = create_mesh(cfg)
    assert mesh.axis_names == ("data", "spatial")
    model = build_model(cfg)
    from slowfast_tpu.models.build import dummy_inputs

    rng = jax.random.PRNGKey(0)
    variables = model.init(
        {"params": rng, "dropout": rng}, dummy_inputs(cfg, 2), train=True
    )
    tx, _ = construct_optimizer(variables["params"], cfg, steps_per_epoch=10)
    state = create_ssl_train_state(cfg, model, tx, rng=rng)
    step = make_ssl_train_step(
        cfg, model, tx, mesh=mesh, steps_per_epoch=10, donate=False
    )
    batch = _batch(cfg, b=8)
    batch["time"] = jnp.zeros((8,), jnp.float32)
    batch = shard_batch(batch, mesh)
    state, m = step(state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(m["loss"]))


def test_ssl_step_tensor_partitioning_mvit_backbone():
    """SSL with an MViT backbone under a (data, model) mesh: create_mesh
    accepts the ContrastiveModel + mvit combination, make_ssl_train_step's
    tp_partitioning context activates the backbone's channel constraints,
    and the loss matches the data-only mesh (CPU matmul noise bound)."""
    from slowfast_tpu.parallel.mesh import create_mesh, shard_batch

    cfg = _ssl_cfg("simclr")
    cfg.MODEL.ARCH = "mvit"
    cfg.CONTRASTIVE.T = 0.1
    cfg.MVIT.EMBED_DIM = 16
    cfg.MVIT.NUM_HEADS = 2
    cfg.MVIT.DEPTH = 2
    cfg.MVIT.PATCH_KERNEL = [3, 7, 7]
    cfg.MVIT.PATCH_STRIDE = [2, 4, 4]
    cfg.MVIT.PATCH_PADDING = [1, 3, 3]
    cfg.MVIT.POOL_Q_STRIDE = []
    cfg.MVIT.POOL_KV_STRIDE_ADAPTIVE = [1, 2, 2]
    cfg.MVIT.POOL_KVQ_KERNEL = [3, 3, 3]
    cfg.MVIT.MODE = "conv"
    cfg.MVIT.CLS_EMBED_ON = False
    cfg.MVIT.USE_MEAN_POOLING = True
    cfg.MVIT.USE_ABS_POS = False
    cfg.MVIT.REL_POS_SPATIAL = False
    cfg.MVIT.REL_POS_TEMPORAL = False

    model = build_model(cfg)
    from slowfast_tpu.models.build import dummy_inputs

    rng = jax.random.PRNGKey(0)
    variables = model.init(
        {"params": rng, "dropout": rng}, dummy_inputs(cfg, 2), train=True
    )
    tx, _ = construct_optimizer(variables["params"], cfg, steps_per_epoch=10)

    losses = {}
    for tp in (1, 2):
        cfg.TPU.TENSOR_PARTITIONS = tp
        mesh = create_mesh(cfg)
        if tp > 1:
            assert mesh.axis_names == ("data", "model")
        state = create_ssl_train_state(cfg, model, tx, rng=rng)
        step = make_ssl_train_step(
            cfg, model, tx, mesh=mesh, steps_per_epoch=10, donate=False
        )
        batch = _batch(cfg, b=8)
        batch["time"] = jnp.zeros((8,), jnp.float32)
        batch = shard_batch(batch, mesh)
        state, m = step(state, batch, jax.random.PRNGKey(1))
        losses[tp] = float(m["loss"])
    assert np.isfinite(losses[1]) and np.isfinite(losses[2])
    np.testing.assert_allclose(losses[1], losses[2], rtol=3e-3)


def test_swav_queue_and_prototype_surgery():
    cfg = _ssl_cfg("swav")
    cfg.CONTRASTIVE.SWAV_QEUE_LEN = 8
    model = build_model(cfg)
    from slowfast_tpu.models.build import dummy_inputs

    rng = jax.random.PRNGKey(0)
    variables = model.init(
        {"params": rng, "dropout": rng}, dummy_inputs(cfg, 2), train=True
    )
    tx, _ = construct_optimizer(variables["params"], cfg, steps_per_epoch=10)
    state = create_ssl_train_state(cfg, model, tx, rng=rng)
    proto0 = np.asarray(state.params["swav_prototypes"]["kernel"])

    step = make_ssl_train_step(cfg, model, tx, steps_per_epoch=10, donate=False)
    batch = _batch(cfg)
    for i in range(3):
        state, m = step(state, batch, jax.random.PRNGKey(1))
        assert np.isfinite(float(m["loss"]))
    # Queue warmed by 3 batches of 4 (capped at 8) and holds embeddings.
    assert int(state.ssl_state["swav_filled"]) == 8
    qv = np.asarray(state.ssl_state["queue_swav"])
    assert qv.shape == (2, 8, cfg.CONTRASTIVE.DIM)
    assert np.abs(qv).sum() > 0
    # Prototypes frozen during epoch <= 1 (steps 0-2 are epoch 0): the
    # kernel may only change by the post-update renormalization.
    proto3 = np.asarray(state.params["swav_prototypes"]["kernel"])
    norm0 = proto0 / np.linalg.norm(proto0, axis=0, keepdims=True)
    np.testing.assert_allclose(proto3, norm0, atol=1e-5)
    # Columns are unit-norm after the renorm surgery.
    np.testing.assert_allclose(
        np.linalg.norm(proto3, axis=0), 1.0, atol=1e-5
    )


def test_moco_queue_warmup_blocks_updates():
    cfg = _ssl_cfg("moco")
    cfg.CONTRASTIVE.QUEUE_LEN = 64
    cfg.TRAIN.BATCH_SIZE = 4  # -> 16 warmup iterations
    model = build_model(cfg)
    from slowfast_tpu.models.build import dummy_inputs

    rng = jax.random.PRNGKey(0)
    variables = model.init(
        {"params": rng, "dropout": rng}, dummy_inputs(cfg, 2), train=True
    )
    tx, _ = construct_optimizer(variables["params"], cfg, steps_per_epoch=100)
    state = create_ssl_train_state(cfg, model, tx, rng=rng)
    p0 = np.asarray(jax.tree.leaves(state.params["backbone"])[0])

    step = make_ssl_train_step(cfg, model, tx, steps_per_epoch=100, donate=False)
    batch = _batch(cfg)
    state, _ = step(state, batch, jax.random.PRNGKey(1))
    # Step 0 < 16 warmup iters: parameters must be unchanged.
    p1 = np.asarray(jax.tree.leaves(state.params["backbone"])[0])
    np.testing.assert_array_equal(p0, p1)


def test_moco_key_encoder_has_own_ema_batch_stats():
    """The momentum encoder must carry its own EMA'd BN stats (reference
    contrastive.py:153-168 EMAs all named buffers), distinct from the
    query encoder's stats after a few steps."""
    cfg = _ssl_cfg("moco")
    model = build_model(cfg)
    from slowfast_tpu.models.build import dummy_inputs

    rng = jax.random.PRNGKey(0)
    variables = model.init(
        {"params": rng, "dropout": rng}, dummy_inputs(cfg, 2), train=True
    )
    tx, _ = construct_optimizer(variables["params"], cfg, steps_per_epoch=10)
    state = create_ssl_train_state(cfg, model, tx, rng=rng)
    assert "hist_batch_stats" in state.ssl_state

    step = make_ssl_train_step(cfg, model, tx, steps_per_epoch=10, donate=False)
    batch = _batch(cfg)
    for _ in range(3):
        state, _ = step(state, batch, jax.random.PRNGKey(1))
    hist = np.concatenate(
        [np.ravel(x) for x in jax.tree.leaves(
            state.ssl_state["hist_batch_stats"])]
    )
    online = np.concatenate(
        [np.ravel(x) for x in jax.tree.leaves(state.batch_stats)]
    )
    # EMA'd stats lag the online stats: moved from init but not equal.
    assert hist.size == online.size
    assert not np.allclose(hist, online)


def test_ssl_views_decorrelated_by_color_jitter():
    """With DATA.SSL_COLOR_JITTER the two MoCo views of the same clip must
    differ beyond crop/flip: force identical crops and assert a pixel
    difference (VERDICT #6)."""
    from slowfast_tpu.data.transform import color_jitter_video_ssl

    rs = np.random.RandomState(0)
    clip = rs.rand(4, 16, 16, 3).astype(np.float32)
    v1 = color_jitter_video_ssl(clip.copy(), moco_v2_aug=True, p_convert_gray=0.2)
    v2 = color_jitter_video_ssl(clip.copy(), moco_v2_aug=True, p_convert_gray=0.2)
    diff = np.abs(v1 - v2).mean()
    assert diff > 1e-3, f"views not decorrelated (mean diff {diff})"
    # Output stays a valid [0,1] clip of the same shape.
    assert v1.shape == clip.shape
    assert v1.min() >= 0.0 and v1.max() <= 1.0


def test_temporal_difference_and_blur():
    from slowfast_tpu.data.transform import (
        GaussianBlurVideo,
        augment_raw_frames,
        temporal_difference,
    )

    rs = np.random.RandomState(1)
    clip = (rs.rand(4, 8, 8, 3) * 255).astype(np.float32)
    td = temporal_difference(clip, use_grayscale=True)
    assert td.shape == clip.shape
    # Grayscale: all three channels identical.
    np.testing.assert_allclose(td[..., 0], td[..., 1], atol=1e-4)
    # Last frame repeats the previous difference.
    np.testing.assert_allclose(td[-1], td[-2], atol=1e-4)

    blurred = GaussianBlurVideo(sigma_min=[0.0, 1.0], sigma_max=[0.0, 1.0])(clip)
    assert blurred.shape == clip.shape
    # Blur reduces spatial variance.
    assert blurred.std() < clip.std()

    out, applied = augment_raw_frames(clip, time_diff_prob=1.0)
    assert applied
    assert out.min() >= 0.0 and out.max() <= 255.0


def test_mem_2d_memory_and_interp():
    """Time-indexed 2d bank: NCE runs, and the update writes the indexed
    time slots (reference Memory :887-984)."""
    cfg = _ssl_cfg("mem")
    cfg.CONTRASTIVE.MEM_TYPE = "2d"
    cfg.CONTRASTIVE.DURATION = 4
    model = build_model(cfg)
    from slowfast_tpu.models.build import dummy_inputs

    rng = jax.random.PRNGKey(0)
    variables = model.init(
        {"params": rng, "dropout": rng}, dummy_inputs(cfg, 2), train=True
    )
    tx, _ = construct_optimizer(variables["params"], cfg, steps_per_epoch=10)
    state = create_ssl_train_state(cfg, model, tx, rng=rng)
    assert state.ssl_state["memory"].shape == (50, 4, 32)
    step = make_ssl_train_step(cfg, model, tx, steps_per_epoch=10)
    batch = _batch(cfg)
    batch["time"] = jnp.zeros((4,), jnp.float32)
    before = np.asarray(state.ssl_state["memory"])
    state2, m = step(state, batch, jax.random.PRNGKey(0))
    assert np.isfinite(float(m["loss"]))
    after = np.asarray(state2.ssl_state["memory"])
    # Rows 0..3 at time slot 0 were updated; slots 1..3 untouched.
    assert not np.allclose(before[:4, 0], after[:4, 0])
    np.testing.assert_array_equal(before[:4, 1:], after[:4, 1:])
    np.testing.assert_array_equal(before[4:], after[4:])


def test_nce_sampled_logits_match_direct_gather():
    """The MXU-first full-matmul+gather NCE equals the direct (B,K+1,C)
    gather einsum (reference contrastive.py:413-417)."""
    from slowfast_tpu.models.contrastive import nce_logits, nce_sample_indices

    rng = jax.random.PRNGKey(0)
    q = jax.random.normal(rng, (4, 16))
    memory = jax.random.normal(jax.random.fold_in(rng, 1), (30, 16))
    clip_ind, time_ind = nce_sample_indices(
        jax.random.fold_in(rng, 2), jnp.arange(4), 30, 8
    )
    assert clip_ind.shape == (4, 9)
    np.testing.assert_array_equal(np.asarray(clip_ind[:, 0]), np.arange(4))
    got = nce_logits(q, memory, clip_ind, time_ind, 0.07)
    ref = jnp.einsum("nc,nkc->nk", q, memory[clip_ind]) / 0.07
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-5)

    # 2d bank with interp: logits are the time-interpolated similarity.
    mem2d = jax.random.normal(jax.random.fold_in(rng, 3), (30, 4, 16))
    clip_ind, t_cont = nce_sample_indices(
        jax.random.fold_in(rng, 4), jnp.arange(4), 30, 8, duration=4,
        interp=True,
    )
    got = nce_logits(q, mem2d, clip_ind, t_cont, 0.07, interp=True)
    t0 = jnp.clip(jnp.floor(t_cont).astype(jnp.int32), 0, 3)
    t1 = jnp.clip(t0 + 1, 0, 3)
    w_t1 = 1.0 - (t_cont - t0)
    k = mem2d[clip_ind, t0] * (1.0 - w_t1)[..., None] + mem2d[
        clip_ind, t1
    ] * w_t1[..., None]
    ref = jnp.einsum("nc,nkc->nk", q, k) / 0.07
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-4)


def test_moco_multi_view_queue_enqueues_all_views():
    """CONTRASTIVE.MOCO_MULTI_VIEW_QUEUE: keys from BOTH views enter the
    queue, so the pointer advances by 2B per step (reference
    _dequeue_and_enqueue extra_keys, contrastive.py:255-283)."""
    cfg = _ssl_cfg("moco")
    cfg.CONTRASTIVE.MOCO_MULTI_VIEW_QUEUE = True
    model = build_model(cfg)
    from slowfast_tpu.models.build import dummy_inputs

    rng = jax.random.PRNGKey(0)
    variables = model.init(
        {"params": rng, "dropout": rng}, dummy_inputs(cfg, 2), train=True
    )
    tx, _ = construct_optimizer(variables["params"], cfg, steps_per_epoch=10)
    state = create_ssl_train_state(cfg, model, tx, rng=rng)
    step = make_ssl_train_step(cfg, model, tx, steps_per_epoch=10, donate=False)
    state, m = step(state, _batch(cfg, b=4), jax.random.PRNGKey(1))
    assert np.isfinite(float(m["loss"]))
    assert int(state.ssl_state["ptr"]) == 8  # 2 views x B=4


def test_moco_shuffle_bn_keys_match_manual_computation():
    """Shuffle-BN (reference _batch_shuffle/_batch_unshuffle,
    contrastive.py:169-226): with BN.NORM_TYPE=sub_batchnorm the MoCo key
    encoder must permute the global key batch, run with fresh per-split
    train-mode stats, and inverse-permute. Verified end to end by reading
    the enqueued keys out of the queue after one step and reproducing
    them manually with the same rng chain."""
    from slowfast_tpu.models.build import dummy_inputs
    from slowfast_tpu.models.contrastive import ContrastiveModel

    cfg = _ssl_cfg("moco")
    cfg.BN.NORM_TYPE = "sub_batchnorm"
    cfg.BN.NUM_SPLITS = 2
    model = build_model(cfg)
    rng = jax.random.PRNGKey(0)
    variables = model.init(
        {"params": rng, "dropout": rng}, dummy_inputs(cfg, 2), train=True
    )
    tx, _ = construct_optimizer(variables["params"], cfg, steps_per_epoch=10)
    state = create_ssl_train_state(cfg, model, tx, rng=rng)
    hist_params = state.ssl_state["hist_params"]
    hist_stats = state.ssl_state.get("hist_batch_stats", state.batch_stats)

    step = make_ssl_train_step(cfg, model, tx, steps_per_epoch=10, donate=False)
    batch = _batch(cfg, b=4)
    step_rng = jax.random.PRNGKey(1)
    new_state, m = step(state, batch, step_rng)
    assert np.isfinite(float(m["loss"]))
    got = np.asarray(new_state.ssl_state["queue_x"][:4])

    # Manual reproduction of encode_keys' rng chain (ssl_steps.py step_fn):
    # fold in step index, split, shuffle from fold_in(r2, 17). Jitted so
    # the numerics match the compiled step (eager rsqrt differs enough
    # through a deep BN backbone to swamp a tolerance check).
    r = jax.random.fold_in(step_rng, 0)
    _r1, r2 = jax.random.split(r)
    perm = jax.random.permutation(jax.random.fold_in(r2, 17), 4)
    assert not np.array_equal(np.asarray(perm), np.arange(4))  # permutes

    def manual(xs):
        xs_sh = [x[perm] for x in xs]
        out, _ = model.apply(
            {"params": {"backbone": hist_params}, "batch_stats": hist_stats},
            xs_sh,
            train=True,
            mutable=["batch_stats"],
            rngs={"dropout": jax.random.fold_in(r2, 18)},
            method=ContrastiveModel.encode,
        )
        return out[jnp.argsort(perm)]

    want = np.asarray(jax.jit(manual)(batch["inputs2"]))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_moco_shuffle_bn_keys_use_batch_stats_only_under_sub_bn():
    """Property split: under sub-BN the keys of sample 0 depend on the
    rest of the key batch (train-mode batch statistics — the leakage the
    shuffle randomizes); under the default global-BN path the key encoder
    uses frozen EMA stats, so keys are per-sample functions."""
    from slowfast_tpu.models.build import dummy_inputs

    def keys_after_one_step(cfg, batch):
        model = build_model(cfg)
        rng = jax.random.PRNGKey(0)
        model.init(
            {"params": rng, "dropout": rng}, dummy_inputs(cfg, 2), train=True
        )
        variables = model.init(
            {"params": rng, "dropout": rng}, dummy_inputs(cfg, 2), train=True
        )
        tx, _ = construct_optimizer(
            variables["params"], cfg, steps_per_epoch=10
        )
        state = create_ssl_train_state(cfg, model, tx, rng=rng)
        step = make_ssl_train_step(
            cfg, model, tx, steps_per_epoch=10, donate=False
        )
        state, _ = step(state, batch, jax.random.PRNGKey(1))
        return np.asarray(state.ssl_state["queue_x"][:4])

    base = _batch(cfg=_ssl_cfg("moco"), b=4)
    perturbed = dict(base)
    x2 = np.asarray(base["inputs2"][0]).copy()
    x2[3] += 1.5  # perturb a DIFFERENT sample than the one we read
    perturbed["inputs2"] = [jnp.asarray(x2)]

    cfg = _ssl_cfg("moco")
    cfg.BN.NORM_TYPE = "sub_batchnorm"
    cfg.BN.NUM_SPLITS = 2
    k_base = keys_after_one_step(cfg, base)
    k_pert = keys_after_one_step(cfg, perturbed)
    assert np.abs(k_base[0] - k_pert[0]).max() > 1e-6, (
        "sub-BN shuffle keys must see batch statistics"
    )

    cfg = _ssl_cfg("moco")  # default: plain BN, frozen-stat keys
    k_base = keys_after_one_step(cfg, base)
    k_pert = keys_after_one_step(cfg, perturbed)
    np.testing.assert_allclose(k_base[0], k_pert[0], rtol=1e-6, atol=1e-6)
