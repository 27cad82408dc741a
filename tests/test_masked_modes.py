"""Parity + behavior tests for the reference MASK mode matrix.

Covers the mode combinations from reference masked.py that round 3 guarded
as NotImplemented: MAE with loader masks (:299-301), PER_FRAME_MASKING
(:332-338, :407-413), DECODER_SEP_POS_EMBED (:87-101, :416-433), decoder
KV pooling (head_helper.py:595-596 DEC_KV_KERNEL/STRIDE), MaskFeat with
on-device random masks (:521-525), and AUG.MASK_TUBE (:291-297).

Parity strategy: random-mask modes are made deterministic by feeding both
implementations the same noise tensor (loader-mask modes pass a
unique-valued float mask; RNG modes monkeypatch torch.rand /
jax.random.uniform) — argsort of distinct values is permutation-identical
across frameworks, so the masked sets coincide and outputs must match.
"""

import os
import tempfile

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from slowfast_tpu.config import get_cfg  # noqa: E402
from slowfast_tpu.models import build_model  # noqa: E402
from slowfast_tpu.models.build import init_model  # noqa: E402
from slowfast_tpu.utils.checkpoint import load_torch_checkpoint  # noqa: E402

REF = "/root/reference"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference repo not mounted"
)

# Tiny ViT-style trunk (no pooling: MAE visible-token mode and random-mask
# MaskFeat both require feature grid == patch grid, as in the reference
# recipes). 4 frames x 64px crop, patch (2, 16, 16) -> (2, 4, 4) = 32 tokens.
BASE = [
    "MODEL.MODEL_NAME", "MaskMViT", "MODEL.ARCH", "maskmvit",
    "MODEL.NUM_CLASSES", "16", "MODEL.DROPOUT_RATE", "0.0",
    "MASK.ENABLE", "True", "MASK.PRETRAIN_DEPTH", "[1]",
    "MVIT.EMBED_DIM", "64", "MVIT.NUM_HEADS", "2", "MVIT.DEPTH", "2",
    "MVIT.PATCH_KERNEL", "[2,16,16]", "MVIT.PATCH_STRIDE", "[2,16,16]",
    "MVIT.PATCH_PADDING", "[0,0,0]",
    "MVIT.MODE", "conv", "MVIT.CLS_EMBED_ON", "True",
    "MVIT.SEP_POS_EMBED", "True", "MVIT.USE_ABS_POS", "True",
    "MVIT.QKV_BIAS", "True", "MVIT.DROPPATH_RATE", "0.0",
    "MVIT.ZERO_DECAY_POS_CLS", "False", "MVIT.NORM", "layernorm",
    "DATA.NUM_FRAMES", "4", "DATA.TRAIN_CROP_SIZE", "64",
    "DATA.TEST_CROP_SIZE", "64", "DATA.INPUT_CHANNEL_NUM", "[3]",
]


def _ref_masked(overrides):
    from tests.ref_compat.loader import load_reference

    load_reference()
    import torch
    from slowfast.config.defaults import get_cfg as ref_get_cfg
    from slowfast.models.masked import MaskMViT as RefMaskMViT

    rcfg = ref_get_cfg()
    rcfg.merge_from_list(overrides)
    rcfg.NUM_GPUS = 0
    torch.manual_seed(0)
    model = RefMaskMViT(rcfg)
    model.eval()
    return model, rcfg


def _my_model(overrides):
    cfg = get_cfg()
    cfg.merge_from_list(overrides)
    cfg.NUM_GPUS = 1
    cfg.TPU.COMPUTE_DTYPE = "float32"
    model = build_model(cfg)
    variables = init_model(model, cfg, rng=jax.random.PRNGKey(0), train=False)
    return model, variables, cfg


def _import_weights(ref_model, variables, allow_unexpected=()):
    import torch

    with tempfile.NamedTemporaryFile(suffix=".pyth") as f:
        torch.save({"model_state": ref_model.state_dict()}, f.name)
        new_vars, missing, unexpected = load_torch_checkpoint(f.name, variables)
    assert not missing, f"missing: {missing[:10]}"
    leftover = [u for u in unexpected if u.split(".")[-1] not in allow_unexpected]
    assert not leftover, f"unexpected: {leftover[:10]}"
    return new_vars


def _ref_forward(ref_model, x_np, mask_np=None):
    """Reference forward: NCTHW tensor (+ optional mask)."""
    import torch

    t = torch.from_numpy(np.ascontiguousarray(x_np.transpose(0, 4, 1, 2, 3)))
    with torch.no_grad():
        if mask_np is None:
            return ref_model([t])
        return ref_model([t, None, torch.from_numpy(mask_np)])


def _my_forward(model, variables, x_np, mask_np=None):
    kwargs = {} if mask_np is None else {"mask": jnp.asarray(mask_np)}
    return model.apply(
        variables, [jnp.asarray(x_np)], train=False,
        rngs={"dropout": jax.random.PRNGKey(1)}, **kwargs
    )


def _unique_mask(b, t, h, w, seed=0):
    """Float mask whose values are distinct binary fractions with mean
    exactly 0.5 -> both sides derive len_keep = N//2 with no rounding or
    argsort-tie ambiguity."""
    n = t * h * w
    vals = (np.arange(n, dtype=np.float64) + 0.5) / n
    rs = np.random.RandomState(seed)
    out = np.stack([rs.permutation(vals) for _ in range(b)])
    return out.reshape(b, t, h, w).astype(np.float32)


def test_maskfeat_pixel_loader_mask_parity():
    """MaskFeat (pixel targets) with a loader mask: full-grid weighted
    predictions match the reference's gathered x[mask] rows."""
    overrides = BASE + [
        "MASK.PRED_HOG", "False", "MASK.NORM_PRED_PIXEL", "True",
        "MASK.HEAD_TYPE", "separate",
        "AUG.MASK_WINDOW_SIZE", "[2,4,4]",
    ]
    ref_model, _ = _ref_masked(overrides)
    model, variables, cfg = _my_model(overrides)
    variables = _import_weights(ref_model, variables)

    rs = np.random.RandomState(0)
    x = rs.randn(2, 4, 64, 64, 3).astype(np.float32)
    mask = (rs.rand(2, 2, 4, 4) > 0.5).astype(np.float32)

    ref_preds, ref_labels = _ref_forward(ref_model, x, mask)
    preds, labels = _my_forward(model, variables, x, mask)

    m = np.asarray(labels[0][1]).astype(bool)  # (B, N_d)
    got = np.asarray(preds[0])[m]
    np.testing.assert_allclose(got, ref_preds[0].numpy(), rtol=1e-3, atol=2e-4)
    got_lab = np.asarray(labels[0][0])[m]
    np.testing.assert_allclose(
        got_lab, ref_labels[0][0].numpy(), rtol=1e-3, atol=2e-4
    )


def test_maskfeat_hog_loader_mask_parity():
    """MaskFeat with HOG targets: the from-scratch HOG op + head match the
    reference HOGLayerC pipeline end to end."""
    overrides = BASE + [
        "MASK.PRED_HOG", "True", "MASK.HEAD_TYPE", "separate",
        "AUG.MASK_WINDOW_SIZE", "[2,4,4]",
    ]
    ref_model, _ = _ref_masked(overrides)
    model, variables, cfg = _my_model(overrides)
    # HOGLayerC registers its fixed sobel taps as buffers; ours are constants.
    variables = _import_weights(
        ref_model, variables, allow_unexpected=("weight_x", "weight_y")
    )

    rs = np.random.RandomState(1)
    x = rs.randn(2, 4, 64, 64, 3).astype(np.float32)
    mask = (rs.rand(2, 2, 4, 4) > 0.5).astype(np.float32)

    ref_preds, ref_labels = _ref_forward(ref_model, x, mask)
    preds, labels = _my_forward(model, variables, x, mask)

    m = np.asarray(labels[0][1]).astype(bool)
    np.testing.assert_allclose(
        np.asarray(preds[0])[m], ref_preds[0].numpy(), rtol=1e-3, atol=2e-4
    )
    np.testing.assert_allclose(
        np.asarray(labels[0][0])[m], ref_labels[0][0].numpy(),
        rtol=1e-3, atol=2e-3,
    )


def test_mae_loader_mask_parity():
    """MAE with a loader-provided mask (MAE_RND_MASK=False) through the
    xformer decoder with DECODER_SEP_POS_EMBED and DEC_KV pooling — the
    three decoder variants in one deterministic end-to-end check."""
    overrides = BASE + [
        "MASK.MAE_ON", "True", "MASK.MAE_RND_MASK", "False",
        "MASK.HEAD_TYPE", "separate_xformer",
        "MASK.DECODER_DEPTH", "1", "MASK.DECODER_EMBED_DIM", "64",
        "MASK.DECODER_SEP_POS_EMBED", "True",
        "MASK.DEC_KV_KERNEL", "[1,3,3]", "MASK.DEC_KV_STRIDE", "[1,2,2]",
        "MASK.PRED_HOG", "False", "MASK.NORM_PRED_PIXEL", "True",
        "MASK.TIME_STRIDE_LOSS", "True",
        "AUG.MASK_RATIO", "0.5", "AUG.MASK_WINDOW_SIZE", "[2,4,4]",
    ]
    ref_model, _ = _ref_masked(overrides)
    model, variables, cfg = _my_model(overrides)
    variables = _import_weights(ref_model, variables)

    rs = np.random.RandomState(2)
    x = rs.randn(2, 4, 64, 64, 3).astype(np.float32)
    mask = _unique_mask(2, 2, 4, 4, seed=3)  # token-granularity noise mask

    ref_preds, ref_labels = _ref_forward(ref_model, x, mask)
    preds, labels = _my_forward(model, variables, x, mask)

    m = np.asarray(labels[0][1]).astype(bool)  # (B, N)
    assert m.sum() == m.size // 2  # exact 0.5 ratio, statically shaped
    np.testing.assert_allclose(
        np.asarray(preds[0])[m], ref_preds[0].numpy(), rtol=1e-3, atol=5e-4
    )
    np.testing.assert_allclose(
        np.asarray(labels[0][0])[m], ref_labels[0][0].numpy(),
        rtol=1e-3, atol=2e-4,
    )


def _patch_rngs(monkeypatch, noise):
    """Make torch.rand and jax.random.uniform both return ``noise``
    (reshaped), so the random-masking argsorts coincide."""
    import torch

    real_rand = torch.rand

    def fake_rand(*shape, **kw):
        if isinstance(shape[0], (tuple, list)):
            shape = tuple(shape[0])
        if int(np.prod(shape)) == noise.size:
            return torch.from_numpy(noise.reshape(shape).copy())
        return real_rand(*shape, **kw)

    real_uniform = jax.random.uniform

    def fake_uniform(key, shape=(), **kw):
        if int(np.prod(shape)) == noise.size:
            return jnp.asarray(noise.reshape(shape))
        return real_uniform(key, shape, **kw)

    monkeypatch.setattr(torch, "rand", fake_rand)
    monkeypatch.setattr(jax.random, "uniform", fake_uniform)


def test_mae_per_frame_masking_parity(monkeypatch):
    """PER_FRAME_MASKING: each frame keeps the same visible count; the
    decoder unshuffles at frame granularity (reference :332-338, :407-413).
    Uses fixed sincos pos (the reference pos layout that composes with
    per-frame masking) and identical injected noise on both sides."""
    overrides = BASE + [
        "MASK.MAE_ON", "True", "MASK.MAE_RND_MASK", "True",
        "MASK.PER_FRAME_MASKING", "True",
        "MASK.HEAD_TYPE", "separate_xformer",
        "MASK.DECODER_DEPTH", "1", "MASK.DECODER_EMBED_DIM", "64",
        "MASK.PRED_HOG", "False", "MASK.NORM_PRED_PIXEL", "True",
        "MASK.TIME_STRIDE_LOSS", "True",
        "MVIT.SEP_POS_EMBED", "False", "MVIT.USE_FIXED_SINCOS_POS", "True",
        "AUG.MASK_RATIO", "0.75",
    ]
    ref_model, rcfg = _ref_masked(overrides)
    model, variables, cfg = _my_model(overrides)
    # The fixed sincos table is a (frozen) parameter in the reference
    # state_dict but a recomputed constant here.
    variables = _import_weights(ref_model, variables, allow_unexpected=("pos_embed",))

    b, t0, hw = 2, 2, 16
    noise = np.random.RandomState(4).rand(b * t0, hw).astype(np.float32)
    _patch_rngs(monkeypatch, noise)

    rs = np.random.RandomState(5)
    x = rs.randn(b, 4, 64, 64, 3).astype(np.float32)

    # The reference's MSSeparateHead masked gather crashes in this mode (the
    # per-frame mask stays (B*T, HW) while features are (B, N, C) —
    # head_helper.py:669 IndexError), so the full forward is unrunnable
    # upstream. Compare full-grid predictions via its return_all escape
    # hatch (the VIS_MASK path) plus the mask itself.
    import torch

    rcfg.VIS_MASK.ENABLE = True  # _mae_forward_decoder -> return_all=True
    t = torch.from_numpy(np.ascontiguousarray(x.transpose(0, 4, 1, 2, 3)))
    with torch.no_grad():
        latent, ref_mask, ids_restore, thw_r = ref_model._mae_forward_encoder(
            t, rcfg.AUG.MASK_RATIO, None
        )
        ref_preds = ref_model._mae_forward_decoder(
            latent, ids_restore, ref_mask, thw_r
        )
    preds, labels = _my_forward(model, variables, x)

    m = np.asarray(labels[0][1])  # (B, N)
    # per-frame invariant: every frame hides exactly ratio * HW tokens
    per_frame = m.reshape(b, t0, hw).sum(-1)
    assert (per_frame == int(hw * 0.75)).all()
    # identical masked sets (same injected noise, frame-granular argsort)
    np.testing.assert_array_equal(m, ref_mask.numpy().reshape(b, -1))
    np.testing.assert_allclose(
        np.asarray(preds[0]), ref_preds[0].numpy(), rtol=1e-3, atol=5e-4
    )


def test_maskfeat_random_mask_parity(monkeypatch):
    """MaskFeat x on-device random mask (MASK.MAE_RND_MASK=True without
    MAE_ON, reference :521-525), identical injected noise."""
    overrides = BASE + [
        "MASK.PRED_HOG", "False", "MASK.NORM_PRED_PIXEL", "True",
        "MASK.HEAD_TYPE", "separate", "MASK.MAE_RND_MASK", "True",
        "AUG.MASK_RATIO", "0.5",
    ]
    ref_model, _ = _ref_masked(overrides)
    model, variables, cfg = _my_model(overrides)
    variables = _import_weights(ref_model, variables)

    noise = np.random.RandomState(6).rand(2, 32).astype(np.float32)
    _patch_rngs(monkeypatch, noise)

    rs = np.random.RandomState(7)
    x = rs.randn(2, 4, 64, 64, 3).astype(np.float32)
    ref_preds, ref_labels = _ref_forward(ref_model, x)
    preds, labels = _my_forward(model, variables, x)

    m = np.asarray(labels[0][1]).astype(bool)
    assert m.sum() == 32  # 0.5 of 2*32 tokens
    np.testing.assert_allclose(
        np.asarray(preds[0])[m], ref_preds[0].numpy(), rtol=1e-3, atol=2e-4
    )
    np.testing.assert_allclose(
        np.asarray(labels[0][0])[m], ref_labels[0][0].numpy(),
        rtol=1e-3, atol=2e-4,
    )


def test_mask_tube_same_spatial_mask_every_frame():
    """AUG.MASK_TUBE: the MAE random mask repeats spatially across time
    (reference :291-297)."""
    overrides = BASE + [
        "MASK.MAE_ON", "True", "MASK.MAE_RND_MASK", "True",
        "MASK.HEAD_TYPE", "separate_xformer",
        "MASK.DECODER_DEPTH", "1", "MASK.DECODER_EMBED_DIM", "64",
        "AUG.MASK_RATIO", "0.5", "AUG.MASK_TUBE", "True",
    ]
    model, variables, cfg = _my_model(overrides)
    x = np.random.RandomState(8).randn(2, 4, 64, 64, 3).astype(np.float32)
    preds, labels = model.apply(
        variables, [jnp.asarray(x)], train=True,
        rngs={"dropout": jax.random.PRNGKey(3)},
    )
    m = np.asarray(labels[0][1]).reshape(2, 2, 16)
    np.testing.assert_array_equal(m[:, 0], m[:, 1])


def test_dec_kv_pooling_train_step():
    """Decoder KV pooling trains: gradients flow through the pooled-KV
    decoder block and its pooling conv parameters exist."""
    from slowfast_tpu.engine.steps import create_train_state, make_train_step
    from slowfast_tpu.models.build import dummy_inputs
    from slowfast_tpu.solver.optimizer import construct_optimizer

    cfg = get_cfg()
    cfg.merge_from_list(BASE + [
        "MASK.MAE_ON", "True", "MASK.MAE_RND_MASK", "True",
        "MASK.HEAD_TYPE", "separate_xformer",
        "MASK.DECODER_DEPTH", "1", "MASK.DECODER_EMBED_DIM", "64",
        "MASK.DEC_KV_KERNEL", "[1,3,3]", "MASK.DEC_KV_STRIDE", "[1,2,2]",
        "AUG.MASK_RATIO", "0.5",
        "MODEL.LOSS_FUNC", "multi_mse", "TASK", "ssl",
    ])
    cfg.NUM_GPUS = 1
    cfg.TPU.COMPUTE_DTYPE = "float32"
    model = build_model(cfg)
    variables = init_model(model, cfg, rng=jax.random.PRNGKey(0), train=True)
    blk = variables["params"]["pred_head"]["transforms_0_0"]["attn"]
    assert "pool_k" in blk or "pool_kv" in blk or any(
        "pool" in k for k in blk
    ), f"no KV pooling params in decoder block: {list(blk)}"

    tx, _ = construct_optimizer(variables["params"], cfg, steps_per_epoch=10)
    state = create_train_state(cfg, model, tx, rng=jax.random.PRNGKey(0),
                               variables=variables)
    step = make_train_step(cfg, model, tx, donate=False)
    inputs = dummy_inputs(cfg, 2)
    inputs = [jax.random.normal(jax.random.PRNGKey(3), x.shape) for x in inputs]
    batch = {"inputs": inputs, "labels": jnp.zeros((2,), jnp.int32)}
    losses = []
    for _ in range(4):
        state, metrics = step(state, batch, jax.random.PRNGKey(1))
        losses.append(float(metrics["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]
