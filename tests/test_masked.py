"""Masked-pretraining models (MaskFeat / MAE) build, forward, and train.

Reference: slowfast/models/masked.py (MaskMViT) driven by the
configs under configs/masked_ssl/. These paths previously had zero test
coverage — a cfg-plumbing regression (e.g. the fused-attention default
silently overriding TPU.FUSED_ATTENTION) was invisible.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from slowfast_tpu.config import get_cfg
from slowfast_tpu.engine.steps import create_train_state, make_train_step
from slowfast_tpu.models import build_model
from slowfast_tpu.models.build import dummy_inputs, init_model
from slowfast_tpu.solver.optimizer import construct_optimizer


def _small(cfg):
    cfg.NUM_GPUS = 1
    cfg.DATA.NUM_FRAMES = 4
    cfg.DATA.TRAIN_CROP_SIZE = 32
    cfg.DATA.TEST_CROP_SIZE = 32
    cfg.TPU.COMPUTE_DTYPE = "float32"
    cfg.TRAIN.CHECKPOINT_FILE_PATH = ""
    return cfg


def _loader_mask(cfg, b):
    """Loader-granularity mask at AUG.MASK_WINDOW_SIZE (t, h, w)."""
    t, h, w = cfg.AUG.MASK_WINDOW_SIZE
    rs = np.random.RandomState(0)
    return jnp.asarray((rs.rand(b, t, h, w) > 0.5).astype(np.float32))


def test_maskfeat_forward_and_masked_loss():
    cfg = _small(get_cfg())
    cfg.merge_from_file("configs/masked_ssl/MVITv2_S_16x4_MaskFeat_PT.yaml")
    _small(cfg)
    # Mask window must tile the shrunken token grid:
    # T0 = 4/2 = 2, H0 = W0 = 32/4 = 8 (PATCH_STRIDE [2, 4, 4]).
    cfg.AUG.MASK_WINDOW_SIZE = [2, 8, 8]
    model = build_model(cfg)
    variables = init_model(model, cfg, rng=jax.random.PRNGKey(0), train=True)

    from slowfast_tpu.models.masked import masked_loss

    b = 2
    inputs = dummy_inputs(cfg, b)
    inputs = [jax.random.normal(jax.random.PRNGKey(3), x.shape) for x in inputs]
    mask = _loader_mask(cfg, b)
    preds, gen_labels = model.apply(
        variables, inputs, mask=mask, train=False,
        rngs={"dropout": jax.random.PRNGKey(1)},
    )
    loss = masked_loss(preds, gen_labels)
    assert np.isfinite(float(loss))
    # HOG targets only score masked positions: an all-zero mask must
    # produce zero loss contribution (denominator guard, not NaN).
    preds0, labels0 = model.apply(
        variables, inputs, mask=jnp.zeros_like(mask), train=False,
        rngs={"dropout": jax.random.PRNGKey(1)},
    )
    assert np.isfinite(float(masked_loss(preds0, labels0)))


def test_maskfeat_2d_image_forward():
    """in1k image MaskFeat (MVIT.PATCH_2D): 2D stem, (B, h, w) loader mask
    at the feature geometry, HOG targets on the single frame.
    Reference: masked.py use_2d_patch paths + imagenet.py:170-206."""
    cfg = _small(get_cfg())
    cfg.merge_from_file("configs/masked_ssl/in1k_VIT_B_MaskFeat_PT.yaml")
    _small(cfg)
    cfg.DATA.NUM_FRAMES = 1
    cfg.MVIT.EMBED_DIM = 32
    cfg.MVIT.NUM_HEADS = 2
    cfg.MVIT.DEPTH = 2
    cfg.MASK.PRETRAIN_DEPTH = [1]
    cfg.MVIT.PATCH_KERNEL = [8, 8]
    cfg.MVIT.PATCH_STRIDE = [8, 8]
    cfg.MVIT.PATCH_PADDING = [0, 0]

    from slowfast_tpu.models.masked import masked_loss
    from slowfast_tpu.models.mvit import maskfeat_feature_size

    fh = maskfeat_feature_size(cfg)
    assert fh == 4  # 32px / patch 8, no q-pooling
    model = build_model(cfg)
    variables = init_model(model, cfg, rng=jax.random.PRNGKey(0), train=True)

    b = 2
    inputs = [jax.random.normal(jax.random.PRNGKey(3), (b, 1, 32, 32, 3))]
    rs = np.random.RandomState(0)
    mask = jnp.asarray((rs.rand(b, fh, fh) > 0.5).astype(np.float32))
    preds, gen_labels = model.apply(
        variables, inputs, mask=mask, train=False,
        rngs={"dropout": jax.random.PRNGKey(1)},
    )
    assert np.isfinite(float(masked_loss(preds, gen_labels)))


def test_imagenet_maskfeat_mask_geometry():
    """The ImageNet loader's mask matches the model's feature grid and
    respects MASK_RATIO (reference imagenet.py:179-183)."""
    from slowfast_tpu.data.imagenet import _maskfeat_mask

    cfg = _small(get_cfg())
    cfg.merge_from_file("configs/masked_ssl/in1k_VIT_B_MaskFeat_PT.yaml")
    _small(cfg)
    cfg.DATA.TRAIN_CROP_SIZE = 224
    m = _maskfeat_mask(cfg)
    assert m.shape == (14, 14)
    # Block masking overshoots at most one block beyond the target count.
    target = round(14 * 14 * cfg.AUG.MASK_RATIO)
    assert 0 < m.sum() <= target + (cfg.AUG.MAX_MASK_PATCHES_PER_BLOCK or 196)


def test_maskfeat_feature_size_pooled_odd_grid():
    """The pooled feature grid applies each stage's ((size-1)//stride + 1)
    in sequence: 14 -> 7 -> 4 under two stride-2 q-pool stages, where
    cumulative floor division (14 // 4 = 3) diverges (the same formula
    masked.py uses for its alignment assert)."""
    from slowfast_tpu.models.mvit import maskfeat_feature_size

    cfg = _small(get_cfg())
    cfg.merge_from_file("configs/masked_ssl/in1k_VIT_B_MaskFeat_PT.yaml")
    _small(cfg)
    cfg.DATA.TRAIN_CROP_SIZE = 224
    cfg.MVIT.DEPTH = 4
    cfg.MASK.PRETRAIN_DEPTH = [3]
    cfg.MVIT.POOL_Q_STRIDE = [[1, 1, 2, 2], [3, 1, 2, 2]]
    assert maskfeat_feature_size(cfg) == 4


def test_scale_init_by_depth():
    """MASK.SCALE_INIT_BY_DEPTH rescales residual-branch projections by
    1/sqrt(2*layer_id) (reference masked.py fix_init_weight :149-163)."""
    def build_vars(scale):
        cfg = _small(get_cfg())
        cfg.merge_from_file("configs/masked_ssl/MVITv2_S_16x4_MaskFeat_PT.yaml")
        _small(cfg)
        cfg.AUG.MASK_WINDOW_SIZE = [2, 8, 8]
        cfg.MVIT.DEPTH = 2
        cfg.MVIT.DIM_MUL = [[1, 2.0]]
        cfg.MVIT.HEAD_MUL = [[1, 2.0]]
        cfg.MVIT.POOL_Q_STRIDE = [[0, 1, 1, 1], [1, 1, 2, 2]]
        cfg.MASK.PRETRAIN_DEPTH = [1]
        cfg.MASK.SCALE_INIT_BY_DEPTH = scale
        model = build_model(cfg)
        return init_model(model, cfg, rng=jax.random.PRNGKey(0), train=True)

    base = build_vars(False)["params"]
    scaled = build_vars(True)["params"]
    for i in (0, 1):
        want = np.asarray(base[f"blocks_{i}"]["attn"]["proj"]["kernel"])
        got = np.asarray(scaled[f"blocks_{i}"]["attn"]["proj"]["kernel"])
        np.testing.assert_allclose(got, want / np.sqrt(2.0 * (i + 1)), rtol=1e-6)


def test_vis_mask_mae_reconstruction(tmp_path):
    """VIS_MASK test mode writes (input | masked | reconstruction) videos
    (reference test_net.py:124 + masked.py _mae_visualize :478-517)."""
    import glob

    cfg = _small(get_cfg())
    cfg.merge_from_file("configs/masked_ssl/k400_VIT_B_16x4_MAE_PT.yaml")
    _small(cfg)
    cfg.MVIT.EMBED_DIM = 64
    cfg.MVIT.NUM_HEADS = 2
    cfg.MVIT.DEPTH = 2
    cfg.MASK.PRETRAIN_DEPTH = [1]
    cfg.MASK.DECODER_EMBED_DIM = 32
    cfg.MASK.DECODER_DEPTH = 1
    cfg.AUG.MASK_RATIO = 0.5  # 0.9 leaves zero visible tokens at 2x2x2
    cfg.TRAIN.ENABLE = False
    cfg.TEST.ENABLE = True
    cfg.TEST.DATASET = "syntheticvideo"
    cfg.TEST.BATCH_SIZE = 2
    cfg.DATA.SYNTHETIC_SIZE = 2
    cfg.TEST.NUM_ENSEMBLE_VIEWS = 1
    cfg.TEST.NUM_SPATIAL_CROPS = 1
    cfg.VIS_MASK.ENABLE = True
    cfg.OUTPUT_DIR = str(tmp_path)

    from slowfast_tpu.engine.tester import test as run_test

    run_test(cfg)
    vids = glob.glob(str(tmp_path / "vis_mask" / "vid" / "*.mp4"))
    assert vids, "no reconstruction videos written"
    import cv2

    cap = cv2.VideoCapture(vids[0])
    ok, frame = cap.read()
    cap.release()
    assert ok and frame.shape[1] == 3 * frame.shape[0]  # triptych layout


def test_maskfeat_pretrain_to_finetune_checkpoint(tmp_path):
    """A MaskFeat pretrain checkpoint initializes the fine-tune MViT trunk.

    Reference workflow: PT with masked_ssl/*_MaskFeat_PT.yaml, then FT with
    the *_FT.yaml recipe pointing TRAIN.CHECKPOINT_FILE_PATH at the PT
    checkpoint (strict=False partial load, reference checkpoint.py:380-430).
    """
    from slowfast_tpu.utils import checkpoint as cu

    pt_cfg = _small(get_cfg())
    pt_cfg.merge_from_file("configs/masked_ssl/MVITv2_S_16x4_MaskFeat_PT.yaml")
    _small(pt_cfg)
    pt_cfg.AUG.MASK_WINDOW_SIZE = [2, 8, 8]
    pt_cfg.OUTPUT_DIR = str(tmp_path / "pt")
    pt_model = build_model(pt_cfg)
    pt_vars = init_model(pt_model, pt_cfg, rng=jax.random.PRNGKey(0), train=True)
    tx, _ = construct_optimizer(pt_vars["params"], pt_cfg, steps_per_epoch=10)
    pt_state = create_train_state(pt_cfg, pt_model, tx, rng=jax.random.PRNGKey(0),
                                  variables=pt_vars)
    path = cu.save_checkpoint(pt_cfg.OUTPUT_DIR, pt_state, 4, pt_cfg)
    assert path is not None

    ft_cfg = _small(get_cfg())
    ft_cfg.merge_from_file("configs/masked_ssl/k400_MVITv2_S_16x4_FT.yaml")
    _small(ft_cfg)
    ft_cfg.OUTPUT_DIR = str(tmp_path / "ft")
    ft_cfg.TRAIN.CHECKPOINT_FILE_PATH = path
    ft_cfg.TRAIN.CHECKPOINT_EPOCH_RESET = True
    ft_cfg.TRAIN.AUTO_RESUME = False
    ft_model = build_model(ft_cfg)
    ft_vars = init_model(ft_model, ft_cfg, rng=jax.random.PRNGKey(7), train=True)
    tx, _ = construct_optimizer(ft_vars["params"], ft_cfg, steps_per_epoch=10)
    ft_state = create_train_state(ft_cfg, ft_model, tx, rng=jax.random.PRNGKey(7),
                                  variables=ft_vars)
    head_before = np.asarray(
        ft_state.params["head"]["projection"]["kernel"]
    ).copy()

    new_state, start_epoch = cu.load_train_checkpoint(ft_cfg, ft_state)
    assert start_epoch == 0  # EPOCH_RESET: LR schedule restarts
    # Trunk weights came from the pretrain checkpoint...
    got = np.asarray(new_state.params["blocks_0"]["attn"]["qkv"]["kernel"])
    want = np.asarray(pt_state.params["blocks_0"]["attn"]["qkv"]["kernel"])
    np.testing.assert_array_equal(got, want)
    # ...the fresh classifier head is untouched...
    np.testing.assert_array_equal(
        np.asarray(new_state.params["head"]["projection"]["kernel"]),
        head_before,
    )
    # ...and the checkpoint's pred_head/mask_token extras were dropped.
    assert "pred_head" not in new_state.params


def test_mae_train_step_learns():
    cfg = _small(get_cfg())
    cfg.merge_from_file("configs/masked_ssl/k400_VIT_B_16x4_MAE_PT.yaml")
    _small(cfg)
    # Shrink the ViT for CPU.
    cfg.MVIT.EMBED_DIM = 64
    cfg.MVIT.NUM_HEADS = 2
    cfg.MVIT.DEPTH = 2
    cfg.MASK.PRETRAIN_DEPTH = [1]
    cfg.MASK.DECODER_EMBED_DIM = 32
    cfg.MASK.DECODER_DEPTH = 1
    cfg.AUG.MASK_RATIO = 0.75  # 0.9 of the 8-token test grid keeps nothing
    # The step rng is folded with state.step, so the random mask differs
    # every step; at the recipe's warmup LR (~1e-6 for the first 600 steps)
    # 6 steps are pure noise. Train at a real LR to see learning.
    cfg.SOLVER.WARMUP_EPOCHS = 0.0
    cfg.SOLVER.BASE_LR = 1e-2

    model = build_model(cfg)
    variables = init_model(model, cfg, rng=jax.random.PRNGKey(0), train=True)
    tx, _ = construct_optimizer(variables["params"], cfg, steps_per_epoch=10)
    state = create_train_state(cfg, model, tx, rng=jax.random.PRNGKey(0),
                               variables=variables)
    step = make_train_step(cfg, model, tx, donate=False)

    b = 2
    inputs = dummy_inputs(cfg, b)
    inputs = [jax.random.normal(jax.random.PRNGKey(3), x.shape) for x in inputs]
    batch = {"inputs": inputs, "labels": jnp.zeros((b,), jnp.int32)}
    if cfg.AUG.GEN_MASK_LOADER:
        batch["mask"] = _loader_mask(cfg, b)
    losses = []
    for _ in range(6):
        state, m = step(state, batch, jax.random.PRNGKey(1))
        losses.append(float(m["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0], f"MAE loss did not drop: {losses}"
