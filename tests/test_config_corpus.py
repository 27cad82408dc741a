"""Recipe-corpus smoke tests.

Every generated recipe merges + validates (tools/import_config.py already
guarantees that); here a representative recipe from each model family is
BUILT and run forward at reduced extent, so families that only exist via
the corpus (CSN, R(2+1)D, Rev-ViT, MViT-B, ...) are exercised end to end.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from slowfast_tpu.config import get_cfg
from slowfast_tpu.config.defaults import assert_and_infer_cfg
from slowfast_tpu.models import build_model
from slowfast_tpu.models.build import init_model

RECIPES = [
    # (path, overrides) — shrink extent, keep architecture.
    ("configs/Kinetics/SLOW_8x8_R50.yaml", {}),
    ("configs/Kinetics/C2D_NLN_8x8_R50.yaml", {}),
    ("configs/Kinetics/I3D_8x8_R50.yaml", {}),
    ("configs/Kinetics/X3D_S.yaml", {}),
    ("configs/Kinetics/pytorchvideo/CSN_32x2_R101.yaml", {}),
    ("configs/Kinetics/pytorchvideo/R2PLUS1D_16x4_R50.yaml", {}),
    ("configs/Kinetics/MVIT_B_16x4_CONV.yaml", {}),
    ("configs/ImageNet/REV_VIT_S.yaml", {}),
    # 2D-patch image MViT (MVIT.PATCH_2D; PATCH_KERNEL is 2-length here —
    # regression guard for the PatchEmbed conv_2d kernel slicing).
    ("configs/masked_ssl/in1k_VIT_B_MaskFeat_FT.yaml", {}),
    ("configs/SSv2/SLOWFAST_16x8_R50.yaml", {}),
]


@pytest.mark.parametrize("path,overrides", RECIPES, ids=[r[0] for r in RECIPES])
def test_recipe_builds_and_runs(path, overrides):
    cfg = get_cfg()
    cfg.merge_from_file(path)
    cfg.NUM_GPUS = 1
    cfg.MODEL.NUM_CLASSES = 16
    cfg.TPU.COMPUTE_DTYPE = "float32"
    # Shrink the data extent only; depth/width/schedule stay the recipe's.
    is_image = cfg.TRAIN.DATASET == "imagenet"
    if is_image:
        cfg.DATA.TRAIN_CROP_SIZE = 64
        cfg.DATA.NUM_FRAMES = 1
    else:
        cfg.DATA.NUM_FRAMES = max(cfg.DATA.NUM_FRAMES // 4, 4)
        cfg.DATA.TRAIN_CROP_SIZE = 64
    if cfg.MODEL.MODEL_NAME == "MViT":
        # Pos tables interpolate; keep a crop the patch stride divides.
        cfg.DATA.TRAIN_CROP_SIZE = 56 if not is_image else 64
    for k, v in overrides.items():
        cfg.merge_from_list([k, v])
    cfg = assert_and_infer_cfg(cfg)

    model = build_model(cfg)
    rng = jax.random.PRNGKey(0)
    variables = init_model(model, cfg, rng=rng, train=False)

    b = 2
    t, s = cfg.DATA.NUM_FRAMES, cfg.DATA.TRAIN_CROP_SIZE
    if cfg.MODEL.ARCH in cfg.MODEL.MULTI_PATHWAY_ARCH:
        a = cfg.SLOWFAST.ALPHA
        x = [
            jnp.asarray(np.random.randn(b, t // a, s, s, 3), jnp.float32),
            jnp.asarray(np.random.randn(b, t, s, s, 3), jnp.float32),
        ]
    else:
        x = [jnp.asarray(np.random.randn(b, t, s, s, 3), jnp.float32)]
    out = model.apply(variables, x, train=False)
    out = np.asarray(out)
    assert out.shape[0] == b and out.shape[-1] == cfg.MODEL.NUM_CLASSES
    assert np.isfinite(out).all()
