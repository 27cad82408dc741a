"""Full-corpus build sweep: every recipe yaml builds and traces a forward.

The per-family smoke test (test_config_corpus.py) runs a real forward for one
recipe per model family; this sweep covers *every* config in ``configs/`` at
shape level.  ``jax.eval_shape`` around ``init_model`` traces the complete
module tree (flax init runs the forward abstractly), so any config-reachable
architecture branch that miscomputes shapes fails here without paying
VIT-H/MViT-L-sized FLOPs.  Latent breaks hide in unexercised configs — the
MVIT.PATCH_2D PatchEmbed kernel-slicing bug shipped green because no test
built an image-MViT recipe.

On by default (measured ~3m16s over 113 recipes on a 1-CPU host — an
opt-in gate just rots); set ``CORPUS_SWEEP=0`` to skip it explicitly.
"""

import glob
import os

import jax
import pytest

from slowfast_tpu.config import get_cfg
from slowfast_tpu.config.defaults import assert_and_infer_cfg
from slowfast_tpu.models import build_model
from slowfast_tpu.models.build import init_model

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
RECIPES = sorted(
    os.path.relpath(p, ROOT)
    for p in glob.glob(os.path.join(ROOT, "configs", "**", "*.yaml"), recursive=True)
)

pytestmark = pytest.mark.skipif(
    os.environ.get("CORPUS_SWEEP", "1") == "0",
    reason="full-corpus sweep disabled with CORPUS_SWEEP=0",
)


def _shrink(cfg):
    """Reduce data extent only; architecture (depth/width/heads) stays."""
    cfg.NUM_GPUS = 1
    cfg.NUM_SHARDS = 1
    cfg.TRAIN.BATCH_SIZE = 2
    cfg.TEST.BATCH_SIZE = 2
    cfg.TPU.COMPUTE_DTYPE = "float32"
    is_image = cfg.TRAIN.DATASET == "imagenet" or cfg.DATA.NUM_FRAMES == 1
    if is_image:
        cfg.DATA.NUM_FRAMES = 1
        cfg.DATA.TRAIN_CROP_SIZE = 64
    else:
        # Keep NUM_FRAMES divisible by SLOWFAST.ALPHA for two-pathway archs.
        alpha = cfg.SLOWFAST.ALPHA if cfg.MODEL.ARCH in ("slowfast",) else 1
        cfg.DATA.NUM_FRAMES = max(cfg.DATA.NUM_FRAMES // 4, 4, alpha)
        cfg.DATA.TRAIN_CROP_SIZE = 64
    if cfg.MODEL.MODEL_NAME in ("MViT", "MaskMViT"):
        # Keep a crop the patch stride divides; pos tables interpolate.
        # Masked pretraining additionally needs the HOG/pixel target cubes
        # to tile the crop exactly (cell 8 x pooled grid), so use 64 there
        # (56 exercises the odd-size pooling path in plain MViT instead).
        masked = cfg.MASK.ENABLE
        cfg.DATA.TRAIN_CROP_SIZE = (
            64 if cfg.MVIT.PATCH_2D or is_image or masked else 56
        )
        if masked and not cfg.MASK.MAE_ON and not cfg.MVIT.PATCH_2D:
            # MaskFeat mask geometry follows the (shrunk) token grid:
            # cube t = frames / patch-stride-T, h = w = crop / (stride * 2³).
            st = cfg.MVIT.PATCH_STRIDE
            t = max(cfg.DATA.NUM_FRAMES // st[0], 1)
            hw = cfg.DATA.TRAIN_CROP_SIZE // (st[1] * 8)
            cfg.AUG.MASK_WINDOW_SIZE = [t, hw, hw]
    cfg.DATA.TEST_CROP_SIZE = cfg.DATA.TRAIN_CROP_SIZE
    return cfg


@pytest.mark.parametrize("path", RECIPES, ids=RECIPES)
def test_recipe_traces(path):
    cfg = get_cfg()
    cfg.merge_from_file(os.path.join(ROOT, path))
    cfg = assert_and_infer_cfg(_shrink(cfg))
    model = build_model(cfg)
    shapes = jax.eval_shape(
        lambda: init_model(model, cfg, rng=jax.random.PRNGKey(0), train=True)
    )
    n_params = sum(
        int(jax.numpy.prod(jax.numpy.asarray(l.shape)))
        for l in jax.tree_util.tree_leaves(shapes["params"])
    )
    assert n_params > 0
