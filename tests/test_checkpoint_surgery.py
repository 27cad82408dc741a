"""Checkpoint import surgery: rel-pos/pos-embed re-interpolation, joint vs
separated pos-embed split/merge, patch-embed temporal inflation.

Reference semantics: slowfast/utils/checkpoint.py:315-433 (image_init
surgery) and :435-490 (shape-match filter re-interpolation).
"""

import numpy as np
import jax.numpy as jnp

from slowfast_tpu.utils.checkpoint import (
    _image_init_surgery,
    _interp_bicubic_2d,
    _interp_linear,
    _surgery_convert,
    load_torch_checkpoint_dict,
)


def test_rel_pos_linear_interp_matches_torch():
    import torch

    v = np.random.RandomState(0).randn(15, 8).astype(np.float32)
    got = _surgery_convert("blocks.0.attn.rel_pos_h", v, (27, 8))
    want = (
        torch.nn.functional.interpolate(
            torch.from_numpy(v).t().unsqueeze(0), size=27, mode="linear"
        )[0]
        .t()
        .numpy()
    )
    np.testing.assert_allclose(got, want, rtol=1e-6)
    # Constant tables stay constant under linear interpolation.
    const = np.full((9, 4), 3.25, np.float32)
    np.testing.assert_allclose(
        _surgery_convert("attn.rel_pos_t", const, (17, 4)), 3.25, rtol=1e-6
    )


def test_pos_embed_temporal_and_spatial_interp():
    import torch

    vt = np.random.RandomState(1).randn(1, 8, 16).astype(np.float32)
    got = _surgery_convert("pos_embed_temporal", vt, (1, 16, 16))
    want = torch.nn.functional.interpolate(
        torch.from_numpy(vt).permute(0, 2, 1), size=16, mode="linear"
    ).permute(0, 2, 1).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)

    vs = np.random.RandomState(2).randn(1, 7 * 7, 12).astype(np.float32)
    got = _surgery_convert("pos_embed_spatial", vs, (1, 14 * 14, 12))
    want = (
        torch.nn.functional.interpolate(
            torch.from_numpy(vs).reshape(1, 7, 7, 12).permute(0, 3, 1, 2),
            size=(14, 14),
            mode="bicubic",
        )
        .reshape(1, 12, 196)
        .permute(0, 2, 1)
        .numpy()
    )
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_joint_to_separated_split_and_patch_inflation():
    # Target model: separated pos-embeds + 3D patch embed (T=2).
    flat_params = {
        ("pos_embed_spatial",): np.zeros((1, 4, 8), np.float32),
        ("pos_embed_class",): np.zeros((1, 1, 8), np.float32),
        ("patch_embed", "proj", "kernel"): np.zeros((2, 3, 3, 3, 8), np.float32),
    }
    rs = np.random.RandomState(3)
    joint = rs.randn(1, 5, 8).astype(np.float32)
    w2d = rs.randn(8, 3, 3, 3).astype(np.float32)  # torch (O, I, h, w)
    sd = {"pos_embed": joint, "patch_embed.proj.weight": w2d}
    out = _image_init_surgery(sd, flat_params)
    assert "pos_embed" not in out
    np.testing.assert_array_equal(out["pos_embed_class"], joint[:, :1])
    np.testing.assert_array_equal(out["pos_embed_spatial"], joint[:, 1:])
    # Plain temporal repeat, NO /T scaling (reference checkpoint.py:349).
    assert out["patch_embed.proj.weight"].shape == (8, 3, 2, 3, 3)
    np.testing.assert_array_equal(
        out["patch_embed.proj.weight"][:, :, 0], w2d
    )
    np.testing.assert_array_equal(
        out["patch_embed.proj.weight"][:, :, 1], w2d
    )


def test_separated_to_joint_merge():
    flat_params = {("pos_embed",): np.zeros((1, 5, 8), np.float32)}
    rs = np.random.RandomState(4)
    sp = rs.randn(1, 4, 8).astype(np.float32)
    cls = rs.randn(1, 1, 8).astype(np.float32)
    out = _image_init_surgery(
        {"pos_embed_spatial": sp, "pos_embed_class": cls}, flat_params
    )
    assert "pos_embed_spatial" not in out and "pos_embed_class" not in out
    np.testing.assert_array_equal(out["pos_embed"][:, :1], cls)
    np.testing.assert_array_equal(out["pos_embed"][:, 1:], sp)


def test_import_reference_mvit_into_longer_T():
    """Import a reference-format MViT state dict into a config with a
    different temporal extent: rel_pos_t must be re-interpolated rather
    than silently dropped (VERDICT #4)."""
    import jax

    from slowfast_tpu.config import get_cfg
    from slowfast_tpu.models import build_model
    from slowfast_tpu.models.build import init_model

    def mvit_cfg(frames):
        cfg = get_cfg()
        cfg.MODEL.MODEL_NAME = "MViT"
        cfg.MODEL.ARCH = "mvit"
        cfg.MODEL.NUM_CLASSES = 4
        cfg.MVIT.DEPTH = 2
        cfg.MVIT.EMBED_DIM = 8
        cfg.MVIT.NUM_HEADS = 1
        cfg.MVIT.PATCH_KERNEL = [3, 7, 7]
        cfg.MVIT.PATCH_STRIDE = [2, 4, 4]
        cfg.MVIT.PATCH_PADDING = [1, 3, 3]
        cfg.MVIT.REL_POS_SPATIAL = True
        cfg.MVIT.REL_POS_TEMPORAL = True
        cfg.MVIT.USE_ABS_POS = False
        cfg.MVIT.RESIDUAL_POOLING = True
        cfg.MVIT.DIM_MUL_IN_ATT = True
        cfg.DATA.NUM_FRAMES = frames
        cfg.DATA.TRAIN_CROP_SIZE = 32
        cfg.DATA.TEST_CROP_SIZE = 32
        cfg.DATA.INPUT_CHANNEL_NUM = [3]
        cfg.TPU.COMPUTE_DTYPE = "float32"
        return cfg

    rng = jax.random.PRNGKey(0)
    cfg_src = mvit_cfg(4)
    model_src = build_model(cfg_src)
    vars_src = init_model(model_src, cfg_src, rng=rng, train=False)

    # Fake a torch-side dict from the source params: rel_pos tables copy
    # through name mapping directly.
    def to_sd(tree, prefix=""):
        out = {}
        for k, v in tree.items():
            name = f"{prefix}.{k}" if prefix else k
            if isinstance(v, dict):
                out.update(to_sd(v, name))
            else:
                out[name.replace("blocks_", "blocks.")] = np.asarray(v)
        return out

    sd = {
        k: v
        for k, v in to_sd(vars_src["params"]).items()
        if "rel_pos" in k
    }

    cfg_dst = mvit_cfg(8)  # doubles the temporal extent
    model_dst = build_model(cfg_dst)
    vars_dst = init_model(model_dst, cfg_dst, rng=rng, train=False)
    src_t = None
    dst_t = None
    for k in sd:
        if "rel_pos_t" in k:
            src_t = sd[k]
            break
    new_vars, missing, unexpected = load_torch_checkpoint_dict(
        sd, vars_dst, strict=False
    )
    assert not [u for u in unexpected if "rel_pos" in u], unexpected

    def find_rel_pos_t(tree):
        for k, v in tree.items():
            if k == "rel_pos_t":
                return np.asarray(v)
            if isinstance(v, dict):
                r = find_rel_pos_t(v)
                if r is not None:
                    return r
        return None

    got = find_rel_pos_t(new_vars["params"])
    want = _interp_linear(src_t, got.shape[0])
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)
