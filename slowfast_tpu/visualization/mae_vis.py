"""MAE reconstruction visualization (VIS_MASK).

Reference: slowfast/models/masked.py:478-517 (``_mae_visualize``) driven
from tools/test_net.py:124 — with ``VIS_MASK.ENABLE`` in test mode, each
test clip is rendered as a (input | masked input | reconstruction)
side-by-side video under ``OUTPUT_DIR/vis_mask/``.

TPU notes: the model stays pure — it returns (pred, (target, mask)) and
all composition/IO happens host-side here. When MASK.NORM_PRED_PIXEL the
prediction lives in per-patch-normalized space; unlike the reference
(which composes the raw prediction) we de-normalize with the ground-truth
patch statistics so the reconstruction is viewable — the standard MAE
visualization practice.
"""

import os

import numpy as np

from slowfast_tpu.utils import logging as logging_utils

logger = logging_utils.get_logger(__name__)


def _patchify(cfg, frames, T0, H0, W0):
    """(B, T, H, W, C) -> (B, T0*H0*W0, D); mirrors MaskMViT._mae_pixel_targets
    (without normalization)."""
    B, T, H, W, C = frames.shape
    pt, ph, pw = cfg.MVIT.PATCH_STRIDE
    if cfg.MASK.TIME_STRIDE_LOSS:
        patches = frames.reshape(B, T0, H0, ph, W0, pw, C)
        patches = patches.transpose(0, 1, 2, 4, 3, 5, 6)
        return patches.reshape(B, T0 * H0 * W0, ph * pw * C)
    patches = frames.reshape(B, T0, pt, H0, ph, W0, pw, C)
    patches = patches.transpose(0, 1, 3, 5, 2, 4, 6, 7)
    return patches.reshape(B, T0 * H0 * W0, pt * ph * pw * C)


def _unpatchify(cfg, patches, T0, H0, W0):
    """Inverse of :func:`_patchify` -> (B, T, H, W, C)."""
    B = patches.shape[0]
    pt, ph, pw = cfg.MVIT.PATCH_STRIDE
    C = 3
    if cfg.MASK.TIME_STRIDE_LOSS:
        x = patches.reshape(B, T0, H0, W0, ph, pw, C)
        x = x.transpose(0, 1, 2, 4, 3, 5, 6)
        return x.reshape(B, T0, H0 * ph, W0 * pw, C)
    x = patches.reshape(B, T0, H0, W0, pt, ph, pw, C)
    x = x.transpose(0, 1, 4, 2, 5, 3, 6, 7)
    return x.reshape(B, T0 * pt, H0 * ph, W0 * pw, C)


def _to_uint8(cfg, frames):
    """Undo DATA.MEAN/STD normalization for display."""
    mean = np.asarray(cfg.DATA.MEAN, np.float32)
    std = np.asarray(cfg.DATA.STD, np.float32)
    x = frames * std + mean
    if x.max() <= 2.0:  # [0, 1]-scale pipelines
        x = x * 255.0
    return np.clip(x, 0, 255).astype(np.uint8)


def _write_video(path, frames, fps=4):
    """frames: (T, H, W, C) RGB uint8 -> mp4."""
    import cv2

    os.makedirs(os.path.dirname(path), exist_ok=True)
    h, w = frames.shape[1:3]
    vw = cv2.VideoWriter(
        path, cv2.VideoWriter_fourcc(*"mp4v"), fps, (w, h)
    )
    for f in frames:
        vw.write(f[:, :, ::-1])  # RGB -> BGR
    vw.release()


def visualize_mae_batch(cfg, model, state, inputs, out_dir, counter):
    """Render one batch of test clips; returns the written paths."""
    import jax

    from slowfast_tpu.engine.steps import _maybe_device_preprocess

    variables = {"params": state.params, "batch_stats": state.batch_stats}
    inputs = _maybe_device_preprocess(cfg, inputs)
    preds, labels = model.apply(variables, inputs, train=False)
    pred = np.asarray(jax.device_get(preds[0]), np.float32)  # (B, N, D)
    target, mask = labels[0]
    target = np.asarray(jax.device_get(target), np.float32)
    mask = np.asarray(jax.device_get(mask), np.float32)  # (B, N)
    clip = np.asarray(jax.device_get(inputs[0]), np.float32)

    pt = cfg.MVIT.PATCH_STRIDE[0]
    T0 = cfg.DATA.NUM_FRAMES // pt
    H0 = clip.shape[2] // cfg.MVIT.PATCH_STRIDE[1]
    W0 = clip.shape[3] // cfg.MVIT.PATCH_STRIDE[2]
    im_viz = clip[:, ::pt][:, :T0] if cfg.MASK.TIME_STRIDE_LOSS else clip

    vis_patches = _patchify(cfg, im_viz, T0, H0, W0)
    if cfg.MASK.NORM_PRED_PIXEL:
        mu = vis_patches.mean(-1, keepdims=True)
        var = vis_patches.var(-1, keepdims=True)
        pred = pred * np.sqrt(var + 1e-6) + mu
    m = mask[:, :, None]
    recon = _unpatchify(cfg, pred * m + vis_patches * (1 - m), T0, H0, W0)
    masked = _unpatchify(cfg, vis_patches * (1 - m), T0, H0, W0)

    paths = []
    for i in range(clip.shape[0]):
        strip = np.concatenate(
            [_to_uint8(cfg, x[i]) for x in (im_viz, masked, recon)], axis=2
        )  # (T, H, 3W, C)
        path = os.path.join(
            out_dir, f"vis_mask_mr{cfg.AUG.MASK_RATIO}_{counter}_{i}.mp4"
        )
        _write_video(path, strip)
        paths.append(path)
    return paths


def run_mae_visualization(cfg, model, state, test_loader):
    """VIS_MASK test mode: render every test clip (reference
    test_net.py:124 skips metric accumulation entirely)."""
    out_dir = os.path.join(cfg.OUTPUT_DIR, "vis_mask", "vid")
    n = 0
    for cur_iter, (inputs, _labels, _idx, _times, _meta) in enumerate(
        test_loader
    ):
        import jax.numpy as jnp

        inputs = [jnp.asarray(x) for x in inputs]
        paths = visualize_mae_batch(cfg, model, state, inputs, out_dir, cur_iter)
        n += len(paths)
    logger.info("VIS_MASK: wrote %d reconstruction videos to %s", n, out_dir)
    return {"vis_mask_videos": n, "dir": out_dir}
