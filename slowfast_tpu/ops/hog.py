"""HOG features on TPU (reference slowfast/models/operators.py:62-112).

Sobel gradients via grouped 2D conv, orientation binning via one-hot
matmul (instead of scatter_add — TPU-friendly, identical result), cell
pooling, L2 normalization over bins.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np

SOBEL_X = np.array([[1, 0, -1], [2, 0, -2], [1, 0, -1]], np.float32)


def hog_features(x, nbins=9, cell_sz=8):
    """Compute per-cell HOG.

    Args:
      x: (B, H, W, 3) float frames (normalized RGB is fine; HOG is
         contrast-invariant after the L2 step).
    Returns:
      (B, 3, nbins, H//cell, W//cell) matching the reference layout.
    """
    B, H, W, C = x.shape
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="reflect")
    # Separable Sobel as shift arithmetic, NOT a conv: at reflect borders the
    # two smoothed columns/rows are bitwise identical, so their difference is
    # an exact +0.0 — which keeps atan2's bin assignment (0 vs 8) in lockstep
    # with the reference HOGLayerC; a reassociated conv sum leaves ±1e-7
    # residue there and flips those border bins.
    sm_v = xp[:, :-2] + 2.0 * xp[:, 1:-1] + xp[:, 2:]  # (B, H, W+2, C)
    gx = sm_v[:, :, :-2] - sm_v[:, :, 2:]  # (B, H, W, C)
    sm_h = xp[:, :, :-2] + 2.0 * xp[:, :, 1:-1] + xp[:, :, 2:]  # (B, H+2, W, C)
    gy = sm_h[:, :-2] - sm_h[:, 2:]  # (B, H, W, C)
    norm = jnp.sqrt(gx * gx + gy * gy + 1e-12)  # (B,H,W,C)
    phase = jnp.arctan2(gx, gy) / math.pi * nbins  # [-nbins, nbins]
    bin_idx = jnp.floor(phase).astype(jnp.int32) % nbins
    onehot = jax.nn.one_hot(bin_idx, nbins)  # (B,H,W,C,nbins)
    hist = norm[..., None] * onehot  # (B,H,W,C,nbins)

    # Cell pooling: sum over cell_sz x cell_sz windows.
    Hc, Wc = H // cell_sz, W // cell_sz
    hist = hist[:, : Hc * cell_sz, : Wc * cell_sz]
    hist = hist.reshape(B, Hc, cell_sz, Wc, cell_sz, C, nbins).sum(axis=(2, 4))
    # L2 normalize over bins.
    hist = hist / jnp.sqrt(jnp.sum(hist * hist, axis=-1, keepdims=True) + 1e-12)
    # (B, Hc, Wc, C, nbins) -> (B, C, nbins, Hc, Wc)
    return hist.transpose(0, 3, 4, 1, 2)
