"""MixUp / CutMix, executed on device inside the jitted train step.

Reference: slowfast/datasets/mixup.py:22-192 (timm-derived). The TPU-native
placement differs from the reference (which mixes on GPU in the train loop
python): here mixing is traced into the train step so it fuses with the
forward pass and adds no host round-trip. Semantics match: per-batch lambda
~ Beta(alpha, alpha), batch mixed with its flip, optional cutmix box with
lambda correction, one-hot + label smoothing targets.
"""

from typing import List, Sequence

import jax
import jax.numpy as jnp


def convert_to_one_hot(targets, num_classes, label_smoothing=0.0):
    """(reference mixup.py:22-37)"""
    off_value = label_smoothing / num_classes
    on_value = 1.0 - label_smoothing + off_value
    oh = jax.nn.one_hot(targets, num_classes)
    return oh * on_value + (1.0 - oh) * off_value


def _rand_bbox(rng, shape_hw, lam):
    """Cutmix box for mixing ratio lam (timm rand_bbox semantics)."""
    H, W = shape_hw
    ratio = jnp.sqrt(1.0 - lam)
    cut_h = (H * ratio).astype(jnp.int32)
    cut_w = (W * ratio).astype(jnp.int32)
    r1, r2 = jax.random.split(rng)
    cy = jax.random.randint(r1, (), 0, H)
    cx = jax.random.randint(r2, (), 0, W)
    y1 = jnp.clip(cy - cut_h // 2, 0, H)
    y2 = jnp.clip(cy + cut_h // 2, 0, H)
    x1 = jnp.clip(cx - cut_w // 2, 0, W)
    x2 = jnp.clip(cx + cut_w // 2, 0, W)
    return y1, y2, x1, x2


def mixup_batch(
    rng,
    inputs: Sequence[jnp.ndarray],
    labels: jnp.ndarray,
    num_classes: int,
    mixup_alpha: float = 0.8,
    cutmix_alpha: float = 1.0,
    mix_prob: float = 1.0,
    switch_prob: float = 0.5,
    label_smoothing: float = 0.1,
):
    """Mix a list of NTHWC pathway tensors and integer labels.

    Returns (mixed_inputs, soft_labels).
    """
    r_use, r_switch, r_lam_m, r_lam_c, r_box = jax.random.split(rng, 5)
    use_mix = jax.random.uniform(r_use) < mix_prob
    use_cutmix = (cutmix_alpha > 0.0) & (jax.random.uniform(r_switch) < switch_prob)
    if mixup_alpha <= 0.0 and cutmix_alpha > 0.0:
        use_cutmix = jnp.asarray(True)

    lam_mix = jax.random.beta(r_lam_m, mixup_alpha, mixup_alpha) if mixup_alpha > 0 else 0.0
    lam_cut = (
        jax.random.beta(r_lam_c, cutmix_alpha, cutmix_alpha) if cutmix_alpha > 0 else 0.0
    )

    H, W = inputs[-1].shape[2], inputs[-1].shape[3]
    y1, y2, x1, x2 = _rand_bbox(r_box, (H, W), lam_cut)
    # Corrected lambda for the realized box area.
    lam_cut_adj = 1.0 - ((y2 - y1) * (x2 - x1)) / (H * W)

    lam = jnp.where(use_cutmix, lam_cut_adj, lam_mix)
    lam = jnp.where(use_mix, lam, 1.0)

    def mix_one(x):
        flipped = jnp.flip(x, axis=0)
        h, w = x.shape[2], x.shape[3]
        sy, sx = h / H, w / W  # scale box to this pathway's resolution
        yy = jnp.arange(h)[None, None, :, None, None]
        xx = jnp.arange(w)[None, None, None, :, None]
        in_box = (
            (yy >= (y1 * sy).astype(jnp.int32))
            & (yy < (y2 * sy).astype(jnp.int32))
            & (xx >= (x1 * sx).astype(jnp.int32))
            & (xx < (x2 * sx).astype(jnp.int32))
        )
        cutmixed = jnp.where(in_box, flipped, x)
        mixed = x * lam + flipped * (1.0 - lam)
        out = jnp.where(use_cutmix, cutmixed, mixed)
        return jnp.where(use_mix, out, x)

    mixed = [mix_one(x) for x in inputs]
    y1h = convert_to_one_hot(labels, num_classes, label_smoothing)
    y2h = jnp.flip(y1h, axis=0)
    soft = y1h * lam + y2h * (1.0 - lam)
    return mixed, soft
