"""Batch normalization variants for TPU.

Reference behaviors reproduced (slowfast/models/batchnorm_helper.py:16-112):

* ``batchnorm``      — standard BN. NOTE: under GSPMD ``jit`` with a
  batch-sharded input, batch statistics are computed over the *global* batch
  (XLA inserts the cross-chip reduction automatically). This matches the
  reference's ``BN.GLOBAL_SYNC=True`` / NaiveSyncBatchNorm-global semantics
  and is statistically strictly better than per-device stats; per-device
  statistics are intentionally not reproduced.
* ``sub_batchnorm``  — splits the batch into ``num_splits`` groups and
  normalizes each with its own statistics during training (reference
  SubBatchNorm3d). Running statistics are maintained globally (the
  reference aggregates split stats before eval via
  ``aggregate_sub_bn_stats``; we fold that aggregation into every update).
* ``sync_batchnorm`` — cross-device stats; identical to ``batchnorm`` here
  (see note above), accepted for config compatibility.
* frozen BN (``MODEL.FROZEN_BN``) — always normalize with running stats.

Statistics are computed in float32 regardless of the compute dtype.
"""

from typing import Any

import jax.numpy as jnp
from flax import linen as nn


class BatchNorm3D(nn.Module):
    """BatchNorm over (B, T, H, W) for NTHWC inputs, torch-convention momentum.

    Running stats update: ``new = (1 - momentum) * old + momentum * batch``
    (torch convention, reference bn_mmt=0.1). Variance uses the biased batch
    estimate for normalization and the unbiased estimate for the running
    average, matching ``torch.nn.BatchNorm3d``.
    """

    features: int
    eps: float = 1e-5
    momentum: float = 0.1
    num_splits: int = 1
    frozen: bool = False
    zero_init_gamma: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        scale = self.param(
            "scale",
            nn.initializers.zeros if self.zero_init_gamma else nn.initializers.ones,
            (self.features,),
            jnp.float32,
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)

        ra_mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros((self.features,), jnp.float32)
        )
        ra_var = self.variable(
            "batch_stats", "var", lambda: jnp.ones((self.features,), jnp.float32)
        )

        # Statistics in fp32 (reductions output small (C,)/(s,C) tensors —
        # no fp32 materialization of the activation); the per-element
        # normalize runs in the compute dtype so it fuses without layout
        # copies.
        orig_dtype = x.dtype
        use_batch_stats = train and not self.frozen

        if use_batch_stats:
            reduce_axes = tuple(range(x.ndim - 1))  # all but channel
            if self.num_splits > 1 and x.shape[0] % self.num_splits == 0:
                # Sub-BN: independent stats per batch split.
                s = self.num_splits
                xs = x.reshape((s, x.shape[0] // s) + x.shape[1:])
                split_axes = tuple(range(1, xs.ndim - 1))
                xs32 = xs.astype(jnp.float32)
                mean_s = jnp.mean(xs32, axis=split_axes)  # (s, C)
                var_s = jnp.mean(jnp.square(xs32), axis=split_axes) - jnp.square(
                    mean_s
                )
                inv_s = jnp.reciprocal(jnp.sqrt(var_s + self.eps))
                a = (scale * inv_s).astype(orig_dtype)  # (s, C)
                b = (bias - mean_s * scale * inv_s).astype(orig_dtype)
                y = xs * a[:, None, None, None, None, :] + b[
                    :, None, None, None, None, :
                ]
                y = y.reshape(x.shape)
                # Aggregate split stats for the running average
                # (reference misc.aggregate_sub_bn_stats semantics).
                mean = jnp.mean(mean_s, axis=0)
                var = jnp.mean(var_s + jnp.square(mean_s), axis=0) - jnp.square(mean)
            else:
                x32sum = x.astype(jnp.float32)
                mean = jnp.mean(x32sum, axis=reduce_axes)
                var = jnp.mean(jnp.square(x32sum), axis=reduce_axes) - jnp.square(
                    mean
                )
                inv = jnp.reciprocal(jnp.sqrt(var + self.eps))
                a = (scale * inv).astype(orig_dtype)
                b = (bias - mean * scale * inv).astype(orig_dtype)
                y = x * a + b

            if not self.is_initializing():
                n = x.size / self.features
                unbiased = var * (n / max(n - 1.0, 1.0))
                ra_mean.value = (
                    1.0 - self.momentum
                ) * ra_mean.value + self.momentum * mean
                ra_var.value = (
                    1.0 - self.momentum
                ) * ra_var.value + self.momentum * unbiased
            return y
        else:
            inv = jnp.reciprocal(jnp.sqrt(ra_var.value + self.eps))
            a = (scale * inv).astype(orig_dtype)
            b = (bias - ra_mean.value * scale * inv).astype(orig_dtype)
            return x * a + b


class FoldedBatchNorm(nn.Module):
    """BatchNorm applied to a T-folded (B, H, W, T*C) tensor.

    Shares parameter/stat layout with :class:`BatchNorm3D` (per-channel (C,)
    scale/bias/mean/var under the same names), so checkpoints are identical
    regardless of which formulation ran. Statistics reduce over (B, H, W)
    and the T blocks — exactly the (B, T, H, W) reduction of the unfolded
    tensor.
    """

    features: int
    t: int  # static temporal extent folded into channels
    eps: float = 1e-5
    momentum: float = 0.1
    frozen: bool = False
    zero_init_gamma: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        C, T = self.features, self.t
        scale = self.param(
            "scale",
            nn.initializers.zeros if self.zero_init_gamma else nn.initializers.ones,
            (C,),
            jnp.float32,
        )
        bias = self.param("bias", nn.initializers.zeros, (C,), jnp.float32)
        ra_mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros((C,), jnp.float32)
        )
        ra_var = self.variable(
            "batch_stats", "var", lambda: jnp.ones((C,), jnp.float32)
        )

        orig_dtype = x.dtype
        B, H, W, TC = x.shape
        assert TC == T * C, (TC, T, C)

        if train and not self.frozen:
            # Per-(t, c) moments over (B, H, W), then mean over T blocks.
            x32 = x.astype(jnp.float32)
            m_tc = jnp.mean(x32, axis=(0, 1, 2)).reshape(T, C)
            m2_tc = jnp.mean(jnp.square(x32), axis=(0, 1, 2)).reshape(T, C)
            mean = jnp.mean(m_tc, axis=0)
            var = jnp.mean(m2_tc, axis=0) - jnp.square(mean)
            if not self.is_initializing():
                n = x.size / C
                unbiased = var * (n / max(n - 1.0, 1.0))
                ra_mean.value = (
                    1.0 - self.momentum
                ) * ra_mean.value + self.momentum * mean
                ra_var.value = (
                    1.0 - self.momentum
                ) * ra_var.value + self.momentum * unbiased
        else:
            mean, var = ra_mean.value, ra_var.value

        inv = jnp.reciprocal(jnp.sqrt(var + self.eps))
        # Tile per-channel params across the T blocks; normalize in the
        # compute dtype so the elementwise op fuses.
        scale_t = jnp.tile(scale * inv, (T,)).astype(orig_dtype)
        bias_t = jnp.tile(bias - mean * scale * inv, (T,)).astype(orig_dtype)
        return x * scale_t + bias_t


def norm_builder(cfg):
    """Return a callable ``(features, zero_init_gamma=False) -> BatchNorm3D``
    configured from ``cfg.BN`` (reference get_norm, batchnorm_helper.py:16-37).
    """
    norm_type = cfg.BN.NORM_TYPE
    assert norm_type in (
        "batchnorm",
        "sub_batchnorm",
        "sync_batchnorm",
        "sync_batchnorm_apex",
    ), f"Unknown BN.NORM_TYPE {norm_type}"
    num_splits = cfg.BN.NUM_SPLITS if norm_type == "sub_batchnorm" else 1
    frozen = cfg.MODEL.FROZEN_BN

    def make(features, zero_init_gamma=False, name=None, folded_t=None):
        if folded_t is not None:
            return FoldedBatchNorm(
                features=features,
                t=folded_t,
                frozen=frozen,
                zero_init_gamma=zero_init_gamma,
                name=name,
            )
        return BatchNorm3D(
            features=features,
            num_splits=num_splits,
            frozen=frozen,
            zero_init_gamma=zero_init_gamma,
            name=name,
        )

    return make
