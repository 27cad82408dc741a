"""Loss functions (reference slowfast/models/losses.py:12-80).

All losses take (predictions, labels) and return a scalar (reduction='mean')
or per-sample values (reduction='none'). Labels may be integer class ids or
soft/one-hot distributions for the cross-entropy family.
"""

import jax
import jax.numpy as jnp


def _reduce(x, reduction):
    if reduction == "mean":
        return jnp.mean(x)
    if reduction == "sum":
        return jnp.sum(x)
    return x


def cross_entropy(logits, labels, reduction="mean"):
    """Softmax cross-entropy; int labels or soft-target distributions."""
    logits = logits.astype(jnp.float32)
    logp = jax.nn.log_softmax(logits, axis=-1)
    if labels.ndim == logits.ndim:
        loss = -jnp.sum(labels * logp, axis=-1)
    else:
        loss = -jnp.take_along_axis(logp, labels[..., None], axis=-1)[..., 0]
    return _reduce(loss, reduction)


def soft_cross_entropy(logits, labels, reduction="mean"):
    """Soft-target CE without target normalization
    (pytorchvideo SoftTargetCrossEntropyLoss(normalize_targets=False)).
    Int labels (mixup disabled) are one-hot encoded first."""
    logits = logits.astype(jnp.float32)
    if labels.ndim < logits.ndim:
        labels = jax.nn.one_hot(labels, logits.shape[-1], dtype=jnp.float32)
    logp = jax.nn.log_softmax(logits, axis=-1)
    loss = -jnp.sum(labels * logp, axis=-1)
    return _reduce(loss, reduction)


def bce(probs, labels, reduction="mean"):
    probs = jnp.clip(probs.astype(jnp.float32), 1e-7, 1 - 1e-7)
    loss = -(labels * jnp.log(probs) + (1.0 - labels) * jnp.log(1.0 - probs))
    return _reduce(loss, reduction)


def bce_logit(logits, labels, reduction="mean"):
    logits = logits.astype(jnp.float32)
    loss = jnp.maximum(logits, 0) - logits * labels + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    return _reduce(loss, reduction)


def mse(preds, labels, reduction="mean"):
    return _reduce(jnp.square(preds.astype(jnp.float32) - labels), reduction)


def contrastive_loss(logits, dummy_labels=None, reduction="mean"):
    """CE against index-0 targets (reference losses.py:14-22)."""
    labels = jnp.zeros((logits.shape[0],), jnp.int32)
    return cross_entropy(logits, labels, reduction)


def multi_mse(preds, labels, reduction="mean"):
    """Weighted sum of MSE losses over lists (reference losses.py:25-57)."""
    loss_sum = 0.0
    multi = []
    for xt, yt in zip(preds, labels):
        wt = 1.0
        if isinstance(yt, (tuple, list)) and len(yt) >= 2:
            yt, wt = yt[0], yt[1]
        l = mse(xt, yt, reduction)
        loss_sum = loss_sum + l * wt
        multi.append(l)
    return loss_sum, multi


_LOSSES = {
    "cross_entropy": cross_entropy,
    "bce": bce,
    "bce_logit": bce_logit,
    "soft_cross_entropy": soft_cross_entropy,
    "contrastive_loss": contrastive_loss,
    "mse": mse,
    "multi_mse": multi_mse,
}


def get_loss_func(loss_name):
    if loss_name not in _LOSSES:
        raise NotImplementedError(f"Loss {loss_name} is not supported")
    return _LOSSES[loss_name]
