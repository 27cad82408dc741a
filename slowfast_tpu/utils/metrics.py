"""Core accuracy metrics (reference slowfast/utils/metrics.py:9-65).

Implemented with jnp so they can run inside jitted steps; also work on
numpy arrays on host.
"""

import jax.numpy as jnp


def topks_correct(preds, labels, ks):
    """Number of top-k correct predictions for each k."""
    top_max_k = max(ks)
    # Indices of the top-k predictions per sample: (B, top_max_k)
    top_idx = jnp.argsort(preds, axis=-1)[:, ::-1][:, :top_max_k]
    correct = top_idx == labels[:, None]
    return [jnp.sum(correct[:, :k]).astype(jnp.float32) for k in ks]


def topk_errors(preds, labels, ks):
    num_correct = topks_correct(preds, labels, ks)
    return [(1.0 - c / preds.shape[0]) * 100.0 for c in num_correct]


def topk_accuracies(preds, labels, ks):
    num_correct = topks_correct(preds, labels, ks)
    return [c / preds.shape[0] * 100.0 for c in num_correct]
