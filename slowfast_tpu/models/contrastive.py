"""Self-supervised contrastive models (reference slowfast/models/contrastive.py).

Supported CONTRASTIVE.TYPE: moco, byol, simclr, swav, mem. The flax module
holds the trainable pieces (backbone, predictor MLPs, SwAV prototypes);
cross-step SSL state (momentum-encoder params, queue + pointer, memory
bank) lives in the TrainState ``ssl_state`` pytree and is updated
functionally inside the jitted SSL train step (engine/ssl_steps.py).

Shuffle-BN note: the reference shuffles the key batch across GPUs to break
per-GPU BN statistics leakage, and disables it when global sync-BN is on
(contrastive.py:84-91). Under GSPMD jit our BN statistics are global-batch
by construction, so the shuffle is a no-op and is omitted.
"""

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from .heads import MLPHead


def l2_normalize(x, axis=-1, eps=1e-12):
    return x * jax.lax.rsqrt(jnp.sum(jnp.square(x), axis=axis, keepdims=True) + eps)


def _backbone_cls(arch):
    from .video_models import ResNet, SlowFast, X3D

    table = {
        "slowfast": SlowFast,
        "slow": ResNet,
        "c2d": ResNet,
        "i3d": ResNet,
        "slow_c2d": ResNet,
        "slow_i3d": ResNet,
        "2d": ResNet,
        "x3d": X3D,
    }
    if arch == "mvit":
        from .mvit import MViT

        return MViT
    return table[arch]


class ContrastiveModel(nn.Module):
    cfg: Any

    def setup(self):
        cfg = self.cfg
        self.backbone = _backbone_cls(cfg.MODEL.ARCH)(cfg=cfg, name="backbone")
        self.ssl_type = cfg.CONTRASTIVE.TYPE
        if cfg.CONTRASTIVE.PREDICTOR_DEPTHS:
            self.predictors = [
                MLPHead(
                    dim_out=cfg.CONTRASTIVE.DIM,
                    mlp_dim=cfg.CONTRASTIVE.MLP_DIM,
                    num_layers=n_layers,
                    bn_on=cfg.CONTRASTIVE.BN_MLP,
                    flatten=False,
                    name=f"predictor_{i}",
                )
                for i, n_layers in enumerate(cfg.CONTRASTIVE.PREDICTOR_DEPTHS)
            ]
        else:
            self.predictors = []
        if self.ssl_type == "swav":
            # Linear prototypes (reference :94-100, public-code path).
            self.swav_prototypes = nn.Dense(
                1000, use_bias=False, name="swav_prototypes"
            )

    def encode(self, xs, train: bool = False):
        """Backbone forward -> l2-normalized embedding (B, dim)."""
        feats = self.backbone(xs, train=train)
        return l2_normalize(feats)

    def predict(self, feats, train: bool = False):
        """BYOL/MoCo-v3 predictor stack (reference head predictor path)."""
        x = feats
        for p in self.predictors:
            x = p(x, train=train)
            x = l2_normalize(x)
        return x

    def prototypes(self, feats):
        # Plain linear scores (reference :94-100 uses nn.Linear directly;
        # prototype freezing happens in the optimizer surgery, not here).
        return self.swav_prototypes(feats)

    def __call__(self, xs, train: bool = False, use_predictor: bool = False):
        q = self.encode(xs, train=train)
        if self.is_initializing():
            # Touch all submodules so init creates their params.
            if self.predictors:
                self.predict(q, train=train)
            if self.ssl_type == "swav":
                self.prototypes(q)
            return q
        if use_predictor and self.predictors:
            q = self.predict(q, train=train)
        return q


def sinkhorn(scores, eps=0.05, n_iters=3):
    """Sinkhorn-Knopp normalization (reference :825-863), jittable."""
    Q = jnp.exp(scores / eps).T  # (K, B)
    Q = Q / jnp.sum(Q)
    K, B = Q.shape
    for _ in range(n_iters):
        Q = Q / jnp.sum(Q, axis=1, keepdims=True) / K
        Q = Q / jnp.sum(Q, axis=0, keepdims=True) / B
    return (Q * B).T  # (B, K)


def init_ssl_state(cfg, params, rng, batch_stats=None):
    """Cross-step SSL state: EMA params, queue, pointer, memory banks."""
    state = {}
    t = cfg.CONTRASTIVE.TYPE
    if t in ("moco", "byol"):
        state["hist_params"] = jax.tree_util.tree_map(
            lambda x: x, params["backbone"]
        )
        # Momentum encoder carries its OWN running BN stats: the reference's
        # _update_history EMAs all named buffers, not just weights
        # (contrastive.py:153-168).
        state["hist_batch_stats"] = jax.tree_util.tree_map(
            lambda x: x, (batch_stats or {})
        )
        stdv = 1.0 / jnp.sqrt(cfg.CONTRASTIVE.DIM / 3.0)
        state["queue_x"] = (
            jax.random.uniform(rng, (cfg.CONTRASTIVE.QUEUE_LEN, cfg.CONTRASTIVE.DIM))
            * 2.0
            - 1.0
        ) * stdv
        state["ptr"] = jnp.zeros((), jnp.int32)
    if t == "swav" and cfg.CONTRASTIVE.SWAV_QEUE_LEN > 0:
        # Per-view embedding queue feeding sinkhorn once warm
        # (reference contrastive.py:106-116, 611-630).
        state["queue_swav"] = jnp.zeros(
            (2, cfg.CONTRASTIVE.SWAV_QEUE_LEN, cfg.CONTRASTIVE.DIM),
            jnp.float32,
        )
        state["swav_filled"] = jnp.zeros((), jnp.int32)
    if t == "mem" or cfg.CONTRASTIVE.KNN_ON:
        stdv = 1.0 / jnp.sqrt(cfg.CONTRASTIVE.DIM / 3.0)
        state["memory"] = (
            jax.random.uniform(
                jax.random.fold_in(rng, 7),
                (cfg.CONTRASTIVE.LENGTH, cfg.CONTRASTIVE.DIM),
            )
            * 2.0
            - 1.0
        ) * stdv
    state["iter"] = jnp.zeros((), jnp.int32)
    return state


def momentum_update(hist_params, params, mmt):
    """EMA of the backbone parameters (reference _update_history :153-168)."""
    return jax.tree_util.tree_map(
        lambda h, p: h * mmt + p.astype(h.dtype) * (1.0 - mmt), hist_params, params
    )


def dequeue_and_enqueue(queue, ptr, keys):
    """Ring-buffer enqueue (reference :255-283). Static key count."""
    num = keys.shape[0]
    idx = (ptr + jnp.arange(num)) % queue.shape[0]
    queue = queue.at[idx].set(keys.astype(queue.dtype))
    ptr = (ptr + num) % queue.shape[0]
    return queue, ptr


def memory_update(memory, indices, feats, momentum):
    """Momentum update of the instance memory bank (reference Memory :887+)."""
    old = memory[indices]
    new = l2_normalize(old * momentum + feats.astype(memory.dtype) * (1 - momentum))
    return memory.at[indices].set(new)
