"""Self-supervised contrastive models (reference slowfast/models/contrastive.py).

Supported CONTRASTIVE.TYPE: moco, byol, simclr, swav, mem. The flax module
holds the trainable pieces (backbone, predictor MLPs, SwAV prototypes);
cross-step SSL state (momentum-encoder params, queue + pointer, memory
bank) lives in the TrainState ``ssl_state`` pytree and is updated
functionally inside the jitted SSL train step (engine/ssl_steps.py).

Shuffle-BN note: the reference shuffles the key batch across GPUs to break
per-GPU BN statistics leakage, and disables it when global sync-BN is on
(contrastive.py:84-91). Under GSPMD jit our plain/sync BN statistics are
global-batch by construction, so the shuffle cancels and the key encoder
uses frozen EMA stats. With BN.NORM_TYPE=sub_batchnorm (local-stat
semantics) the reference behavior IS reproduced: the SSL step permutes the
global key batch, runs the momentum encoder with fresh per-split
train-mode stats, and inverse-permutes the keys
(engine/ssl_steps.py encode_keys).
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
                    bn_on=cfg.CONTRASTIVE.BN_MLP or cfg.CONTRASTIVE.BN_SYNC_MLP,
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
        # MEM_TYPE "2d" adds a time axis (reference Memory :887-916, length
        # x duration x dim); "1d" matches Memory1D. The kNN probe reads
        # time slot 0 (reference knn_mem has duration 1, :84).
        shape = (cfg.CONTRASTIVE.LENGTH, cfg.CONTRASTIVE.DIM)
        if t == "mem" and cfg.CONTRASTIVE.MEM_TYPE == "2d":
            shape = (
                cfg.CONTRASTIVE.LENGTH,
                max(cfg.CONTRASTIVE.DURATION, 1),
                cfg.CONTRASTIVE.DIM,
            )
        state["memory"] = (
            jax.random.uniform(jax.random.fold_in(rng, 7), shape) * 2.0 - 1.0
        ) * stdv
        if cfg.CONTRASTIVE.KNN_ON and len(shape) == 3:
            # The reference keeps a SEPARATE duration-1 knn_mem updated for
            # every clip regardless of its time (contrastive.py:84,
            # knn_mem_update :126-134); probing the 2d bank's slot 0 would
            # go stale for clips whose time maps elsewhere.
            state["knn_memory"] = (
                jax.random.uniform(
                    jax.random.fold_in(rng, 8),
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


def memory_update(memory, indices, feats, momentum, time=None, interp=False):
    """Momentum update of the instance memory bank.

    1-D bank (L, C): reference Memory1D.update (contrastive.py:1017-1031).
    2-D bank (L, T, C): time-indexed row update, with optional bilinear
    write splitting across the two neighbouring time slots (reference
    Memory.update :939-984, including its inverse-weight convention).
    ``momentum`` is the keep-old weight.
    """
    feats = feats.astype(memory.dtype)
    if memory.ndim == 2:
        old = memory[indices]
        new = l2_normalize(old * momentum + feats * (1 - momentum))
        return memory.at[indices].set(new)
    duration = memory.shape[1]
    if time is None:
        time = jnp.zeros(indices.shape, jnp.float32)
    t0 = jnp.clip(jnp.floor(time).astype(jnp.int32), 0, duration - 1)
    if not interp:
        old = memory[indices, t0]
        new = l2_normalize(old * momentum + feats * (1 - momentum))
        return memory.at[indices, t0].set(new)
    t1 = jnp.clip(t0 + 1, 0, duration - 1)
    # Reference weight convention (:949-960): w_t1 = 1 - (time - t0).
    w_t1 = (1.0 - (time - t0.astype(time.dtype)))[:, None]
    w_t0 = 1.0 - w_t1
    old0 = memory[indices, t0]
    old1 = memory[indices, t1]
    new0 = l2_normalize(feats * w_t0 * (1 - momentum) + old0 * momentum)
    new1 = l2_normalize(feats * w_t1 * (1 - momentum) + old1 * momentum)
    memory = memory.at[indices, t0].set(new0)
    return memory.at[indices, t1].set(new1)


def nce_sample_indices(rng, batch_index, length, k, duration=1, interp=False):
    """Draw the (B, K+1) NCE sample grid (reference contrastive.py:371-411).

    Column 0 is the positive (each clip's own bank row); the remaining K
    columns are uniform random rows. With a time-indexed 2-D bank, random
    time positions are drawn per sample (examplar_type "video": different
    clips of the same video are positives, so the positive's time index
    stays 0-based random too — reference :402-406 with examplar_type fixed
    at "video", :69).
    """
    b = batch_index.shape[0]
    r_clip, r_time = jax.random.split(rng)
    clip_ind = jax.random.randint(r_clip, (b, k + 1), 0, length)
    clip_ind = clip_ind.at[:, 0].set(batch_index)
    if duration > 1:
        if interp:
            time_ind = jax.random.uniform(
                r_time, (b, k + 1), minval=0.0, maxval=float(duration - 1)
            )
        else:
            time_ind = jax.random.randint(r_time, (b, k + 1), 0, duration - 1)
    else:
        time_ind = jnp.zeros((b, k + 1), jnp.int32)
    return clip_ind, time_ind


def nce_logits(q, memory, clip_ind, time_ind, temperature, interp=False):
    """Sampled-NCE logits, MXU-first.

    Instead of gathering a (B, K+1, C) negatives tensor (the reference's
    Memory.get einsum path, :413-417 — HBM-hostile for K=65536), compute
    the full (B, L*T) similarity as ONE matmul against the flattened bank
    and gather the (B, K+1) sampled entries from it. Identical math,
    matmul-shaped for the MXU, no large intermediate.
    """
    if memory.ndim == 2:
        flat = memory
        flat_idx = clip_ind
    else:
        duration = memory.shape[1]
        flat = memory.reshape(-1, memory.shape[-1])
        if interp:
            t0 = jnp.clip(jnp.floor(time_ind).astype(jnp.int32), 0, duration - 1)
            t1 = jnp.clip(t0 + 1, 0, duration - 1)
            all_sim = q @ flat.T.astype(q.dtype)
            s0 = jnp.take_along_axis(all_sim, clip_ind * duration + t0, axis=1)
            s1 = jnp.take_along_axis(all_sim, clip_ind * duration + t1, axis=1)
            # Reference interp weights (:928-934): w_t1 = 1 - (time - t0).
            w_t1 = 1.0 - (time_ind - t0.astype(time_ind.dtype))
            return (s0 * (1.0 - w_t1) + s1 * w_t1) / temperature
        flat_idx = clip_ind * duration + time_ind.astype(jnp.int32)
    all_sim = q @ flat.T.astype(q.dtype)
    return jnp.take_along_axis(all_sim, flat_idx, axis=1) / temperature
