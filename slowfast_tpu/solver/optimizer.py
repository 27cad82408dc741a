"""Optimizer construction with param partitioning, layer-decay, LARS.

Reference: slowfast/models/optimizer.py:28-379. Implemented as an optax
chain. Weight-decay coupling matches torch: SGD/Adam couple decay into the
gradient before momentum/adam scaling; AdamW decouples it after. Per-leaf
weight decay and layer-decay LR scales are trees aligned with the params.
"""

from typing import Any, Callable, NamedTuple

import jax
import jax.numpy as jnp
import optax

from . import lr_policy


# ---------------------------------------------------------------------------
# Param partitioning
# ---------------------------------------------------------------------------

def _flat_names(params):
    """Flax param tree -> list of (path_tuple, torch-style dotted name)."""
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    out = []
    for path, _ in flat:
        segs = [str(getattr(p, "key", getattr(p, "idx", p))) for p in path]
        name = ".".join(segs)
        # flax `blocks_5/...` ~ torch `blocks.5...`
        name = name.replace("blocks_", "blocks.")
        out.append((path, name))
    return out


def _is_bn_param(name):
    segs = name.split(".")
    mod = segs[-2] if len(segs) >= 2 else ""
    return mod == "bn" or mod.endswith("_bn")


def mvit_no_weight_decay(cfg):
    """Names excluded from weight decay (reference :1218-1241)."""
    names = []
    if "MVIT" not in cfg.MODEL.MODEL_NAME.upper() and cfg.MODEL.MODEL_NAME not in (
        "MViT",
        "MaskMViT",
    ):
        return names
    if cfg.MVIT.ZERO_DECAY_POS_CLS:
        if cfg.MVIT.USE_ABS_POS:
            if cfg.MVIT.SEP_POS_EMBED:
                names += ["pos_embed_spatial", "pos_embed_temporal", "pos_embed_class"]
            else:
                names.append("pos_embed")
        if cfg.MVIT.REL_POS_SPATIAL:
            names += ["rel_pos_h", "rel_pos_w", "rel_pos_hw"]
        if cfg.MVIT.REL_POS_TEMPORAL:
            names += ["rel_pos_t"]
        if cfg.MVIT.CLS_EMBED_ON:
            names.append("cls_token")
        if cfg.MASK.ENABLE and cfg.MASK.DECODER_SEP_POS_EMBED:
            # Reference masked.py no_weight_decay :134-143 excludes only the
            # separated decoder tables (its joint-table name there,
            # "pos_embed_decoder", never matches the real parameter
            # "decoder_pos_embed", so the joint table IS decayed — kept).
            names += [
                "dec_pos_embed_spatial",
                "dec_pos_embed_temporal",
                "dec_pos_embed_class",
            ]
    return names


def _layer_decay_scale(name, cfg):
    """Layer-wise LR decay scale (reference get_param_groups :146-160)."""
    if name in ("cls_token", "mask_token") or name.startswith(
        ("pos_embed", "patch_embed")
    ):
        layer_id = 0
    elif name.startswith("blocks"):
        layer_id = int(name.split(".")[1]) + 1
    else:
        layer_id = cfg.MVIT.DEPTH + 1
    return cfg.SOLVER.LAYER_DECAY ** (cfg.MVIT.DEPTH + 1 - layer_id)


def build_param_scales(params, cfg, with_bn_tree=False):
    """Return (wd_tree, lr_scale_tree[, is_bn_tree]) aligned with the
    param pytree."""
    skip = mvit_no_weight_decay(cfg)
    use_layer_decay = cfg.SOLVER.LAYER_DECAY != 1.0

    names = _flat_names(params)
    wd_leaves, scale_leaves, bn_leaves = [], [], []
    for path, name in names:
        is_bn = _is_bn_param(name)
        if is_bn:
            wd = cfg.BN.WEIGHT_DECAY
        elif skip and any(k in name for k in skip):
            wd = 0.0
        else:
            wd = None  # decided per-leaf with shape info
        wd_leaves.append((name, wd))
        bn_leaves.append(is_bn)
        scale_leaves.append(
            _layer_decay_scale(name, cfg) if use_layer_decay else 1.0
        )

    leaves, treedef = jax.tree_util.tree_flatten(params)
    wd_vals = []
    for (name, wd), leaf in zip(wd_leaves, leaves):
        if wd is None:
            if cfg.SOLVER.ZERO_WD_1D_PARAM and (
                leaf.ndim == 1 or name.endswith(".bias")
            ):
                wd = 0.0
            else:
                wd = cfg.SOLVER.WEIGHT_DECAY
        wd_vals.append(float(wd))
    wd_tree = jax.tree_util.tree_unflatten(treedef, wd_vals)
    scale_tree = jax.tree_util.tree_unflatten(treedef, [float(s) for s in scale_leaves])
    if with_bn_tree:
        bn_tree = jax.tree_util.tree_unflatten(treedef, bn_leaves)
        return wd_tree, scale_tree, bn_tree
    return wd_tree, scale_tree


# ---------------------------------------------------------------------------
# optax transforms
# ---------------------------------------------------------------------------

def add_decayed_weights_tree(wd_tree):
    """Coupled/decoupled weight decay with a per-leaf decay tree."""

    def init_fn(params):
        return optax.EmptyState()

    def update_fn(updates, state, params=None):
        assert params is not None
        updates = jax.tree.map(
            lambda g, p, w: g + w * p.astype(g.dtype), updates, params, wd_tree
        )
        return updates, state

    return optax.GradientTransformation(init_fn, update_fn)


def trace_with_dampening(decay, dampening, nesterov=False):
    """torch SGD momentum with dampening: ``v1 = g1`` (no dampening on the
    FIRST accumulation — torch clones the gradient), then
    ``v = decay*v + (1 - dampening)*g``."""

    def init_fn(params):
        return {
            "trace": jax.tree.map(jnp.zeros_like, params),
            "step": jnp.zeros((), jnp.int32),
        }

    def update_fn(updates, state, params=None):
        first = state["step"] == 0
        trace = jax.tree.map(
            lambda g, v: jnp.where(
                first, g, decay * v + (1.0 - dampening) * g
            ),
            updates,
            state["trace"],
        )
        out = (
            jax.tree.map(lambda g, v: g + decay * v, updates, trace)
            if nesterov
            else trace
        )
        return out, {"trace": trace, "step": state["step"] + 1}

    return optax.GradientTransformation(init_fn, update_fn)


def scale_by_tree(scale_tree):
    """Per-leaf multiplicative scaling (layer-decay)."""

    def init_fn(params):
        return optax.EmptyState()

    def update_fn(updates, state, params=None):
        updates = jax.tree.map(lambda g, s: g * s, updates, scale_tree)
        return updates, state

    return optax.GradientTransformation(init_fn, update_fn)


def lars_adaptation(wd_tree, bn_tree, trust_coefficient=0.001, eps=1e-8):
    """LARS trust-ratio scaling on the RAW gradient, before momentum
    (reference optimizer.py:262-359, wrapped with clip=False, trust=0.001).

    For every non-BN param with ndim > 1 (BN groups have apply_LARS=False,
    1-D params are ignored): when both norms are nonzero,
        g <- (g + wd*p) * trust * ||p|| / (||g|| + wd*||p|| + eps).
    Weight decay for LARS-eligible groups is absorbed HERE (the reference
    zeroes group weight_decay during the wrapped optimizer step), so the
    downstream coupled-decay transform must see wd=0 for those leaves.
    """

    def init_fn(params):
        return optax.EmptyState()

    def update_fn(updates, state, params=None):
        assert params is not None

        def adapt(g, p, wd, is_bn):
            if is_bn or p.ndim <= 1:
                return g
            g32 = g.astype(jnp.float32)
            p32 = p.astype(jnp.float32)
            p_norm = jnp.linalg.norm(p32.reshape(-1))
            g_norm = jnp.linalg.norm(g32.reshape(-1))
            ratio = trust_coefficient * p_norm / (g_norm + wd * p_norm + eps)
            out = jnp.where(
                (p_norm != 0) & (g_norm != 0), (g32 + wd * p32) * ratio, g32
            )
            return out.astype(g.dtype)

        return jax.tree.map(adapt, updates, params, wd_tree, bn_tree), state

    return optax.GradientTransformation(init_fn, update_fn)


def make_epoch_lr_fn(cfg) -> Callable:
    """jnp-traceable LR as a function of FRACTIONAL EPOCH, matching
    lr_policy.get_lr_at_epoch (reference slowfast/utils/lr_policy.py:9-25).

    Driving LR by epoch_exact = cur_epoch + cur_iter/data_size (rather than
    by a global step counter) reproduces the reference's per-iteration LR
    exactly and keeps the schedule continuous across multigrid long-cycle
    rebuilds, where steps_per_epoch changes mid-run."""
    policy = cfg.SOLVER.LR_POLICY
    base_lr = cfg.SOLVER.BASE_LR
    warmup_epochs = cfg.SOLVER.WARMUP_EPOCHS
    warmup_start = cfg.SOLVER.WARMUP_START_LR
    max_epoch = cfg.SOLVER.MAX_EPOCH

    if policy == "cosine":
        end_lr = cfg.SOLVER.COSINE_END_LR
        offset = warmup_epochs if cfg.SOLVER.COSINE_AFTER_WARMUP else 0.0
        assert end_lr < base_lr

        def policy_fn(epoch):
            return end_lr + (base_lr - end_lr) * 0.5 * (
                jnp.cos(jnp.pi * (epoch - offset) / (max_epoch - offset)) + 1.0
            )

    elif policy == "steps_with_relative_lrs":
        steps = jnp.asarray(list(cfg.SOLVER.STEPS) + [max_epoch], jnp.float32)
        lrs = jnp.asarray(list(cfg.SOLVER.LRS), jnp.float32) * base_lr

        def policy_fn(epoch):
            ind = jnp.clip(
                jnp.searchsorted(steps, epoch, side="right") - 1, 0, len(lrs) - 1
            )
            return lrs[ind]

    elif policy == "constant":
        def policy_fn(epoch):
            return jnp.asarray(base_lr, jnp.float32)

    else:
        raise NotImplementedError(f"Unknown LR policy: {policy}")

    def epoch_lr_fn(epoch):
        epoch = jnp.asarray(epoch, jnp.float32)
        lr = policy_fn(epoch)
        if warmup_epochs > 0:
            lr_end = policy_fn(jnp.asarray(warmup_epochs, jnp.float32))
            alpha = (lr_end - warmup_start) / warmup_epochs
            warm = epoch * alpha + warmup_start
            lr = jnp.where(epoch < warmup_epochs, warm, lr)
        return lr

    return epoch_lr_fn


def make_lr_schedule(cfg, steps_per_epoch: int) -> Callable:
    """Per-step LR schedule: epoch_exact approximated as step/steps_per_epoch."""
    epoch_lr_fn = make_epoch_lr_fn(cfg)
    return lambda step: epoch_lr_fn(step / steps_per_epoch)


def construct_optimizer(params, cfg, steps_per_epoch: int, global_clip=True):
    """Build the optax optimizer + the lr schedule (by global step).

    ``global_clip=False`` drops the global-norm clip from the chain for
    callers that see only a slice of the model (pipeline stages) and apply
    the true cross-stage norm themselves (parallel/pipeline.py); the
    elementwise CLIP_GRAD_VAL stays — it is slice-local by definition.
    """
    wd_tree, scale_tree, bn_tree = build_param_scales(params, cfg, with_bn_tree=True)
    lr_fn = make_lr_schedule(cfg, steps_per_epoch)

    method = cfg.SOLVER.OPTIMIZING_METHOD
    chain = []
    if cfg.SOLVER.CLIP_GRAD_VAL:
        chain.append(optax.clip(cfg.SOLVER.CLIP_GRAD_VAL))
    elif cfg.SOLVER.CLIP_GRAD_L2NORM and global_clip:
        chain.append(optax.clip_by_global_norm(cfg.SOLVER.CLIP_GRAD_L2NORM))

    decay_tree = wd_tree
    if cfg.SOLVER.LARS_ON:
        # LARS runs on the raw gradient BEFORE momentum and absorbs weight
        # decay for all non-BN leaves (reference wraps the optimizer and
        # zeroes group wd during its step, optimizer.py:323-356).
        chain.append(lars_adaptation(wd_tree, bn_tree, trust_coefficient=0.001))
        decay_tree = jax.tree.map(
            lambda wd, is_bn: wd if is_bn else 0.0, wd_tree, bn_tree
        )

    if method == "sgd":
        chain.append(add_decayed_weights_tree(decay_tree))  # coupled decay
        if cfg.SOLVER.DAMPENING:
            # torch forbids nesterov with dampening (optim/sgd.py).
            assert not cfg.SOLVER.NESTEROV, "dampening requires NESTEROV=False"
            chain.append(
                trace_with_dampening(
                    cfg.SOLVER.MOMENTUM, cfg.SOLVER.DAMPENING
                )
            )
        else:
            chain.append(
                optax.trace(
                    decay=cfg.SOLVER.MOMENTUM, nesterov=cfg.SOLVER.NESTEROV
                )
            )
    elif method == "adam":
        chain.append(add_decayed_weights_tree(decay_tree))
        chain.append(
            optax.scale_by_adam(b1=cfg.SOLVER.BETAS[0], b2=cfg.SOLVER.BETAS[1])
        )
    elif method in ("adamw", "mt_adamw"):
        chain.append(
            optax.scale_by_adam(
                b1=cfg.SOLVER.BETAS[0], b2=cfg.SOLVER.BETAS[1], eps=1e-8
            )
        )
        chain.append(add_decayed_weights_tree(decay_tree))  # decoupled decay
    else:
        raise NotImplementedError(f"Does not support {method} optimizer")

    chain.append(scale_by_tree(scale_tree))

    # NOTE: the LR scale is intentionally NOT part of the chain. The train
    # step computes lr = make_epoch_lr_fn(cfg)(epoch_exact) per iteration
    # and applies params <- params - lr * updates, matching the reference's
    # set_lr-before-step protocol (train_net.py:104-106) and keeping the
    # optimizer state independent of steps_per_epoch (multigrid rebuilds).
    return optax.chain(*chain), lr_fn


def get_grad_norm(grads):
    """Global L2 norm of a gradient tree (reference optimizer.py:362-379)."""
    leaves = jax.tree.leaves(grads)
    return jnp.sqrt(
        sum(jnp.sum(jnp.square(g.astype(jnp.float32))) for g in leaves)
    )
