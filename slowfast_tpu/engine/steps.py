"""Jitted train/eval step functions.

This is the TPU-native replacement for the reference's per-iteration loop
body (tools/train_net.py:77-270): forward, loss, backward, DDP allreduce,
optimizer step, metric reduction — all fused into one XLA program. The
batch is sharded over the mesh ``data`` axis; XLA inserts the cross-chip
gradient reduction that DDP/NCCL performed in the reference. Mixed
precision is bfloat16 compute with float32 params/optimizer state (the
reference's AMP GradScaler is unnecessary with bfloat16 — no loss scaling).
"""

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import struct
from jax.sharding import NamedSharding, PartitionSpec as P

from slowfast_tpu.data.mixup import mixup_batch
from slowfast_tpu.solver.losses import get_loss_func
from slowfast_tpu.solver.optimizer import get_grad_norm
from slowfast_tpu.utils.metrics import topks_correct


class TrainState(struct.PyTreeNode):
    step: Any
    params: Any
    batch_stats: Any
    opt_state: Any


def create_train_state(cfg, model, tx, rng=None, variables=None):
    import jax as _jax

    from slowfast_tpu.models.build import init_model

    if variables is None:
        # Jit the init: eager init dispatches thousands of tiny ops, which
        # is pathological through the axon tunnel (~minutes).
        variables = _jax.jit(
            lambda r: init_model(model, cfg, rng=r, train=True)
        )(rng if rng is not None else _jax.random.PRNGKey(cfg.RNG_SEED))
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    opt_state = tx.init(params)
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=batch_stats,
        opt_state=opt_state,
    )


def make_train_step(cfg, model, tx, mesh=None, donate=True,
                    steps_per_epoch=1000, epoch_in_batch=False):
    """Build the jitted train step: (state, batch, rng) -> (state, metrics).

    batch: {"inputs": [pathways...], "labels": ..., optional "boxes",
    optional "epoch_exact"}. The per-iteration LR is computed INSIDE the
    step (reference set_lr, train_net.py:104-106) from the fractional epoch:
    batch["epoch_exact"] when ``epoch_in_batch`` (the trainer passes
    cur_epoch + cur_iter/data_size), else state.step/steps_per_epoch.
    """
    detection = cfg.DETECTION.ENABLE
    masked = cfg.MASK.ENABLE
    mixup_on = cfg.MIXUP.ENABLE
    num_classes = cfg.MODEL.NUM_CLASSES
    loss_fun = get_loss_func(cfg.MODEL.LOSS_FUNC)
    multi_label = cfg.DATA.MULTI_LABEL or cfg.MODEL.LOSS_FUNC in ("bce", "bce_logit")
    from slowfast_tpu.solver.optimizer import make_epoch_lr_fn

    lr_epoch_fn = make_epoch_lr_fn(cfg)

    def step_fn(state: TrainState, batch, rng):
        inputs = _maybe_device_preprocess(cfg, batch["inputs"])
        labels = batch["labels"]
        rng = jax.random.fold_in(rng, state.step)
        mix_rng, drop_rng = jax.random.split(rng)

        if mixup_on:
            inputs, soft_labels = mixup_batch(
                mix_rng,
                inputs,
                labels,
                num_classes,
                mixup_alpha=cfg.MIXUP.ALPHA,
                cutmix_alpha=cfg.MIXUP.CUTMIX_ALPHA,
                mix_prob=cfg.MIXUP.PROB,
                switch_prob=cfg.MIXUP.SWITCH_PROB,
                label_smoothing=cfg.MIXUP.LABEL_SMOOTH_VALUE,
            )
            loss_labels = soft_labels
        else:
            loss_labels = labels

        def loss_fn(params):
            variables = {"params": params, "batch_stats": state.batch_stats}
            kwargs = dict(train=True, rngs={"dropout": drop_rng})
            if detection:
                # Static-shape detection: boxes (B, MAX, 4) + validity mask.
                # Padded rows are excluded from the loss (reference trains
                # on the ragged real-box rows only, train_net.py:118-127).
                preds, mutated = model.apply(
                    variables, inputs, batch["boxes"], mutable=["batch_stats"], **kwargs
                )
                mask = batch["box_mask"].reshape(-1)  # (B*MAX,)
                flat_labels = loss_labels.reshape(preds.shape[0], -1)
                per_elem = loss_fun(preds, flat_labels, reduction="none")
                if per_elem.ndim == 2:  # bce: per-(box, class) elements
                    per_elem = per_elem * mask[:, None]
                    denom = jnp.maximum(mask.sum() * preds.shape[-1], 1.0)
                else:  # cross_entropy: per-box
                    per_elem = per_elem * mask
                    denom = jnp.maximum(mask.sum(), 1.0)
                loss = jnp.sum(per_elem) / denom
                return loss, (preds, mutated["batch_stats"])
            elif masked:
                # MaskFeat/MAE: model generates its own targets
                # (reference train_net.py:127-133 MASK branch).
                from slowfast_tpu.models.masked import masked_loss

                (preds, gen_labels), mutated = model.apply(
                    variables, inputs, mask=batch.get("mask"),
                    mutable=["batch_stats"], **kwargs
                )
                loss = masked_loss(preds, gen_labels)
                return loss, (preds[0], mutated["batch_stats"])
            else:
                preds, mutated = model.apply(
                    variables, inputs, mutable=["batch_stats"], **kwargs
                )
            loss = loss_fun(preds, loss_labels)
            if isinstance(loss, tuple):  # multi_mse returns (sum, list)
                loss = loss[0]
            return loss, (preds, mutated["batch_stats"])

        (loss, (preds, new_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)

        grad_norm = get_grad_norm(grads)
        if epoch_in_batch:
            epoch_exact = batch["epoch_exact"]
        else:
            epoch_exact = state.step.astype(jnp.float32) / steps_per_epoch
        lr = lr_epoch_fn(epoch_exact)
        updates, new_opt_state = tx.update(grads, state.opt_state, state.params)
        new_params = jax.tree.map(
            lambda p, u: p - (lr * u).astype(p.dtype), state.params, updates
        )
        new_state = TrainState(
            step=state.step + 1,
            params=new_params,
            batch_stats=new_stats,
            opt_state=new_opt_state,
        )

        metrics = {"loss": loss, "grad_norm": grad_norm, "lr": lr}
        if not detection and not masked and not multi_label and labels.ndim == 1:
            k1, k5 = topks_correct(preds.astype(jnp.float32), labels, (1, 5))
            b = preds.shape[0]
            metrics["top1_err"] = (1.0 - k1 / b) * 100.0
            metrics["top5_err"] = (1.0 - k5 / b) * 100.0
        return new_state, metrics

    if mesh is not None:
        from slowfast_tpu.parallel.mesh import clip_sharding

        repl = NamedSharding(mesh, P())
        data = NamedSharding(mesh, P("data"))
        # "inputs": a single sharding broadcasts over the pathway list
        # (pytree-prefix semantics), so the uint8 single-clip form and the
        # float pathway-list form both shard by batch (plus H over the
        # spatial axis on a 2-D mesh — GSPMD inserts the conv halos).
        batch_shardings = {"inputs": clip_sharding(mesh), "labels": data}
        if detection:
            batch_shardings["boxes"] = data
            batch_shardings["box_mask"] = data
        if masked and cfg.AUG.GEN_MASK_LOADER:
            batch_shardings["mask"] = data
        if epoch_in_batch:
            batch_shardings["epoch_exact"] = repl

        def sharded_step(state, batch, rng):
            # Trace-time context: MViT-family blocks pin their (B, N, C)
            # activations to the seq axis (token partitioning) or their
            # channel axis to the model axis (tensor partitioning); both
            # are no-ops without the corresponding mesh axis.
            from slowfast_tpu.parallel.mesh import (
                token_partitioning,
                tp_partitioning,
            )

            with token_partitioning(mesh), tp_partitioning(mesh):
                return step_fn(state, batch, rng)

        return jax.jit(
            sharded_step,
            in_shardings=(None, batch_shardings, repl),
            donate_argnums=(0,) if donate else (),
        )
    return jax.jit(step_fn, donate_argnums=(0,) if donate else ())


def make_eval_step(cfg, model, mesh=None):
    """(state, batch) -> preds for the eval/test loop.

    With a mesh, the batch is sharded over the ``data`` axis so eval runs
    on all chips (the reference's eval is DDP-parallel too,
    train_net.py:281-422)."""
    detection = cfg.DETECTION.ENABLE

    def step_fn(state: TrainState, batch):
        variables = {"params": state.params, "batch_stats": state.batch_stats}
        inputs = _maybe_device_preprocess(cfg, batch["inputs"])
        if detection:
            preds = model.apply(variables, inputs, batch["boxes"], train=False)
        else:
            preds = model.apply(variables, inputs, train=False)
        return preds

    if mesh is not None:
        from slowfast_tpu.parallel.mesh import clip_sharding

        data = NamedSharding(mesh, P("data"))
        batch_shardings = {"inputs": clip_sharding(mesh), "labels": data}
        if detection:
            batch_shardings["boxes"] = data

        def sharded_step(state, batch):
            from slowfast_tpu.parallel.mesh import (
                token_partitioning,
                tp_partitioning,
            )

            with token_partitioning(mesh), tp_partitioning(mesh):
                return step_fn(state, batch)

        return jax.jit(sharded_step, in_shardings=(None, batch_shardings))
    return jax.jit(step_fn)


def _num_pathways(cfg):
    return 2 if cfg.MODEL.ARCH in cfg.MODEL.MULTI_PATHWAY_ARCH else 1


def _maybe_device_preprocess(cfg, inputs):
    """uint8 input path: normalize + pathway-split ON DEVICE.

    The loader ships a single (B, T, H, W, C) uint8 clip per batch (4x less
    host->device traffic); this converts it to the reference's normalized
    pathway list (tensor_normalize, datasets/utils.py:278-297 +
    pack_pathway_output, :78-111) in one fused XLA pass that the stem conv
    consumes directly. Float inputs pass through untouched.
    """
    if not (len(inputs) == 1 and inputs[0].dtype == jnp.uint8):
        return inputs
    import numpy as np

    mean = np.asarray(cfg.DATA.MEAN, np.float32)
    std = np.asarray(cfg.DATA.STD, np.float32)
    out_dtype = (
        jnp.bfloat16 if cfg.TPU.COMPUTE_DTYPE == "bfloat16" else jnp.float32
    )
    scale = jnp.asarray(1.0 / (255.0 * std))
    bias = jnp.asarray(-mean / std)
    x = (inputs[0].astype(jnp.float32) * scale + bias).astype(out_dtype)
    if cfg.DATA.REVERSE_INPUT_CHANNEL:
        x = x[..., ::-1]
    if _num_pathways(cfg) == 1:
        return [x]
    T = x.shape[1]
    alpha = cfg.SLOWFAST.ALPHA
    idx = np.linspace(0, T - 1, T // alpha).astype(np.int64)
    return [x[:, idx], x]
