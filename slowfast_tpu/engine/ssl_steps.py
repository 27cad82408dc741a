"""Jitted SSL train steps: MoCo / BYOL / SimCLR / SwAV / instance memory.

Reference flow: slowfast/models/contrastive.py:358-757 +
train_net.py contrastive hooks (:118-126, contrastive_forward,
contrastive_parameter_surgery). Each step consumes a two-view batch
{"inputs": view1 pathways, "inputs2": view2 pathways, "index": video ids}
and threads the SSL state (EMA params, queue, memory) functionally.

Under GSPMD the reference's cross-GPU machinery collapses:
  * DDP allreduce -> automatic on the sharded batch;
  * cat_all_gather of keys -> keys are already global inside jit, so the
    queue/memory updates see the full global batch;
  * shuffle-BN -> unnecessary (global-batch BN statistics).
"""

from typing import Any

import jax
import jax.numpy as jnp
from flax import struct
from jax.sharding import NamedSharding, PartitionSpec as P

from slowfast_tpu.models.contrastive import (
    ContrastiveModel,
    dequeue_and_enqueue,
    init_ssl_state,
    l2_normalize,
    memory_update,
    momentum_update,
    sinkhorn,
)
from slowfast_tpu.solver.losses import contrastive_loss
from slowfast_tpu.solver.optimizer import get_grad_norm


class SSLTrainState(struct.PyTreeNode):
    step: Any
    params: Any
    batch_stats: Any
    opt_state: Any
    ssl_state: Any


def create_ssl_train_state(cfg, model, tx, rng=None):
    from slowfast_tpu.models.build import dummy_inputs

    rng = rng if rng is not None else jax.random.PRNGKey(cfg.RNG_SEED)
    inputs = dummy_inputs(cfg, batch_size=2)
    variables = model.init(
        {"params": rng, "dropout": jax.random.fold_in(rng, 1)}, inputs, train=True
    )
    params = variables["params"]
    ssl_state = init_ssl_state(
        cfg, params, jax.random.fold_in(rng, 2),
        batch_stats=variables.get("batch_stats", {}),
    )
    return SSLTrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=variables.get("batch_stats", {}),
        opt_state=tx.init(params),
        ssl_state=ssl_state,
    )


def _momentum(cfg, step, steps_per_epoch):
    """Momentum annealing (reference :126-151): cosine anneal to 1.0."""
    base = cfg.CONTRASTIVE.MOMENTUM
    if not cfg.CONTRASTIVE.MOMENTUM_ANNEALING:
        return jnp.asarray(base, jnp.float32)
    epoch_exact = step / steps_per_epoch
    return (
        1.0
        - (1.0 - base)
        * (jnp.cos(jnp.pi * epoch_exact / cfg.SOLVER.MAX_EPOCH) + 1.0)
        * 0.5
    )


def make_ssl_train_step(cfg, model: ContrastiveModel, tx, mesh=None,
                        steps_per_epoch=1000, donate=True):
    ssl_type = cfg.CONTRASTIVE.TYPE
    T = cfg.CONTRASTIVE.T
    from slowfast_tpu.solver.optimizer import make_epoch_lr_fn

    lr_epoch_fn = make_epoch_lr_fn(cfg)

    def encode(params, batch_stats, xs, rng, train=True, use_predictor=False):
        variables = {"params": params, "batch_stats": batch_stats}
        out, mutated = model.apply(
            variables,
            xs,
            train=train,
            use_predictor=use_predictor,
            mutable=["batch_stats"],
            rngs={"dropout": rng},
        )
        return out, mutated["batch_stats"]

    def encode_frozen(params, batch_stats, xs):
        """Key encoder: frozen stats, no dropout (reference eval-mode keys)."""
        variables = {"params": params, "batch_stats": batch_stats}
        return model.apply(
            variables, xs, train=False, method=ContrastiveModel.encode
        )

    # Shuffle-BN (reference _batch_shuffle/_batch_unshuffle,
    # contrastive.py:169-226, gated at :86-93): the reference MoCo key
    # encoder runs train-mode BN, so with per-GPU (local) statistics each
    # key would be normalized by its own contiguous sub-batch — an
    # intra-batch leak the shuffle breaks by permuting the GLOBAL key
    # batch before the per-GPU slice. Under jit, plain/sync BN statistics
    # are global-batch by construction (a permutation cancels in a global
    # mean), so the shuffle only has an effect — and is only applied —
    # when BN.NORM_TYPE is sub_batchnorm: BN.NUM_SPLITS plays the
    # reference's per-GPU role, and the key forward runs with fresh
    # per-split train-mode stats on a permuted batch, inverse-permuting
    # the keys afterwards. BYOL is excluded exactly as the reference
    # excludes it (:92). LOCAL_SHUFFLE_BN (host-local vs global shuffle)
    # has no analogue in a single-program SPMD step — the global
    # permutation subsumes both.
    shuffle_bn = (
        ssl_type == "moco"
        and cfg.BN.NORM_TYPE == "sub_batchnorm"
        and cfg.BN.NUM_SPLITS > 1
    )

    def encode_keys(hist_params, hist_stats, xs, r):
        """Momentum-encoder keys, l2-normalized; shuffled sub-BN stats
        when shuffle_bn else frozen EMA stats."""
        if not shuffle_bn:
            return encode_frozen({"backbone": hist_params}, hist_stats, xs)
        B = xs[0].shape[0]
        perm = jax.random.permutation(jax.random.fold_in(r, 17), B)
        xs_sh = [x[perm] for x in xs]
        variables = {
            "params": {"backbone": hist_params},
            "batch_stats": hist_stats,
        }
        out, _ = model.apply(
            variables,
            xs_sh,
            train=True,
            mutable=["batch_stats"],  # stat updates discarded: the hist
            # encoder's running stats EMA from the query encoder instead
            rngs={"dropout": jax.random.fold_in(r, 18)},
            method=ContrastiveModel.encode,
        )
        return out[jnp.argsort(perm)]

    def step_fn(state: SSLTrainState, batch, rng):
        rng = jax.random.fold_in(rng, state.step)
        r1, r2 = jax.random.split(rng)
        ssl = dict(state.ssl_state)
        index = batch.get("index")
        mmt = _momentum(cfg, state.step, steps_per_epoch)

        # The momentum (key) encoder runs with ITS OWN EMA batch stats
        # (reference contrastive.py:153-168 EMAs all buffers).
        hist_stats = ssl.get("hist_batch_stats", state.batch_stats)

        if ssl_type == "moco":
            keys = encode_keys(
                ssl["hist_params"], hist_stats, batch["inputs2"], r2
            )
            keys = jax.lax.stop_gradient(keys)

            def loss_fn(params):
                q, new_stats = encode(params, state.batch_stats, batch["inputs"], r1)
                q = l2_normalize(q)
                pos = jnp.einsum("bc,bc->b", q, keys)[:, None]
                neg = q @ ssl["queue_x"].T.astype(q.dtype)
                logits = jnp.concatenate([pos, neg], axis=1) / T
                return contrastive_loss(logits), (new_stats, q)

        elif ssl_type == "byol":
            keys = encode_frozen(
                {"backbone": ssl["hist_params"]}, hist_stats, batch["inputs2"]
            )
            keys2 = encode_frozen(
                {"backbone": ssl["hist_params"]}, hist_stats, batch["inputs"]
            )
            keys, keys2 = jax.lax.stop_gradient((keys, keys2))

            def loss_fn(params):
                q1, stats1 = encode(
                    params, state.batch_stats, batch["inputs"], r1,
                    use_predictor=True,
                )
                q2, stats2 = encode(
                    params, stats1, batch["inputs2"], r2, use_predictor=True
                )
                # Symmetric similarity loss (reference sim_loss :237-245).
                loss = (
                    2.0
                    - 2.0 * jnp.mean(jnp.sum(q1 * keys, axis=-1))
                    + 2.0
                    - 2.0 * jnp.mean(jnp.sum(q2 * keys2, axis=-1))
                ) * 0.5
                return loss, (stats2, q1)

        elif ssl_type == "simclr":
            def loss_fn(params):
                q1, stats1 = encode(params, state.batch_stats, batch["inputs"], r1)
                q2, stats2 = encode(params, stats1, batch["inputs2"], r2)
                # NT-Xent over the global batch (inside jit the batch IS
                # global; reference gathers across GPUs, :758-799).
                B = q1.shape[0]
                z = jnp.concatenate([q1, q2], axis=0)
                sim = (z @ z.T) / T
                mask = jnp.eye(2 * B, dtype=bool)
                sim = jnp.where(mask, -1e9, sim)
                pos_idx = jnp.concatenate(
                    [jnp.arange(B) + B, jnp.arange(B)], axis=0
                )
                logp = jax.nn.log_softmax(sim, axis=1)
                loss = -jnp.mean(logp[jnp.arange(2 * B), pos_idx])
                return loss, (stats2, q1)

        elif ssl_type == "swav":
            swav_queue_len = cfg.CONTRASTIVE.SWAV_QEUE_LEN

            def loss_fn(params):
                q1, stats1 = encode(params, state.batch_stats, batch["inputs"], r1)
                q2, stats2 = encode(params, stats1, batch["inputs2"], r2)
                variables = {"params": params}
                s1 = model.apply(variables, q1, method=ContrastiveModel.prototypes)
                s2 = model.apply(variables, q2, method=ContrastiveModel.prototypes)

                def codes(s, view):
                    s = s.astype(jnp.float32)
                    if swav_queue_len <= 0:
                        return jax.lax.stop_gradient(sinkhorn(s))
                    # Queue-augmented assignment (reference :611-630): once
                    # the queue is warm, past embeddings join the sinkhorn
                    # problem; only the batch rows' codes are used.
                    B = s.shape[0]
                    sq = model.apply(
                        variables,
                        jax.lax.stop_gradient(ssl["queue_swav"][view]),
                        method=ContrastiveModel.prototypes,
                    ).astype(jnp.float32)
                    full = sinkhorn(jnp.concatenate([sq, s], axis=0))[-B:]
                    plain = sinkhorn(s)
                    warm = ssl["swav_filled"] >= swav_queue_len
                    return jax.lax.stop_gradient(
                        jnp.where(warm, full, plain)
                    )

                code1 = codes(s1, 0)
                code2 = codes(s2, 1)
                p1 = jax.nn.log_softmax(s1.astype(jnp.float32) / 0.1, axis=1)
                p2 = jax.nn.log_softmax(s2.astype(jnp.float32) / 0.1, axis=1)
                loss = -0.5 * (
                    jnp.mean(jnp.sum(code2 * p1, axis=1))
                    + jnp.mean(jnp.sum(code1 * p2, axis=1))
                )
                return loss, (stats2, (q1, q2))

        elif ssl_type == "mem":
            # Sampled-NCE InstDisc against the (optionally time-indexed)
            # memory bank (reference contrastive.py:362-421): K random
            # negatives + the clip's own row as the positive, CE target 0.
            nce_k = min(cfg.CONTRASTIVE.QUEUE_LEN, cfg.CONTRASTIVE.LENGTH)
            duration = (
                max(cfg.CONTRASTIVE.DURATION, 1)
                if cfg.CONTRASTIVE.MEM_TYPE == "2d"
                else 1
            )
            interp = cfg.CONTRASTIVE.INTERP_MEMORY

            def loss_fn(params):
                from slowfast_tpu.models.contrastive import (
                    nce_logits,
                    nce_sample_indices,
                )

                q, new_stats = encode(params, state.batch_stats, batch["inputs"], r1)
                clip_ind, time_ind = nce_sample_indices(
                    jax.random.fold_in(r2, 3), index,
                    cfg.CONTRASTIVE.LENGTH, nce_k,
                    duration=duration, interp=interp,
                )
                logits = nce_logits(
                    q, jax.lax.stop_gradient(ssl["memory"]),
                    clip_ind, time_ind, T, interp=interp,
                )
                loss = contrastive_loss(logits)
                return loss, (new_stats, q)

        else:
            raise NotImplementedError(f"CONTRASTIVE.TYPE {ssl_type}")

        (loss, (new_stats, q)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params
        )
        q2_swav = None
        if ssl_type == "swav":
            q, q2_swav = q

        epoch_exact = state.step.astype(jnp.float32) / steps_per_epoch

        # contrastive_parameter_surgery (reference contrastive.py:1031-1055).
        if ssl_type == "swav":
            # Freeze prototypes during the first epoch.
            frozen = (epoch_exact <= 1.0).astype(jnp.float32)
            if "swav_prototypes" in grads:
                grads = dict(grads)
                grads["swav_prototypes"] = jax.tree_util.tree_map(
                    lambda g: g * (1.0 - frozen), grads["swav_prototypes"]
                )

        grad_norm = get_grad_norm(grads)
        lr = lr_epoch_fn(epoch_exact)
        updates, new_opt_state = tx.update(grads, state.opt_state, state.params)
        new_params = jax.tree_util.tree_map(
            lambda p, u: p - (lr * u).astype(p.dtype), state.params, updates
        )

        if ssl_type == "moco" and cfg.TRAIN.BATCH_SIZE > 0:
            # MoCo queue warmup: no parameter updates for the first
            # QUEUE_LEN/global_batch iterations of epoch 0.
            iters_noupdate = cfg.CONTRASTIVE.QUEUE_LEN // cfg.TRAIN.BATCH_SIZE
            upd = jnp.logical_or(
                state.step >= iters_noupdate, epoch_exact >= 1.0
            )
            new_params = jax.tree_util.tree_map(
                lambda n, o: jnp.where(upd, n, o), new_params, state.params
            )
            new_opt_state = jax.tree_util.tree_map(
                lambda n, o: jnp.where(upd, n, o) if hasattr(n, "shape") else n,
                new_opt_state,
                state.opt_state,
            )

        if ssl_type == "swav" and "swav_prototypes" in new_params:
            # Renormalize prototype columns after the update (reference
            # public-code path :587-592 normalizes weights each step).
            proto = dict(new_params["swav_prototypes"])
            k = proto["kernel"]
            proto["kernel"] = k / jnp.maximum(
                jnp.linalg.norm(k, axis=0, keepdims=True), 1e-12
            )
            new_params = dict(new_params)
            new_params["swav_prototypes"] = proto

        # SSL state updates (reference contrastive_parameter_surgery + hooks).
        if ssl_type in ("moco", "byol"):
            ssl["hist_params"] = momentum_update(
                ssl["hist_params"], new_params["backbone"], mmt
            )
            if "hist_batch_stats" in ssl:
                ssl["hist_batch_stats"] = momentum_update(
                    ssl["hist_batch_stats"], new_stats, mmt
                )
        if ssl_type == "moco":
            enq = keys
            if cfg.CONTRASTIVE.MOCO_MULTI_VIEW_QUEUE:
                # Enqueue keys from EVERY view, not just the key view
                # (reference _dequeue_and_enqueue extra_keys,
                # contrastive.py:255-283).
                keys_q_view = jax.lax.stop_gradient(
                    encode_keys(
                        ssl["hist_params"],
                        hist_stats,
                        batch["inputs"],
                        jax.random.fold_in(r2, 1),
                    )
                )
                enq = jnp.concatenate([keys, keys_q_view], axis=0)
            ssl["queue_x"], ssl["ptr"] = dequeue_and_enqueue(
                ssl["queue_x"], ssl["ptr"], enq
            )
        if ssl_type == "swav" and "queue_swav" in ssl:
            # Shift-in this batch's embeddings per view (reference :625-630).
            B = q.shape[0]
            L = ssl["queue_swav"].shape[1]
            new_rows = jnp.stack(
                [
                    jax.lax.stop_gradient(q).astype(jnp.float32),
                    jax.lax.stop_gradient(q2_swav).astype(jnp.float32),
                ]
            )
            ssl["queue_swav"] = jnp.concatenate(
                [new_rows, ssl["queue_swav"][:, : L - B]], axis=1
            )
            ssl["swav_filled"] = jnp.minimum(ssl["swav_filled"] + B, L)
        if ssl_type == "mem" and index is not None:
            # Reference mem update (:419-421): q*mmt + old*(1-mmt), so the
            # keep-old weight is 1-mmt (annealed); time-indexed write when
            # the bank is 2d. The clip's [0,1] temporal position scales to
            # a slot index by duration-1 (reference :372 time *= duration-1).
            mem_time = batch.get("time")
            if mem_time is not None and ssl["memory"].ndim == 3:
                mem_time = mem_time.astype(jnp.float32) * (
                    ssl["memory"].shape[1] - 1
                )
            ssl["memory"] = memory_update(
                ssl["memory"], index, jax.lax.stop_gradient(q), 1.0 - mmt,
                time=mem_time,
                interp=cfg.CONTRASTIVE.INTERP_MEMORY,
            )
        if "memory" in ssl and ssl_type != "mem" and index is not None:
            # kNN memory (reference knn_mem_update :126-134).
            ssl["memory"] = memory_update(
                ssl["memory"], index, jax.lax.stop_gradient(q), 1.0 - mmt
            )
        if "knn_memory" in ssl and index is not None:
            # Separate duration-1 kNN bank for 2d-memory runs, written on
            # EVERY step regardless of clip time (reference knn_mem :84).
            ssl["knn_memory"] = memory_update(
                ssl["knn_memory"], index, jax.lax.stop_gradient(q), 1.0 - mmt
            )
        ssl["iter"] = ssl["iter"] + 1

        new_state = SSLTrainState(
            step=state.step + 1,
            params=new_params,
            batch_stats=new_stats,
            opt_state=new_opt_state,
            ssl_state=ssl,
        )
        return new_state, {"loss": loss, "grad_norm": grad_norm, "lr": lr}

    if mesh is not None:
        # Mirror the supervised step's explicit shardings (steps.py:166-184):
        # batch sharded over the data axis (a single sharding broadcasts over
        # each pathway list), state/rng replicated. The trainer's SSL batch
        # always carries exactly these four keys.
        from slowfast_tpu.parallel.mesh import clip_sharding

        repl = NamedSharding(mesh, P())
        data = NamedSharding(mesh, P("data"))
        # Rank-5 clips additionally shard H over a spatial axis, exactly
        # as shard_batch places them (clip_sharding is P("data") on 1-D
        # meshes, so this is the supervised step's scheme, steps.py:175).
        clips = clip_sharding(mesh)
        batch_shardings = {
            "inputs": clips,
            "inputs2": clips,
            "index": data,
            "time": data,
        }

        def sharded_step(state, batch, rng):
            # Same trace-time partitioning contexts as the supervised step:
            # an MViT backbone under a (data, seq) or (data, model) mesh
            # pins its token/channel axes (no-ops on a data-only mesh).
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


def knn_eval(cfg, model, state, train_labels, val_loader, k=200, sigma=0.07):
    """Online kNN evaluation against the instance memory bank.

    Reference: contrastive.py eval_knn :227-236 + Memory bank; the standard
    InstDisc weighted-vote protocol: cosine similarities to all bank
    entries, top-k neighbors vote with weight exp(sim / sigma).
    Returns top-1 accuracy (percent).
    """
    import numpy as np

    # The neighbour count cannot exceed the bank length (tiny test banks).
    k = min(k, cfg.CONTRASTIVE.LENGTH)
    # 2d-bank runs keep a separate duration-1 knn bank updated every step
    # (reference knn_mem, contrastive.py:84); fall back to the main bank's
    # slot 0 only for states created before it existed.
    memory = state.ssl_state.get("knn_memory")
    if memory is None:
        memory = state.ssl_state.get("memory")
    if memory is not None and memory.ndim == 3:
        memory = memory[:, 0]
    if memory is None:
        return None
    train_labels = jnp.asarray(train_labels, jnp.int32)
    num_classes = cfg.MODEL.NUM_CLASSES if cfg.CONTRASTIVE.NUM_CLASSES_DOWNSTREAM == 0 else cfg.CONTRASTIVE.NUM_CLASSES_DOWNSTREAM

    @jax.jit
    def batch_knn(params, batch_stats, xs):
        q = model.apply(
            {"params": params, "batch_stats": batch_stats},
            xs,
            train=False,
            method=type(model).encode,
        )
        sim = q @ memory.T.astype(q.dtype)  # (B, LENGTH)
        top_sim, top_idx = jax.lax.top_k(sim, k)
        weights = jnp.exp(top_sim / sigma)  # (B, k)
        neigh_labels = train_labels[top_idx]  # (B, k)
        onehot = jax.nn.one_hot(neigh_labels, num_classes)
        scores = jnp.sum(onehot * weights[..., None], axis=1)
        return jnp.argmax(scores, axis=-1)

    correct, total = 0, 0
    for inputs, labels, index, times, meta in val_loader:
        xs = [jnp.asarray(x) for x in (inputs[0] if isinstance(inputs, tuple) else inputs)]
        pred = np.asarray(batch_knn(state.params, state.batch_stats, xs))
        correct += int((pred == np.asarray(labels)).sum())
        total += len(labels)
    return 100.0 * correct / max(total, 1)
