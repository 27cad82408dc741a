"""Pipeline parallelism (GPipe) for the MViT family.

``TPU.PIPELINE_PARTITIONS = P`` splits the transformer block stack into P
contiguous stages placed on disjoint device groups; microbatches stream
through per-stage jitted programs and gradients accumulate on each stage's
own devices. Backward recomputes the stage forward from its saved input
(stage-granular rematerialization), so per-microbatch residuals never
persist — the classic GPipe memory profile. The schedule is
host-dispatched: JAX's async dispatch enqueues stage s's microbatch m+1
while stage s+1 runs microbatch m, so the fill/drain bubble is the only
serialization.

The reference has no pipeline parallelism (SURVEY.md §2.2 — DP via DDP
only); this is the idiomatic TPU extension for models whose parameters +
optimizer state outgrow one chip (MViT-L/H scale). Unlike the GSPMD
sequence/tensor axes (``parallel/mesh.py``), stage weights here are
*placed*, not replicated-and-sliced: each device group owns its blocks'
params and optimizer state outright, so this is the axis that scales
parameter memory. Composes with data parallelism — the devices form a
(pipe, data) grid and each stage is a ``(data,)`` sub-mesh.

Stage boundaries are cost-balanced over the pooling schedule (early
blocks: many tokens, narrow channels; late blocks: few tokens, wide) and
the per-stage parameter trees are disjoint slices of the full model's
tree (``MViT.__call__`` creates identical names per stage), so full
checkpoints split/assemble losslessly (`split_params`/`assemble_params`).
"""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def _schedule_geometry(cfg):
    """Per-block (tokens_in, dim_in, dim_out) from the static pool schedule."""
    from slowfast_tpu.models.mvit import mvit_block_schedule

    blocks = mvit_block_schedule(cfg)
    patch_stride = list(cfg.MVIT.PATCH_STRIDE)
    if cfg.MVIT.PATCH_2D:
        patch_stride = [1] + patch_stride
    thw = [
        cfg.DATA.NUM_FRAMES // patch_stride[0],
        cfg.DATA.TRAIN_CROP_SIZE // patch_stride[1],
        cfg.DATA.TRAIN_CROP_SIZE // patch_stride[2],
    ]
    cls = 1 if cfg.MVIT.CLS_EMBED_ON else 0
    geo = []
    for blk in blocks:
        geo.append((int(np.prod(thw)) + cls, blk["dim"], blk["dim_out"]))
        if blk["stride_q"]:
            thw = [
                (size - 1) // stride + 1
                for size, stride in zip(thw, blk["stride_q"])
            ]
    return geo


def balanced_stage_bounds(cfg, n_stages):
    """Contiguous block ranges [(lo, hi), ...] with roughly equal cost.

    Cost model per block: tokens_in * dim_in * dim_out — the qkv/proj/MLP
    projections dominate MViT step time (attention itself is small once
    K/V are pooled). Cuts land on the prefix-sum quantiles.
    """
    geo = _schedule_geometry(cfg)
    costs = [float(n) * d * do for n, d, do in geo]
    depth = len(costs)
    if n_stages > depth:
        raise ValueError(
            f"PIPELINE_PARTITIONS={n_stages} exceeds MVIT.DEPTH={depth}"
        )
    prefix = np.cumsum(costs)
    total = prefix[-1]
    cuts = [0]
    for s in range(1, n_stages):
        target = total * s / n_stages
        i = int(np.argmin(np.abs(prefix - target))) + 1
        i = max(i, cuts[-1] + 1)  # stages must be nonempty
        i = min(i, depth - (n_stages - s))  # leave blocks for later stages
        cuts.append(i)
    cuts.append(depth)
    return [(cuts[s], cuts[s + 1]) for s in range(n_stages)]


class MViTPipeline:
    """GPipe train/eval driver over per-stage device groups.

    Usage::

        pipe = MViTPipeline(cfg, model)            # devices = all chips
        states = pipe.init_states(rng)             # or variables=full ckpt
        states, metrics = pipe.train_step(states, batch, rng)
    """

    def __init__(self, cfg, model, devices=None, steps_per_epoch=1000):
        from slowfast_tpu.solver.losses import get_loss_func
        from slowfast_tpu.solver.optimizer import make_epoch_lr_fn

        n_pipe = int(cfg.TPU.PIPELINE_PARTITIONS)
        if n_pipe < 2:
            raise ValueError("PIPELINE_PARTITIONS must be >= 2")
        if cfg.MODEL.MODEL_NAME != "MViT":
            raise ValueError(
                "pipeline partitioning stages the MViT block stack; model "
                f"{cfg.MODEL.MODEL_NAME!r} is not supported (conv families "
                "fit under dp x sp — SCALING.md)"
            )
        if cfg.MVIT.REV.ENABLE:
            raise ValueError("Rev-MViT does not compose with pipelining")
        for flag, name in (
            (cfg.DETECTION.ENABLE, "DETECTION.ENABLE"),
            (cfg.MASK.ENABLE, "MASK.ENABLE"),
            (cfg.MIXUP.ENABLE, "MIXUP.ENABLE"),
        ):
            if flag:
                raise NotImplementedError(
                    f"{name} is not supported in pipeline mode (labels and "
                    "inputs live on different stages; use the GSPMD axes)"
                )
        devices = list(devices if devices is not None else jax.devices())
        if len(devices) % n_pipe:
            raise ValueError(
                f"{len(devices)} devices do not split into {n_pipe} stages"
            )
        dp = len(devices) // n_pipe

        self.cfg = cfg
        self.model = model
        self.n_stages = n_pipe
        self.n_micro = int(cfg.TPU.PIPELINE_MICROBATCHES) or n_pipe
        self.bounds = balanced_stage_bounds(cfg, n_pipe)
        self.depth = cfg.MVIT.DEPTH
        self.steps_per_epoch = steps_per_epoch
        self.meshes = [
            Mesh(np.asarray(devices[s * dp : (s + 1) * dp]), ("data",))
            for s in range(n_pipe)
        ]
        self.data_sh = [NamedSharding(m, P("data")) for m in self.meshes]
        self.repl_sh = [NamedSharding(m, P()) for m in self.meshes]

        self._lr_fn = make_epoch_lr_fn(cfg)
        self._loss_fun = get_loss_func(cfg.MODEL.LOSS_FUNC)
        self._multi_label = cfg.DATA.MULTI_LABEL or cfg.MODEL.LOSS_FUNC in (
            "bce",
            "bce_logit",
        )
        self._clip_norm = cfg.SOLVER.CLIP_GRAD_L2NORM or None

        self._fwd = [self._make_fwd(s) for s in range(n_pipe - 1)]
        self._bwd_first = self._make_bwd_first()
        self._bwd_mid = {s: self._make_bwd_mid(s) for s in range(1, n_pipe - 1)}
        self._last = self._make_last()
        self._feval = [self._make_fwd_eval(s) for s in range(n_pipe)]
        self._accum = jax.jit(
            lambda a, g: jax.tree.map(jnp.add, a, g), donate_argnums=(0,)
        )
        self._finalize = [self._make_finalize(s) for s in range(n_pipe)]
        self._txs = None  # built lazily in init_states (needs param trees)
        self._update = None

    # --- per-stage jitted programs -------------------------------------

    def _apply(self, params, xs, rng, s, train):
        lo, hi = self.bounds[s]
        if s == 0:
            from slowfast_tpu.engine.steps import _maybe_device_preprocess

            xs = _maybe_device_preprocess(self.cfg, xs)
        rngs = {"dropout": rng} if train else None
        return self.model.apply(
            {"params": params},
            xs,
            train=train,
            rngs=rngs,
            stage_lo=lo,
            stage_hi=hi if hi < self.depth else None,
        )

    def _make_fwd(self, s):
        def f(params, xs, rng):
            return self._apply(params, xs, rng, s, train=True)

        return jax.jit(
            f,
            in_shardings=(self.repl_sh[s], self.data_sh[s], self.repl_sh[s]),
            out_shardings=self.data_sh[s],
        )

    def _make_bwd_first(self):
        def b(params, xs, rng, gy):
            y, vjp = jax.vjp(
                lambda p: self._apply(p, xs, rng, 0, train=True), params
            )
            (gp,) = vjp(gy)
            return gp

        s = 0
        return jax.jit(
            b,
            in_shardings=(
                self.repl_sh[s],
                self.data_sh[s],
                self.repl_sh[s],
                self.data_sh[s],
            ),
            out_shardings=self.repl_sh[s],
        )

    def _make_bwd_mid(self, s):
        def b(params, xs, rng, gy):
            y, vjp = jax.vjp(
                lambda p, xin: self._apply(p, xin, rng, s, train=True),
                params,
                xs,
            )
            gp, gxs = vjp(gy)
            return gp, gxs[0]

        return jax.jit(
            b,
            in_shardings=(
                self.repl_sh[s],
                self.data_sh[s],
                self.repl_sh[s],
                self.data_sh[s],
            ),
            out_shardings=(self.repl_sh[s], self.data_sh[s]),
        )

    def _make_last(self):
        from slowfast_tpu.utils.metrics import topks_correct

        s = self.n_stages - 1
        loss_fun = self._loss_fun
        multi_label = self._multi_label

        def f(params, xs, labels, rng):
            preds = self._apply(params, xs, rng, s, train=True)
            loss = loss_fun(preds, labels)
            if isinstance(loss, tuple):  # multi_mse returns (sum, list)
                loss = loss[0]
            return loss, preds

        def step(params, xs, labels, rng):
            (loss, preds), (gp, gxs) = jax.value_and_grad(
                f, argnums=(0, 1), has_aux=True
            )(params, xs, labels, rng)
            metrics = {"loss": loss}
            if not multi_label and labels.ndim == 1:
                k1, k5 = topks_correct(
                    preds.astype(jnp.float32), labels, (1, 5)
                )
                b = preds.shape[0]
                metrics["top1_err"] = (1.0 - k1 / b) * 100.0
                metrics["top5_err"] = (1.0 - k5 / b) * 100.0
            return metrics, gp, gxs[0]

        return jax.jit(
            step,
            in_shardings=(
                self.repl_sh[s],
                self.data_sh[s],
                self.data_sh[s],
                self.repl_sh[s],
            ),
            out_shardings=(
                self.repl_sh[s],
                self.repl_sh[s],
                self.data_sh[s],
            ),
        )

    def _make_fwd_eval(self, s):
        def f(params, xs):
            return self._apply(params, xs, None, s, train=False)

        return jax.jit(
            f,
            in_shardings=(self.repl_sh[s], self.data_sh[s]),
            out_shardings=self.data_sh[s],
        )

    def _make_finalize(self, s):
        """(grad_sum, inv_m) -> (mean grads, fp32 squared norm)."""

        def fin(g, inv_m):
            g = jax.tree.map(lambda x: (x * inv_m).astype(x.dtype), g)
            sq = sum(
                jnp.sum(jnp.square(l.astype(jnp.float32)))
                for l in jax.tree.leaves(g)
            )
            return g, sq

        return jax.jit(
            fin,
            in_shardings=(self.repl_sh[s], self.repl_sh[s]),
            out_shardings=(self.repl_sh[s], self.repl_sh[s]),
        )

    def _make_update(self, s, tx):
        from slowfast_tpu.engine.steps import TrainState

        def u(state, grads, lr, scale):
            grads = jax.tree.map(
                lambda g: (g * scale).astype(g.dtype), grads
            )
            updates, opt_state = tx.update(
                grads, state.opt_state, state.params
            )
            params = jax.tree.map(
                lambda p, up: p - (lr * up).astype(p.dtype),
                state.params,
                updates,
            )
            return TrainState(
                step=state.step + 1,
                params=params,
                batch_stats=state.batch_stats,
                opt_state=opt_state,
            )

        return jax.jit(
            u,
            in_shardings=(
                self.repl_sh[s],
                self.repl_sh[s],
                self.repl_sh[s],
                self.repl_sh[s],
            ),
            out_shardings=self.repl_sh[s],
            # Donate the state only: grad buffers cannot alias the outputs
            # (the new params/opt_state already claim the old state's).
            donate_argnums=(0,),
        )

    # --- state management ------------------------------------------------

    def _stage_dummy(self, s):
        """ShapeDtypeStruct inputs for stage s's init/eval_shape."""
        from slowfast_tpu.models.build import dummy_inputs
        from slowfast_tpu.models.video_models import compute_dtype

        if s == 0:
            return [
                jax.ShapeDtypeStruct(x.shape, x.dtype)
                for x in dummy_inputs(self.cfg, batch_size=1)
            ]
        geo = _schedule_geometry(self.cfg)
        n, dim, _ = geo[self.bounds[s][0]]
        return [jax.ShapeDtypeStruct((1, n, dim), compute_dtype(self.cfg))]

    def _stage_init_fn(self, s):
        lo, hi = self.bounds[s]

        def init(rng, xs):
            return self.model.init(
                {"params": rng, "dropout": jax.random.fold_in(rng, 1)},
                xs,
                train=True,
                stage_lo=lo,
                stage_hi=hi if hi < self.depth else None,
            )

        return init

    def _stage_keysets(self):
        """Top-level param key set per stage, from shape-only init traces."""
        keysets = []
        for s in range(self.n_stages):
            shapes = jax.eval_shape(
                self._stage_init_fn(s),
                jax.random.PRNGKey(0),
                self._stage_dummy(s),
            )
            keysets.append(set(shapes["params"].keys()))
        return keysets

    def split_params(self, full_params):
        """Slice a full model param tree into per-stage disjoint subtrees."""
        keysets = self._stage_keysets()
        union = set().union(*keysets)
        missing = set(full_params.keys()) - union
        if missing:
            raise ValueError(f"params not covered by any stage: {missing}")
        return [{k: full_params[k] for k in ks} for ks in keysets]

    def assemble_params(self, states):
        """Merge per-stage params back into one (host) full-model tree —
        the inverse of split_params, for checkpoint save/interop."""
        full = {}
        for st in states:
            full.update(jax.device_get(st.params))
        return full

    def init_states(self, rng=None, variables=None):
        """Build per-stage TrainStates (params + per-stage optimizer state).

        ``variables``: a full model variable dict (init_model output or an
        imported checkpoint) to split across stages; otherwise each stage
        draws its own init (same distributions, per-stage RNG streams).
        """
        from slowfast_tpu.engine.steps import TrainState
        from slowfast_tpu.solver.optimizer import construct_optimizer

        if variables is not None:
            stage_params = self.split_params(variables["params"])
        else:
            if rng is None:
                rng = jax.random.PRNGKey(self.cfg.RNG_SEED)
            stage_params = []
            for s in range(self.n_stages):
                dummy = [
                    jnp.zeros(d.shape, d.dtype) for d in self._stage_dummy(s)
                ]
                vs = jax.jit(self._stage_init_fn(s))(
                    jax.random.fold_in(rng, s), dummy
                )
                stage_params.append(vs["params"])

        self._txs, self._update, states = [], [], []
        for s, params in enumerate(stage_params):
            params = jax.device_put(params, self.repl_sh[s])
            tx, _ = construct_optimizer(
                params,
                self.cfg,
                steps_per_epoch=self.steps_per_epoch,
                global_clip=False,  # pipeline clips by the true global norm
            )
            self._txs.append(tx)
            self._update.append(self._make_update(s, tx))
            states.append(
                TrainState(
                    step=jax.device_put(
                        jnp.zeros((), jnp.int32), self.repl_sh[s]
                    ),
                    params=params,
                    batch_stats={},
                    opt_state=jax.device_put(
                        tx.init(params), self.repl_sh[s]
                    ),
                )
            )
        return states

    # --- train / eval ------------------------------------------------------

    def train_step(self, states, batch, rng, epoch_exact=None):
        """One GPipe step: returns (new_states, metrics-of-host-floats).

        Dispatch order is microbatch-major forward then reversed backward;
        JAX async dispatch overlaps stages (device s runs microbatch m+1
        while s+1 runs m). Loss/grads are exact global-batch means: equal
        microbatches, summed then scaled by 1/M.
        """
        if self._update is None:
            raise RuntimeError("call init_states() before train_step()")
        S, M = self.n_stages, self.n_micro
        inputs, labels = batch["inputs"], batch["labels"]
        B = int(np.shape(labels)[0])
        if B % M:
            raise ValueError(f"batch {B} not divisible by {M} microbatches")
        mb = B // M
        dp = self.meshes[0].devices.size
        if mb % dp:
            raise ValueError(
                f"microbatch {mb} not divisible by the per-stage data axis "
                f"({dp} devices)"
            )

        step_i = int(states[0].step)
        base = jax.random.fold_in(rng, step_i)
        mrng = [
            [jax.random.fold_in(jax.random.fold_in(base, s), m) for m in range(M)]
            for s in range(S)
        ]

        # Forward (fill): stage inputs are saved — backward recomputes the
        # stage forward from them (stage-granular remat), so no residuals
        # outlive the microbatch.
        stage_in = [[None] * M for _ in range(S)]
        labels_d = []
        for m in range(M):
            xs = [
                jax.device_put(p[m * mb : (m + 1) * mb], self.data_sh[0])
                for p in inputs
            ]
            for s in range(S - 1):
                stage_in[s][m] = xs
                y = self._fwd[s](states[s].params, xs, mrng[s][m])
                xs = [jax.device_put(y, self.data_sh[s + 1])]
            stage_in[S - 1][m] = xs
            labels_d.append(
                jax.device_put(labels[m * mb : (m + 1) * mb], self.data_sh[-1])
            )

        # Backward (drain): reversed microbatch order keeps the last
        # stage's queue hot while earlier stages still forward.
        gsum = [None] * S
        metric_acc = []
        for m in reversed(range(M)):
            mets, gp, gx = self._last(
                states[-1].params, stage_in[-1][m], labels_d[m], mrng[-1][m]
            )
            metric_acc.append(mets)
            gsum[-1] = gp if gsum[-1] is None else self._accum(gsum[-1], gp)
            for s in range(S - 2, -1, -1):
                gy = jax.device_put(gx, self.data_sh[s])
                if s == 0:
                    gp = self._bwd_first(
                        states[0].params, stage_in[0][m], mrng[0][m], gy
                    )
                else:
                    gp, gx = self._bwd_mid[s](
                        states[s].params, stage_in[s][m], mrng[s][m], gy
                    )
                gsum[s] = gp if gsum[s] is None else self._accum(gsum[s], gp)

        # Finalize: mean over microbatches, TRUE global grad norm across
        # stages (reference clip_grad_norm_ semantics), per-stage update.
        inv_m = np.float32(1.0 / M)
        grads, sqs = [], []
        for s in range(S):
            g, sq = self._finalize[s](gsum[s], inv_m)
            grads.append(g)
            sqs.append(sq)
        grad_norm = float(np.sqrt(sum(float(sq) for sq in sqs)))
        scale = 1.0
        if self._clip_norm and grad_norm > self._clip_norm:
            scale = self._clip_norm / max(grad_norm, 1e-6)

        if epoch_exact is None:
            epoch_exact = step_i / self.steps_per_epoch
        lr = float(self._lr_fn(epoch_exact))

        new_states = [
            self._update[s](
                states[s], grads[s], np.float32(lr), np.float32(scale)
            )
            for s in range(S)
        ]

        metrics = {
            k: float(np.mean([float(mm[k]) for mm in metric_acc]))
            for k in metric_acc[0]
        }
        metrics["grad_norm"] = grad_norm
        metrics["lr"] = lr
        return new_states, metrics

    def eval_step(self, states, batch):
        """Deterministic forward chain; returns host predictions."""
        xs = [jax.device_put(p, self.data_sh[0]) for p in batch["inputs"]]
        for s in range(self.n_stages):
            y = self._feval[s](states[s].params, xs)
            if s + 1 < self.n_stages:
                xs = [jax.device_put(y, self.data_sh[s + 1])]
        return jax.device_get(y)
