"""Reversible MViT backbone (reference slowfast/models/reversible_mvit.py).

Two-stream reversible blocks: Y1 = X1 + F(X2), Y2 = X2 + G(Y1), with
F = pre-LN pooling attention and G = pre-LN MLP; StageTransitionBlocks
(non-reversible) at Q-pooling boundaries fuse the streams, pool the
residual with the shared Q-pool conv, and re-expand.

The reference implements a custom autograd Function (RevBackProp,
:177-263) that reconstructs activations in the backward pass: only the
span OUTPUTS are stored, and each block's inputs are recovered by
inverting the two residual updates (x2 = y2 - G(y1); x1 = y1 - F(x2)),
so residual activation memory is O(1) in span depth. This file does the
same with a ``jax.custom_vjp`` over each reversible span
(:func:`_run_reversible_span`); per-block ``jax.checkpoint`` — which
still stores both stream boundaries per block, O(depth) — is kept as the
``cfg.TPU.REV_BACKPROP=False`` fallback and for the grad-equivalence
test. Stochasticity (droppath / attention dropout) replays exactly in
the backward because per-block RNG keys are threaded through the custom
VJP as explicit arguments, mirroring the reference's seed replay
(:199-206).
"""

from typing import Any, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from .attention import MultiScaleAttention, bias02, trunc02
from slowfast_tpu.ops.pallas_attention import use_pallas
from .common import Mlp, TwoStreamFusion, drop_path


class MLPSubblock(nn.Module):
    """G: LN -> MLP (reference reversible_mvit.py:593-614)."""

    dim: int
    mlp_ratio: float = 4.0
    dtype: Any = None

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        y = nn.LayerNorm(epsilon=1e-6, bias_init=bias02, name="norm")(x)
        return Mlp(
            hidden_features=int(self.dim * self.mlp_ratio),
            out_features=self.dim,
            bias_init=bias02,
            dtype=self.dtype,
            name="mlp",
        )(y, deterministic=deterministic)


class AttentionSubBlock(nn.Module):
    """F: LN -> MultiScaleAttention (reference reversible_mvit.py:616-672)."""

    dim: int
    dim_out: int
    input_size: Sequence[int]
    num_heads: int
    thw: Sequence[int]
    cfg: Any
    kernel_q: Tuple[int, ...] = ()
    kernel_kv: Tuple[int, ...] = ()
    stride_q: Tuple[int, ...] = ()
    stride_kv: Tuple[int, ...] = ()
    dtype: Any = None

    @nn.compact
    def __call__(self, x, deterministic: bool = True, res_input=None):
        cfg = self.cfg
        y = nn.LayerNorm(epsilon=1e-6, bias_init=bias02, name="norm")(x)
        attn = MultiScaleAttention(
            dim=self.dim,
            dim_out=self.dim_out,
            input_size=tuple(self.input_size),
            num_heads=self.num_heads,
            qkv_bias=cfg.MVIT.QKV_BIAS,
            drop_rate=cfg.MVIT.DROPOUT_RATE,
            kernel_q=self.kernel_q,
            kernel_kv=self.kernel_kv,
            stride_q=self.stride_q,
            stride_kv=self.stride_kv,
            has_cls_embed=cfg.MVIT.CLS_EMBED_ON,
            mode=cfg.MVIT.MODE,
            pool_first=cfg.MVIT.POOL_FIRST,
            rel_pos_spatial=cfg.MVIT.REL_POS_SPATIAL,
            rel_pos_temporal=cfg.MVIT.REL_POS_TEMPORAL,
            rel_pos_zero_init=cfg.MVIT.REL_POS_ZERO_INIT,
            residual_pooling=cfg.MVIT.RESIDUAL_POOLING,
            separate_qkv=cfg.MVIT.SEPARATE_QKV,
            use_pallas_attention=use_pallas(cfg),
            fused_attention=cfg.TPU.FUSED_ATTENTION,
            dtype=self.dtype,
            name="attn",
        )
        if res_input is not None:
            out, _, pooled_res = attn(
                y, list(self.thw), deterministic=deterministic, res_input=res_input
            )
            return out, pooled_res
        out, _ = attn(y, list(self.thw), deterministic=deterministic)
        return out


class ReversibleBlock(nn.Module):
    """Y1 = X1 + F(X2); Y2 = X2 + G(Y1) (reference :412-592)."""

    dim: int
    dim_out: int
    input_size: Sequence[int]
    num_heads: int
    thw: Sequence[int]
    cfg: Any
    mlp_ratio: float
    droppath_rate: float
    kernel_q: Tuple[int, ...] = ()
    kernel_kv: Tuple[int, ...] = ()
    stride_q: Tuple[int, ...] = ()
    stride_kv: Tuple[int, ...] = ()
    dtype: Any = None

    @nn.compact
    def __call__(self, x1, x2, deterministic: bool = True):
        f_x2 = AttentionSubBlock(
            dim=self.dim,
            dim_out=self.dim_out,
            input_size=self.input_size,
            num_heads=self.num_heads,
            thw=self.thw,
            cfg=self.cfg,
            kernel_q=self.kernel_q,
            kernel_kv=self.kernel_kv,
            stride_q=self.stride_q,
            stride_kv=self.stride_kv,
            dtype=self.dtype,
            name="F",
        )(x2, deterministic=deterministic)
        if self.droppath_rate > 0.0 and not deterministic:
            f_x2 = drop_path(f_x2, self.droppath_rate, self.make_rng("dropout"))
        y1 = x1 + f_x2
        g_y1 = MLPSubblock(
            dim=self.dim_out, mlp_ratio=self.mlp_ratio, dtype=self.dtype, name="G"
        )(y1, deterministic=deterministic)
        if self.droppath_rate > 0.0 and not deterministic:
            g_y1 = drop_path(g_y1, self.droppath_rate, self.make_rng("dropout"))
        y2 = x2 + g_y1
        return y1, y2


def _zero_key_ct(k):
    """float0 cotangent for a (non-differentiable) RNG-key argument."""
    return np.zeros(np.shape(k), jax.dtypes.float0)


def _span_fns(specs, cfg, dtype, deterministic, needs_rng):
    """Pure-apply (F_fn, G_fn) pairs for each block of a reversible span.

    The subblock definitions are UNBOUND modules applied against the
    parameter subtrees the bound ``ReversibleBlock`` submodules created at
    init — same params, same math, but as pure functions the custom VJP
    can re-run during input reconstruction.
    """
    fns = []
    for spec in specs:
        F_def = AttentionSubBlock(
            dim=spec["dim"],
            dim_out=spec["dim_out"],
            input_size=spec["input_size"],
            num_heads=spec["num_heads"],
            thw=spec["thw"],
            cfg=cfg,
            kernel_q=spec["kernel_q"],
            kernel_kv=spec["kernel_kv"],
            stride_q=spec["stride_q"],
            stride_kv=spec["stride_kv"],
            dtype=dtype,
        )
        G_def = MLPSubblock(
            dim=spec["dim_out"], mlp_ratio=cfg.MVIT.MLP_RATIO, dtype=dtype
        )
        dp_rate = spec["droppath"]

        def make(F_def=F_def, G_def=G_def, dp_rate=dp_rate):
            def F_fn(p, x, key):
                rngs = (
                    {"dropout": jax.random.fold_in(key, 0)}
                    if needs_rng
                    else None
                )
                f = F_def.apply({"params": p}, x, deterministic, rngs=rngs)
                if dp_rate > 0.0 and not deterministic:
                    f = drop_path(f, dp_rate, jax.random.fold_in(key, 1))
                return f

            def G_fn(p, y, key):
                rngs = (
                    {"dropout": jax.random.fold_in(key, 0)}
                    if needs_rng
                    else None
                )
                g = G_def.apply({"params": p}, y, deterministic, rngs=rngs)
                if dp_rate > 0.0 and not deterministic:
                    g = drop_path(g, dp_rate, jax.random.fold_in(key, 1))
                return g

            return F_fn, G_fn

        fns.append(make())
    return fns


def _run_reversible_span(fns, params, keys, x1, x2):
    """True reversible backprop over one span of reversible blocks.

    TPU-native equivalent of the reference's RevBackProp autograd Function
    (reversible_mvit.py:177-263): the forward saves ONLY the span outputs
    (plus params/keys); the backward walks the span in reverse, inverting
    each block's two residual updates to reconstruct its inputs and
    re-linearizing F and G there for the gradients. Residual activation
    memory is therefore O(1) in span depth — per-block remat would store
    both stream boundaries for every block, O(depth).

    ``params`` is a tuple of ``{"F": ..., "G": ...}`` subtrees and
    ``keys`` a tuple of per-block RNG keys (key k folds to the F / G
    dropout+droppath streams inside the block functions, so forward and
    reconstruction replay identical noise).
    """

    def fwd_only(params, keys, x1, x2):
        for (F_fn, G_fn), p, k in zip(fns, params, keys):
            y1 = x1 + F_fn(p["F"], x2, jax.random.fold_in(k, 0))
            y2 = x2 + G_fn(p["G"], y1, jax.random.fold_in(k, 1))
            x1, x2 = y1, y2
        return x1, x2

    span = jax.custom_vjp(fwd_only)

    def fwd(params, keys, x1, x2):
        y1, y2 = fwd_only(params, keys, x1, x2)
        return (y1, y2), (params, keys, y1, y2)

    def bwd(res, cts):
        params, keys, y1, y2 = res
        dy1, dy2 = cts
        dparams = []
        for (F_fn, G_fn), p, k in zip(
            reversed(fns), reversed(params), reversed(keys)
        ):
            kf = jax.random.fold_in(k, 0)
            kg = jax.random.fold_in(k, 1)
            # Invert y2 = x2 + G(y1), collecting G's VJP at y1.
            g, G_vjp = jax.vjp(
                lambda pG, y, _G=G_fn, _kg=kg: _G(pG, y, _kg), p["G"], y1
            )
            x2 = y2 - g
            dpG, dg = G_vjp(dy2)
            dy1 = dy1 + dg
            # Invert y1 = x1 + F(x2), collecting F's VJP at x2.
            f, F_vjp = jax.vjp(
                lambda pF, x, _F=F_fn, _kf=kf: _F(pF, x, _kf), p["F"], x2
            )
            x1 = y1 - f
            dpF, df = F_vjp(dy1)
            dy2 = dy2 + df
            dparams.append({"F": dpF, "G": dpG})
            y1, y2 = x1, x2
        dkeys = tuple(jax.tree.map(_zero_key_ct, k) for k in keys)
        return tuple(reversed(dparams)), dkeys, dy1, dy2

    span.defvjp(fwd, bwd)
    return span(params, keys, x1, x2)


class StageTransitionBlock(nn.Module):
    """Non-reversible Q-pooling block between reversible spans
    (reference :266-411)."""

    dim: int
    dim_out: int
    input_size: Sequence[int]
    num_heads: int
    thw: Sequence[int]
    cfg: Any
    mlp_ratio: float
    droppath_rate: float
    pre_q_fusion: str
    kernel_q: Tuple[int, ...] = ()
    kernel_kv: Tuple[int, ...] = ()
    stride_q: Tuple[int, ...] = ()
    stride_kv: Tuple[int, ...] = ()
    dtype: Any = None

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        cfg = self.cfg
        x = TwoStreamFusion(mode=self.pre_q_fusion, dim=self.dim, name="pre_q_fuse")(
            x, deterministic=deterministic
        )
        x_res = x
        is_proj = self.dim != self.dim_out
        pool_first = cfg.MVIT.POOL_FIRST
        if is_proj and not pool_first:
            x_res = nn.Dense(
                self.dim_out, kernel_init=trunc02, bias_init=bias02,
                dtype=self.dtype, name="res_proj",
            )(x_res)

        F = AttentionSubBlock(
            dim=self.dim,
            dim_out=self.dim_out,
            input_size=self.input_size,
            num_heads=self.num_heads,
            thw=self.thw,
            cfg=self.cfg,
            kernel_q=self.kernel_q,
            kernel_kv=self.kernel_kv,
            stride_q=self.stride_q,
            stride_kv=self.stride_kv,
            dtype=self.dtype,
            name="F",
        )
        if cfg.MVIT.REV.RES_PATH == "conv":
            f_x, x_res = F(x, deterministic=deterministic, res_input=x_res)
        else:  # "max"
            from .attention import _pool_tokens

            f_x = F(x, deterministic=deterministic)
            kernel_skip = tuple(s + 1 if s > 1 else s for s in self.stride_q)
            r = x_res[:, None]
            r, _ = _pool_tokens(
                r, list(self.thw), kernel_skip, self.stride_q, "max",
                cfg.MVIT.CLS_EMBED_ON,
            )
            x_res = r[:, 0]
        if is_proj and pool_first:
            x_res = nn.Dense(
                self.dim_out, kernel_init=trunc02, bias_init=bias02,
                dtype=self.dtype, name="res_proj",
            )(x_res)

        x = x_res + f_x
        x = x + MLPSubblock(
            dim=self.dim_out, mlp_ratio=self.mlp_ratio, dtype=self.dtype, name="G"
        )(x, deterministic=deterministic)
        if self.droppath_rate > 0.0 and not deterministic:
            x = drop_path(x, self.droppath_rate, self.make_rng("dropout"))
        return x


class ReversibleMViT(nn.Module):
    """Reversible encoder (reference reversible_mvit.py:12-176).

    Output is the two-stream concat (2*C channels), fused by the caller.
    """

    cfg: Any

    @nn.compact
    def __call__(self, x, thw, deterministic: bool = True):
        cfg = self.cfg
        from .video_models import round_width

        depth = cfg.MVIT.DEPTH
        embed_dim = cfg.MVIT.EMBED_DIM
        num_heads = cfg.MVIT.NUM_HEADS
        dpr = np.linspace(0, cfg.MVIT.DROPPATH_RATE, depth)

        dim_mul = np.ones(depth + 1)
        head_mul = np.ones(depth + 1)
        for idx, mul in cfg.MVIT.DIM_MUL:
            dim_mul[idx] = mul
        for idx, mul in cfg.MVIT.HEAD_MUL:
            head_mul[idx] = mul

        # Pool schedules (same computation as the standard MViT).
        from .mvit import mvit_block_schedule

        sched = mvit_block_schedule(cfg)

        input_size = list(thw)
        cur_thw = list(thw)
        layers = []
        for i in range(depth):
            num_heads = round_width(num_heads, head_mul[i])
            # Rev dim schedule: up-projection inside the Q-pooling block
            # (reference :61-68).
            embed_dim = round_width(
                embed_dim, dim_mul[i - 1] if i > 0 else 1.0, divisor=num_heads
            )
            dim_out = round_width(
                embed_dim, dim_mul[i], divisor=round_width(num_heads, head_mul[i + 1])
            )
            is_transition = i in cfg.MVIT.REV.BUFFER_LAYERS
            input_mult = 2 if (is_transition and "concat" in cfg.MVIT.REV.PRE_Q_FUSION) else 1
            dimout_corr = 2 if input_mult == 2 else 1
            layers.append(
                dict(
                    transition=is_transition,
                    dim=embed_dim * input_mult,
                    dim_out=dim_out * input_mult // dimout_corr,
                    num_heads=num_heads,
                    kernel_q=sched[i]["kernel_q"],
                    kernel_kv=sched[i]["kernel_kv"],
                    stride_q=sched[i]["stride_q"],
                    stride_kv=sched[i]["stride_kv"],
                    droppath=float(dpr[i]),
                    input_size=tuple(input_size),
                    thw=tuple(cur_thw),
                )
            )
            if sched[i]["stride_q"]:
                # Pool output size is ceil(s/st) with pad k//2 (see mvit.py).
                input_size = [
                    (s - 1) // st + 1
                    for s, st in zip(input_size, sched[i]["stride_q"])
                ]
                cur_thw = [
                    (s - 1) // st + 1
                    for s, st in zip(cur_thw, sched[i]["stride_q"])
                ]

        # Execute: reversible spans (custom O(1)-memory VJP, or per-block
        # remat during init / as the REV_BACKPROP=False fallback) with
        # non-reversible transitions in between.
        dtype = compute_dtype(cfg)
        use_custom = cfg.TPU.REV_BACKPROP and not self.is_initializing()
        needs_rng = (not deterministic) and (
            cfg.MVIT.DROPOUT_RATE > 0.0
            or any(
                l["droppath"] > 0.0 for l in layers if not l["transition"]
            )
        )

        def run_span(x1, x2, pending):
            if use_custom:
                fns = _span_fns(
                    [s for _, s in pending], cfg, dtype, deterministic,
                    needs_rng,
                )
                params = tuple(
                    self.variables["params"][f"layers_{j}"]
                    for j, _ in pending
                )
                if needs_rng:
                    base = self.make_rng("dropout")
                    keys = tuple(
                        jax.random.fold_in(base, j) for j, _ in pending
                    )
                else:
                    keys = tuple(
                        jnp.zeros((2,), jnp.uint32) for _ in pending
                    )
                return _run_reversible_span(fns, params, keys, x1, x2)
            for j, spec in pending:
                block_cls = nn.remat(ReversibleBlock, static_argnums=(3,))
                x1, x2 = block_cls(
                    dim=spec["dim"],
                    dim_out=spec["dim_out"],
                    input_size=spec["input_size"],
                    num_heads=spec["num_heads"],
                    thw=spec["thw"],
                    cfg=cfg,
                    mlp_ratio=cfg.MVIT.MLP_RATIO,
                    droppath_rate=spec["droppath"],
                    kernel_q=spec["kernel_q"],
                    kernel_kv=spec["kernel_kv"],
                    stride_q=spec["stride_q"],
                    stride_kv=spec["stride_kv"],
                    dtype=dtype,
                    name=f"layers_{j}",
                )(x1, x2, deterministic)
            return x1, x2

        x1 = x2 = None
        two_stream = False
        pending = []
        for i, spec in enumerate(layers):
            if spec["transition"]:
                if two_stream:
                    if pending:
                        x1, x2 = run_span(x1, x2, pending)
                        pending = []
                    x = jnp.concatenate([x1, x2], axis=-1)
                    two_stream = False
                x = StageTransitionBlock(
                    dim=spec["dim"],
                    dim_out=spec["dim_out"],
                    input_size=spec["input_size"],
                    num_heads=spec["num_heads"],
                    thw=spec["thw"],
                    cfg=cfg,
                    mlp_ratio=cfg.MVIT.MLP_RATIO,
                    droppath_rate=spec["droppath"],
                    pre_q_fusion=cfg.MVIT.REV.PRE_Q_FUSION,
                    kernel_q=spec["kernel_q"],
                    kernel_kv=spec["kernel_kv"],
                    stride_q=spec["stride_q"],
                    stride_kv=spec["stride_kv"],
                    dtype=compute_dtype(cfg),
                    name=f"layers_{i}",
                )(x, deterministic=deterministic)
            else:
                if not two_stream:
                    x1, x2 = x, x
                    two_stream = True
                pending.append((i, spec))

        if two_stream:
            if pending:
                x1, x2 = run_span(x1, x2, pending)
            x = jnp.concatenate([x1, x2], axis=-1)
        if cfg.MVIT.DROPOUT_RATE > 0.0:
            x = nn.Dropout(cfg.MVIT.DROPOUT_RATE)(x, deterministic=deterministic)
        return x


def compute_dtype(cfg):
    import jax.numpy as jnp

    return jnp.bfloat16 if cfg.TPU.COMPUTE_DTYPE == "bfloat16" else jnp.float32
