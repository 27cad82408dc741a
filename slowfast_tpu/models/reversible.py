"""Reversible MViT backbone (reference slowfast/models/reversible_mvit.py).

Two-stream reversible blocks: Y1 = X1 + F(X2), Y2 = X2 + G(Y1), with
F = pre-LN pooling attention and G = pre-LN MLP; StageTransitionBlocks
(non-reversible) at Q-pooling boundaries fuse the streams, pool the
residual with the shared Q-pool conv, and re-expand.

The reference implements a custom autograd Function (RevBackProp,
:177-263) that reconstructs activations in the backward pass. The
TPU-native equivalent is ``jax.checkpoint`` (remat) on each reversible
block: identical numerics and the same O(1)-per-block activation memory —
XLA rematerializes F and G inside the backward instead of storing them.
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

        # Execute: reversible spans with remat, transitions in between.
        i = 0
        x1 = x2 = None
        two_stream = False
        for i, spec in enumerate(layers):
            if spec["transition"]:
                if two_stream:
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
                # remat = the reference's RevBackProp activation
                # reconstruction: F/G are recomputed in the backward pass
                # instead of stored.
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
                    dtype=compute_dtype(cfg),
                    name=f"layers_{i}",
                )(x1, x2, deterministic)

        if two_stream:
            x = jnp.concatenate([x1, x2], axis=-1)
        if cfg.MVIT.DROPOUT_RATE > 0.0:
            x = nn.Dropout(cfg.MVIT.DROPOUT_RATE)(x, deterministic=deterministic)
        return x


def compute_dtype(cfg):
    import jax.numpy as jnp

    return jnp.bfloat16 if cfg.TPU.COMPUTE_DTYPE == "bfloat16" else jnp.float32
