"""MViT v1/v2 model (reference slowfast/models/video_model_builder.py:805-1244).

TPU-native implementation: PatchEmbed conv stem, per-block pooled attention
with decomposed rel-pos, residual pooling, optional cls token, abs/separated
pos-embeds with trace-time trilinear re-interpolation, detection RoI mode.
"""

import math
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from slowfast_tpu.ops.pallas_attention import use_pallas
from .attention import MultiScaleBlock, bias02, trunc02
from .heads import ResNetRoIHead, TransformerBasicHead
from .stem import PatchEmbed
from .video_models import compute_dtype, round_width


def mvit_block_schedule(cfg):
    """Compute per-block (dim, dim_out, heads, pool/stride schedules).

    Mirrors reference video_model_builder.py:915-999, including the
    POOL_KV_STRIDE_ADAPTIVE auto-schedule — computed here without mutating
    the config.
    """
    depth = cfg.MVIT.DEPTH
    embed_dim = cfg.MVIT.EMBED_DIM
    num_heads = cfg.MVIT.NUM_HEADS

    dim_mul = np.ones(depth + 1)
    head_mul = np.ones(depth + 1)
    for idx, mul in cfg.MVIT.DIM_MUL:
        dim_mul[idx] = mul
    for idx, mul in cfg.MVIT.HEAD_MUL:
        head_mul[idx] = mul

    pool_q = [[] for _ in range(depth)]
    pool_kv = [[] for _ in range(depth)]
    stride_q = [[] for _ in range(depth)]
    stride_kv = [[] for _ in range(depth)]
    for entry in cfg.MVIT.POOL_Q_STRIDE:
        i = entry[0]
        stride_q[i] = list(entry[1:])
        if cfg.MVIT.POOL_KVQ_KERNEL is not None:
            pool_q[i] = list(cfg.MVIT.POOL_KVQ_KERNEL)
        else:
            pool_q[i] = [s + 1 if s > 1 else s for s in entry[1:]]

    kv_entries = list(cfg.MVIT.POOL_KV_STRIDE)
    if cfg.MVIT.POOL_KV_STRIDE_ADAPTIVE is not None:
        _stride_kv = list(cfg.MVIT.POOL_KV_STRIDE_ADAPTIVE)
        kv_entries = []
        for i in range(depth):
            if len(stride_q[i]) > 0:
                _stride_kv = [
                    max(_stride_kv[d] // stride_q[i][d], 1)
                    for d in range(len(_stride_kv))
                ]
            kv_entries.append([i] + _stride_kv)
    for entry in kv_entries:
        i = entry[0]
        stride_kv[i] = list(entry[1:])
        if cfg.MVIT.POOL_KVQ_KERNEL is not None:
            pool_kv[i] = list(cfg.MVIT.POOL_KVQ_KERNEL)
        else:
            pool_kv[i] = [s + 1 if s > 1 else s for s in entry[1:]]

    blocks = []
    dim = embed_dim
    for i in range(depth):
        # num_heads accumulates across blocks (reference :984).
        num_heads = round_width(num_heads, head_mul[i])
        if cfg.MVIT.DIM_MUL_IN_ATT:
            dim_out = round_width(dim, dim_mul[i], divisor=num_heads)
        else:
            dim_out = round_width(
                dim,
                dim_mul[i + 1],
                divisor=round_width(num_heads, head_mul[i + 1]),
            )
        blocks.append(
            dict(
                dim=dim,
                dim_out=dim_out,
                num_heads=num_heads,
                kernel_q=tuple(pool_q[i]),
                kernel_kv=tuple(pool_kv[i]),
                stride_q=tuple(stride_q[i]),
                stride_kv=tuple(stride_kv[i]),
            )
        )
        dim = dim_out
    return blocks


def maskfeat_feature_size(cfg):
    """H (= W) of the deepest PRETRAIN_DEPTH feature grid. 2D MaskFeat
    masks are generated at this geometry (reference imagenet.py:175-183)."""
    depth = max(cfg.MASK.PRETRAIN_DEPTH)
    # Apply each stage's pooled-size formula ((size-1)//stride + 1) in
    # sequence: cumulative floor division diverges at odd intermediate
    # sizes (e.g. 14 -> 7 -> 4, not 14//4 = 3).
    size = cfg.DATA.TRAIN_CROP_SIZE // cfg.MVIT.PATCH_STRIDE[-2]
    for i, blk in enumerate(mvit_block_schedule(cfg)):
        if i > depth:
            break
        if blk["stride_q"]:
            size = (size - 1) // blk["stride_q"][1] + 1
    return size


def get_3d_sincos_pos_embed(embed_dim, grid_size, t_size, cls_token=False):
    """Fixed 3D sin-cos positional embedding (reference models/utils.py:55-100)."""
    assert embed_dim % 4 == 0
    embed_dim_spatial = embed_dim // 4 * 3
    embed_dim_temporal = embed_dim // 4

    def get_1d(dim, pos):
        omega = np.arange(dim // 2, dtype=np.float64) / (dim / 2.0)
        omega = 1.0 / 10000 ** omega
        out = np.einsum("m,d->md", pos.reshape(-1), omega)
        return np.concatenate([np.sin(out), np.cos(out)], axis=1)

    grid_h = np.arange(grid_size, dtype=np.float32)
    grid_w = np.arange(grid_size, dtype=np.float32)
    grid = np.meshgrid(grid_w, grid_h)  # w goes first
    grid = np.stack(grid, axis=0).reshape([2, 1, grid_size, grid_size])
    # NOTE: the reference feeds grid[0] (the W mesh — "w goes first") to the
    # first half and grid[1] (H) to the second (utils.py:119-122, its
    # emb_h/emb_w names are swapped relative to what they encode).
    emb_first = get_1d(embed_dim_spatial // 2, grid[0])
    emb_second = get_1d(embed_dim_spatial // 2, grid[1])
    pos_embed_spatial = np.concatenate([emb_first, emb_second], axis=1)

    pos_embed_temporal = get_1d(embed_dim_temporal, np.arange(t_size, dtype=np.float32))
    pos_embed_temporal = np.repeat(
        pos_embed_temporal[:, None, :], grid_size ** 2, axis=1
    )
    pos_embed_spatial = np.tile(pos_embed_spatial[None, :, :], (t_size, 1, 1))
    pos_embed = np.concatenate([pos_embed_temporal, pos_embed_spatial], axis=-1)
    pos_embed = pos_embed.reshape(-1, embed_dim)
    if cls_token:
        pos_embed = np.concatenate([np.zeros([1, embed_dim]), pos_embed], axis=0)
    return pos_embed.astype(np.float32)


class MViT(nn.Module):
    cfg: Any

    @nn.compact
    def __call__(
        self,
        xs,
        bboxes=None,
        train: bool = False,
        stage_lo: int = 0,
        stage_hi: int = None,
    ):
        """Forward pass; ``stage_lo``/``stage_hi`` select a pipeline stage.

        Default (0, None) runs the whole model. A pipeline stage runs
        blocks [stage_lo, stage_hi): stage_lo == 0 includes the patch
        stem / pos-embeds, stage_hi >= DEPTH includes the final norm and
        head; interior stages take ``xs = [tokens (B, N, C)]`` and return
        the token activation. Parameter names are identical to the full
        model's, so per-stage trees are disjoint slices of one checkpoint
        (parallel/pipeline.py splits/assembles them).
        """
        cfg = self.cfg
        dtype = compute_dtype(cfg)
        det = not train

        patch_2d = cfg.MVIT.PATCH_2D
        patch_stride = list(cfg.MVIT.PATCH_STRIDE)
        if patch_2d:
            patch_stride = [1] + patch_stride
        embed_dim = cfg.MVIT.EMBED_DIM
        cls_on = cfg.MVIT.CLS_EMBED_ON
        depth = cfg.MVIT.DEPTH
        T0 = cfg.DATA.NUM_FRAMES // patch_stride[0]
        H0 = cfg.DATA.TRAIN_CROP_SIZE // patch_stride[1]
        W0 = cfg.DATA.TRAIN_CROP_SIZE // patch_stride[2]
        patch_dims = [T0, H0, W0]
        num_patches = T0 * H0 * W0
        stage_hi = depth if stage_hi is None else stage_hi

        if stage_lo > 0:
            # Pipeline stage entry: xs[0] is the previous stage's (B, N, C)
            # token activation; the pooled-thw geometry for the skipped
            # blocks is replayed statically below.
            x = xs[0].astype(dtype)
            thw = list(patch_dims)
            B = x.shape[0]
        else:
            x = xs[0].astype(dtype)
            if patch_2d:
                # Fold T into batch for a 2D stem (image models).
                B0, T_in = x.shape[0], x.shape[1]
                x = x.reshape((B0 * T_in,) + x.shape[2:])
            x, shape = PatchEmbed(
                dim_out=embed_dim,
                kernel=cfg.MVIT.PATCH_KERNEL,
                stride=cfg.MVIT.PATCH_STRIDE,
                padding=cfg.MVIT.PATCH_PADDING,
                conv_2d=patch_2d,
                dtype=dtype,
                name="patch_embed",
            )(x)
            if patch_2d:
                x = x.reshape(B0, -1, embed_dim)
                thw = [T_in, shape[0], shape[1]]
            else:
                thw = list(shape)
            B, N, _ = x.shape

            s = 1 if cls_on else 0
            if cfg.MVIT.USE_FIXED_SINCOS_POS:
                sincos = jnp.asarray(
                    get_3d_sincos_pos_embed(embed_dim, H0, T0, cls_token=cls_on)
                )[None]
                x = x + sincos[:, s:, :].astype(x.dtype)
            if cls_on:
                cls_token = self.param(
                    "cls_token", trunc02, (1, 1, embed_dim), jnp.float32
                )
                cls_tokens = jnp.broadcast_to(
                    cls_token.astype(x.dtype), (B, 1, embed_dim)
                )
                if cfg.MVIT.USE_FIXED_SINCOS_POS:
                    cls_tokens = cls_tokens + sincos[:, :s, :].astype(x.dtype)
                x = jnp.concatenate([cls_tokens, x], axis=1)

            if cfg.MVIT.USE_ABS_POS:
                if cfg.MVIT.SEP_POS_EMBED:
                    pe_s = self.param(
                        "pos_embed_spatial", trunc02, (1, H0 * W0, embed_dim), jnp.float32
                    )
                    pe_t = self.param(
                        "pos_embed_temporal", trunc02, (1, T0, embed_dim), jnp.float32
                    )
                    pos = jnp.tile(pe_s, (1, T0, 1)) + jnp.repeat(pe_t, H0 * W0, axis=1)
                    if cls_on:
                        pe_c = self.param(
                            "pos_embed_class", trunc02, (1, 1, embed_dim), jnp.float32
                        )
                        pos = jnp.concatenate([pe_c, pos], axis=1)
                else:
                    pos = self.param(
                        "pos_embed",
                        trunc02,
                        (1, num_patches + s, embed_dim),
                        jnp.float32,
                    )
                    if cfg.MVIT.USE_FIXED_SINCOS_POS:
                        # Parameter exists for checkpoint compat; value is the
                        # fixed table (loaded at import; init uses sincos).
                        pos = sincos
                pos = self._maybe_interp_pos(pos, thw, patch_dims, s)
                x = x + pos.astype(x.dtype)

            if cfg.MVIT.DROPOUT_RATE > 0.0:
                x = nn.Dropout(cfg.MVIT.DROPOUT_RATE)(x, deterministic=not train)
            if cfg.MVIT.NORM_STEM:
                x = nn.LayerNorm(epsilon=1e-6, bias_init=bias02, name="norm_stem")(x)

        blocks = mvit_block_schedule(cfg)
        dpr = np.linspace(0, cfg.MVIT.DROPPATH_RATE, depth)
        input_size = list(patch_dims)
        # Replay the static pooled-size bookkeeping for blocks below this
        # pipeline stage (geometry only — no params are touched).
        for i in range(stage_lo):
            if blocks[i]["stride_q"]:
                thw = [
                    (size - 1) // stride + 1
                    for size, stride in zip(thw, blocks[i]["stride_q"])
                ]
                input_size = [
                    (size - 1) // stride + 1
                    for size, stride in zip(input_size, blocks[i]["stride_q"])
                ]

        if cfg.MVIT.REV.ENABLE:
            from .reversible import ReversibleMViT
            from .common import TwoStreamFusion

            assert not cls_on, "reversible MViT does not support a cls token"
            assert stage_lo == 0 and stage_hi >= depth, (
                "pipeline partitioning does not support Rev-MViT (its "
                "two-stream recompute already bounds activation memory)"
            )
            x = ReversibleMViT(cfg=cfg, name="rev_backbone")(
                x, thw, deterministic=not train
            )
            final_dim = blocks[-1]["dim_out"]
            fuse_mode = cfg.MVIT.REV.RESPATH_FUSE
            if cfg.MVIT.USE_MEAN_POOLING:
                x = TwoStreamFusion(mode=fuse_mode, dim=2 * final_dim, name="fuse")(
                    x, deterministic=not train
                )
                x = x.mean(1)
                norm_dim = 2 * final_dim if "concat" in fuse_mode else final_dim
                x = nn.LayerNorm(epsilon=1e-6, bias_init=bias02, name="norm")(x)
            else:
                x = nn.LayerNorm(epsilon=1e-6, bias_init=bias02, name="norm")(x)
                x = TwoStreamFusion(mode=fuse_mode, dim=2 * final_dim, name="fuse")(
                    x, deterministic=not train
                )
                x = x.mean(1)
            head_dim = 2 * final_dim if "concat" in fuse_mode else final_dim
            return TransformerBasicHead(
                dim_in=head_dim,
                num_classes=cfg.MODEL.NUM_CLASSES,
                dropout_rate=cfg.MODEL.DROPOUT_RATE,
                act_func=cfg.MODEL.HEAD_ACT,
                detach_final_fc=cfg.MODEL.DETACH_FINAL_FC,
                head_init_scale=cfg.MVIT.HEAD_INIT_SCALE,
                dtype=dtype,
                name="head",
            )(x, train=train)

        from .video_models import remat_policy

        block_cls = (
            nn.remat(
                MultiScaleBlock, static_argnums=(2, 3),
                policy=remat_policy(cfg),
            )
            if cfg.MODEL.ACT_CHECKPOINT
            else MultiScaleBlock
        )
        # Sequence partitioning: pin the token axis to the seq mesh axis
        # at every block boundary (no-op off a seq mesh). GSPMD keeps
        # LN/MLP/projections token-parallel and inserts the (small,
        # pooled) K/V all-gathers inside attention.
        from slowfast_tpu.parallel.mesh import constrain_tokens

        x = constrain_tokens(x)
        for i in range(stage_lo, stage_hi):
            blk = blocks[i]
            x, _thw_out = block_cls(
                dim=blk["dim"],
                dim_out=blk["dim_out"],
                num_heads=blk["num_heads"],
                input_size=tuple(input_size),
                mlp_ratio=cfg.MVIT.MLP_RATIO,
                qkv_bias=cfg.MVIT.QKV_BIAS,
                drop_rate=cfg.MVIT.DROPOUT_RATE,
                droppath_rate=float(dpr[i]),
                layer_scale_init_value=cfg.MVIT.LAYER_SCALE_INIT_VALUE,
                kernel_q=blk["kernel_q"],
                kernel_kv=blk["kernel_kv"],
                stride_q=blk["stride_q"],
                stride_kv=blk["stride_kv"],
                mode=cfg.MVIT.MODE,
                has_cls_embed=cls_on,
                pool_first=cfg.MVIT.POOL_FIRST,
                rel_pos_spatial=cfg.MVIT.REL_POS_SPATIAL,
                rel_pos_temporal=cfg.MVIT.REL_POS_TEMPORAL,
                rel_pos_zero_init=cfg.MVIT.REL_POS_ZERO_INIT,
                residual_pooling=cfg.MVIT.RESIDUAL_POOLING,
                dim_mul_in_att=cfg.MVIT.DIM_MUL_IN_ATT,
                separate_qkv=cfg.MVIT.SEPARATE_QKV,
                use_pallas_attention=use_pallas(cfg),
                fused_attention=cfg.TPU.FUSED_ATTENTION,
                dtype=dtype,
                name=f"blocks_{i}",
            )(x, tuple(thw), not train)
            x = constrain_tokens(x)
            # Track thw statically (remat boxes returned python ints).
            # Pooling with kernel k (odd or s+1) and pad k//2 yields
            # ceil(size/stride) = (size-1)//stride + 1, NOT size//stride —
            # they differ for odd sizes (e.g. 7 -> 4, not 3).
            if blk["stride_q"]:
                thw = [
                    (size - 1) // stride + 1
                    for size, stride in zip(thw, blk["stride_q"])
                ]
                input_size = [
                    (size - 1) // stride + 1
                    for size, stride in zip(input_size, blk["stride_q"])
                ]
        if stage_hi < depth:
            # Pipeline stage exit: hand the token activation to the next
            # stage (the final norm + head live in the last stage).
            return x
        final_dim = blocks[-1]["dim_out"]

        if cfg.DETECTION.ENABLE:
            # dtype: the RoI head gathers this full-size map directly (no
            # casting Dense in between) — avoid an fp32 promotion.
            x = nn.LayerNorm(
                epsilon=1e-6, bias_init=bias02, dtype=dtype, name="norm"
            )(x)
            if cls_on:
                x = x[:, 1:]
            x = x.reshape(B, thw[0], thw[1], thw[2], final_dim)
            return ResNetRoIHead(
                fc_init_std=cfg.MODEL.FC_INIT_STD,
                dim_in=[final_dim],
                num_classes=cfg.MODEL.NUM_CLASSES,
                pool_size=[[cfg.DATA.NUM_FRAMES // patch_stride[0], 1, 1]],
                resolution=[[cfg.DETECTION.ROI_XFORM_RESOLUTION] * 2],
                scale_factor=[cfg.DETECTION.SPATIAL_SCALE_FACTOR],
                dropout_rate=cfg.MODEL.DROPOUT_RATE,
                act_func=cfg.MODEL.HEAD_ACT,
                aligned=cfg.DETECTION.ALIGNED,
                dtype=dtype,
                name="head",
            )([x], bboxes, train=train)

        if cfg.MVIT.USE_MEAN_POOLING:
            if cls_on:
                x = x[:, 1:]
            x = x.mean(1)
            x = nn.LayerNorm(epsilon=1e-6, bias_init=bias02, name="norm")(x)
        elif cls_on:
            x = nn.LayerNorm(epsilon=1e-6, bias_init=bias02, name="norm")(x)
            x = x[:, 0]
        else:
            x = nn.LayerNorm(epsilon=1e-6, bias_init=bias02, name="norm")(x)
            x = x.mean(1)
        return TransformerBasicHead(
            dim_in=final_dim,
            num_classes=cfg.MODEL.NUM_CLASSES,
            dropout_rate=cfg.MODEL.DROPOUT_RATE,
            act_func=cfg.MODEL.HEAD_ACT,
            detach_final_fc=cfg.MODEL.DETACH_FINAL_FC,
            head_init_scale=cfg.MVIT.HEAD_INIT_SCALE,
            dtype=dtype,
            name="head",
        )(x, train=train)

    @staticmethod
    def _maybe_interp_pos(pos, thw, patch_dims, s):
        """Trilinearly re-interpolate the pos table when the input shape
        differs from the training grid (reference :1118-1141)."""
        n_expected = int(np.prod(patch_dims))
        n_actual = int(np.prod(thw))
        if n_actual == n_expected:
            return pos
        cls_pos = pos[:, :s] if s else None
        grid = pos[:, s:].reshape(
            1, patch_dims[0], patch_dims[1], patch_dims[2], -1
        )
        grid = jax.image.resize(
            grid,
            (1, thw[0], thw[1], thw[2], grid.shape[-1]),
            method="trilinear",
        )
        grid = grid.reshape(1, n_actual, -1)
        if s:
            grid = jnp.concatenate([cls_pos, grid], axis=1)
        return grid
