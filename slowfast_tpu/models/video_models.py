"""Video model builders: SlowFast, ResNet (C2D/I3D/Slow), X3D.

Reference: slowfast/models/video_model_builder.py:36-802. All models take a
list of NTHWC pathway tensors and return logits (train) or activated,
view-averaged predictions (eval) per the head contract.
"""

import math
from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from .batchnorm import norm_builder
from .common import conv3d, max_pool3d
from .heads import ResNetBasicHead, ResNetRoIHead, X3DHead
from .resnet import ResStage
from .stem import VideoModelStem

# Stage depths per ResNet depth (reference video_model_builder.py:37).
MODEL_STAGE_DEPTH = {18: (2, 2, 2, 2), 50: (3, 4, 6, 3), 101: (3, 4, 23, 3)}

# Per-arch temporal kernel basis for [stem, res2..res5]
# (reference video_model_builder.py:41-98).
TEMPORAL_KERNEL_BASIS = {
    "2d": [[[1]], [[1]], [[1]], [[1]], [[1]]],
    "c2d": [[[1]], [[1]], [[1]], [[1]], [[1]]],
    "slow_c2d": [[[1]], [[1]], [[1]], [[1]], [[1]]],
    "i3d": [[[5]], [[3]], [[3, 1]], [[3, 1]], [[1, 3]]],
    "slow_i3d": [[[5]], [[3]], [[3, 1]], [[3, 1]], [[1, 3]]],
    "slow": [[[1]], [[1]], [[1]], [[3]], [[3]]],
    "slowfast": [[[1], [5]], [[1], [3]], [[1], [3]], [[3], [3]], [[3], [3]]],
    "x3d": [[[5]], [[3]], [[3]], [[3]], [[3]]],
    "csn": [[[3]], [[3]], [[3]], [[3]], [[3]]],
    "r2plus1d": [[[1]], [[1]], [[1]], [[1]], [[1]]],
}

# Post-res2 temporal pooling per arch (reference video_model_builder.py:100-109).
POOL1 = {
    "2d": [[1, 1, 1]],
    "c2d": [[2, 1, 1]],
    "slow_c2d": [[1, 1, 1]],
    "i3d": [[2, 1, 1]],
    "slow_i3d": [[1, 1, 1]],
    "slow": [[1, 1, 1]],
    "slowfast": [[1, 1, 1], [1, 1, 1]],
    "x3d": [[1, 1, 1]],
    "csn": [[1, 1, 1]],
    "r2plus1d": [[1, 1, 1]],
}


def round_width(width, multiplier, min_width=1, divisor=1):
    """X3D width rounding (reference slowfast/models/utils.py:10-25)."""
    if not multiplier:
        return width
    width *= multiplier
    min_width = min_width or divisor
    width_out = max(min_width, int(width + divisor / 2) // divisor * divisor)
    if width_out < 0.9 * width:
        width_out += divisor
    return int(width_out)



def remat_policy(cfg):
    """Resolve ``TPU.REMAT_POLICY`` to a jax.checkpoint policy fn.

    "nothing_saveable" (the default) recomputes every intermediate in the
    backward pass; any other ``jax.checkpoint_policies`` name (e.g.
    "dots_saveable" to keep matmul outputs) trades memory back for FLOPs.
    """
    name = cfg.TPU.REMAT_POLICY
    if not name:
        return None
    return getattr(jax.checkpoint_policies, name)

def compute_dtype(cfg):
    return jnp.bfloat16 if cfg.TPU.COMPUTE_DTYPE == "bfloat16" else jnp.float32


class FuseFastToSlow(nn.Module):
    """Time-strided conv on the fast pathway, concatenated onto slow.

    Reference: video_model_builder.py:112-169. ``folded_t`` > 0 means the
    fast pathway arrives T-folded (B, H, W, T*C) and the fuse conv runs as
    a block-Toeplitz 1x1 conv without leaving that layout.
    """

    dim_in: int  # fast-pathway channels
    fusion_conv_channel_ratio: int
    fusion_kernel: int
    alpha: int
    norm: Any
    folded_t: int = 0
    dtype: Any = None

    @nn.compact
    def __call__(self, xs, train: bool = False):
        from slowfast_tpu.ops.video_conv import unfold_time

        x_s, x_f = xs
        dim_fuse = self.dim_in * self.fusion_conv_channel_ratio
        if self.folded_t:
            from .common import FoldedConv3D

            fuse, t_out = FoldedConv3D(
                dim_fuse,
                (self.fusion_kernel, 1, 1),
                self.folded_t,
                (self.alpha, 1, 1),
                (self.fusion_kernel // 2, 0, 0),
                dtype=self.dtype,
                name="conv_f2s",
            )(x_f)
            fuse = self.norm(dim_fuse, name="bn", folded_t=t_out)(fuse, train=train)
            fuse = nn.relu(fuse)
            fuse = unfold_time(fuse, t_out)  # slow T == T/alpha
            return [jnp.concatenate([x_s, fuse], axis=-1), x_f]
        fuse = conv3d(
            dim_fuse,
            (self.fusion_kernel, 1, 1),
            (self.alpha, 1, 1),
            (self.fusion_kernel // 2, 0, 0),
            dtype=self.dtype,
            name="conv_f2s",
        )(x_f)
        fuse = self.norm(dim_fuse, name="bn")(fuse, train=train)
        fuse = nn.relu(fuse)
        return [jnp.concatenate([x_s, fuse], axis=-1), x_f]


class SlowFast(nn.Module):
    """Two-pathway SlowFast network (reference video_model_builder.py:172-441)."""

    cfg: Any

    @nn.compact
    def __call__(self, xs, bboxes=None, train: bool = False):
        cfg = self.cfg
        norm = norm_builder(cfg)
        dtype = compute_dtype(cfg)
        pool_size = POOL1[cfg.MODEL.ARCH]
        d2, d3, d4, d5 = MODEL_STAGE_DEPTH[cfg.RESNET.DEPTH]
        num_groups = cfg.RESNET.NUM_GROUPS
        w = cfg.RESNET.WIDTH_PER_GROUP
        dim_inner = num_groups * w
        beta_inv = cfg.SLOWFAST.BETA_INV
        out_dim_ratio = beta_inv // cfg.SLOWFAST.FUSION_CONV_CHANNEL_RATIO
        tk = TEMPORAL_KERNEL_BASIS[cfg.MODEL.ARCH]
        zero_bn = cfg.RESNET.ZERO_INIT_FINAL_BN

        trunc = cfg.TPU.TRUNCATE_AT
        remat_stages = set(cfg.TPU.REMAT_STAGES)
        stem_cls = (
            nn.remat(
                VideoModelStem, static_argnums=(2,), policy=remat_policy(cfg)
            )
            if "s1" in remat_stages
            else VideoModelStem
        )

        # Fast-pathway folded-layout residency: stages whose fast channels
        # are small run (and hand off) T-folded tensors; fuses consume them
        # without leaving the layout. See ops/video_conv.py.
        from slowfast_tpu.ops.video_conv import SMALL_C, unfold_time

        inners_plan = [dim_inner, dim_inner * 2, dim_inner * 4, dim_inner * 8]
        can_fold = (
            cfg.RESNET.TRANS_FUNC == "bottleneck_transform"
            and not cfg.MODEL.ACT_CHECKPOINT
            and "s1" not in remat_stages
        )
        fold_stage = [
            can_fold
            and inners_plan[i] // beta_inv < SMALL_C
            and not (
                cfg.NONLOCAL.LOCATION[i][-1]
                if len(cfg.NONLOCAL.LOCATION[i]) > 1
                else []
            )
            for i in range(4)
        ]
        fast_T = cfg.DATA.NUM_FRAMES if xs[1].ndim == 5 else 0
        stem_fold_fast = bool(can_fold and fold_stage[0])

        xs = [x.astype(dtype) for x in xs]
        xs = stem_cls(
            dim_out=[w, w // beta_inv],
            kernel=[tk[0][0] + [7, 7], tk[0][1] + [7, 7]],
            stride=[[1, 2, 2]] * 2,
            padding=[[tk[0][0][0] // 2, 3, 3], [tk[0][1][0] // 2, 3, 3]],
            norm=norm,
            keep_folded=(False, stem_fold_fast),
            dtype=dtype,
            name="s1",
        )(xs, train)
        fast_ft = fast_T if stem_fold_fast else 0
        xs = FuseFastToSlow(
            w // beta_inv,
            cfg.SLOWFAST.FUSION_CONV_CHANNEL_RATIO,
            cfg.SLOWFAST.FUSION_KERNEL_SZ,
            cfg.SLOWFAST.ALPHA,
            norm=norm,
            folded_t=fast_ft,
            dtype=dtype,
            name="s1_fuse",
        )(xs, train=train)
        if trunc == "s1":
            if fast_ft:
                xs = [xs[0], unfold_time(xs[1], fast_ft)]
            return xs

        # Per-stage channel schedule (reference :246-367): slow input includes
        # the fused fast channels; fast channels are slow/beta_inv throughout.
        ins = [w, w * 4, w * 8, w * 16]
        outs = [w * 4, w * 8, w * 16, w * 32]
        inners = [dim_inner, dim_inner * 2, dim_inner * 4, dim_inner * 8]
        stage_dims = [
            dict(
                dim_in=[ins[i] + ins[i] // out_dim_ratio, ins[i] // beta_inv],
                dim_out=[outs[i], outs[i] // beta_inv],
                dim_inner=[inners[i], inners[i] // beta_inv],
            )
            for i in range(4)
        ]

        num_blocks = [d2, d3, d4, d5]
        for i in range(4):
            stage_cls = (
                nn.remat(
                    ResStage, static_argnums=(2,), policy=remat_policy(cfg)
                )
                if f"s{i + 2}" in remat_stages
                else ResStage
            )
            xs = stage_cls(
                in_folded_t=(0, fast_ft),
                out_folded=(False, bool(fold_stage[i])),
                dim_in=stage_dims[i]["dim_in"],
                dim_out=stage_dims[i]["dim_out"],
                dim_inner=stage_dims[i]["dim_inner"],
                temp_kernel_sizes=tk[i + 1],
                stride=[cfg.RESNET.SPATIAL_STRIDES[i][0]] * 2,
                num_blocks=[num_blocks[i]] * 2,
                num_groups=[num_groups] * 2,
                num_block_temp_kernel=(
                    cfg.RESNET.NUM_BLOCK_TEMP_KERNEL[i] * 2
                    if len(cfg.RESNET.NUM_BLOCK_TEMP_KERNEL[i]) == 1
                    else cfg.RESNET.NUM_BLOCK_TEMP_KERNEL[i]
                ),
                nonlocal_inds=(
                    cfg.NONLOCAL.LOCATION[i] * 2
                    if len(cfg.NONLOCAL.LOCATION[i]) == 1
                    else cfg.NONLOCAL.LOCATION[i]
                ),
                nonlocal_group=(
                    cfg.NONLOCAL.GROUP[i] * 2
                    if len(cfg.NONLOCAL.GROUP[i]) == 1
                    else cfg.NONLOCAL.GROUP[i]
                ),
                nonlocal_pool=cfg.NONLOCAL.POOL[i],
                instantiation=cfg.NONLOCAL.INSTANTIATION,
                trans_func_name=cfg.RESNET.TRANS_FUNC,
                norm=norm,
                stride_1x1=cfg.RESNET.STRIDE_1X1,
                dilation=[cfg.RESNET.SPATIAL_DILATIONS[i][0]] * 2,
                zero_init_final_bn=zero_bn,
                zero_init_final_conv=cfg.RESNET.ZERO_INIT_FINAL_CONV,
                drop_connect_rate=cfg.MODEL.DROPCONNECT_RATE,
                act_checkpoint=cfg.MODEL.ACT_CHECKPOINT,
                remat_policy=remat_policy(cfg),
                dtype=dtype,
                name=f"s{i + 2}",
            )(xs, train)
            fast_ft = fast_T if fold_stage[i] else 0
            if i < 3:
                xs = FuseFastToSlow(
                    stage_dims[i]["dim_out"][1],
                    cfg.SLOWFAST.FUSION_CONV_CHANNEL_RATIO,
                    cfg.SLOWFAST.FUSION_KERNEL_SZ,
                    cfg.SLOWFAST.ALPHA,
                    norm=norm,
                    folded_t=fast_ft,
                    dtype=dtype,
                    name=f"s{i + 2}_fuse",
                )(xs, train=train)
                # Unfold before the next stage if it won't run folded.
                if fast_ft and not fold_stage[i + 1]:
                    xs = [xs[0], unfold_time(xs[1], fast_ft)]
                    fast_ft = 0
            elif fast_ft:
                xs = [xs[0], unfold_time(xs[1], fast_ft)]
                fast_ft = 0
            if i == 0:
                # Post-res2 temporal pooling (identity for slowfast's [1,1,1]).
                assert not fast_ft or not any(
                    k > 1 for k in pool_size[1]
                ), "folded fast pathway assumes no post-res2 temporal pooling"
                xs = [
                    max_pool3d(x, pool_size[p], pool_size[p])
                    if any(k > 1 for k in pool_size[p]) and not (p == 1 and fast_ft)
                    else x
                    for p, x in enumerate(xs)
                ]
            if trunc == f"s{i + 2}":
                if fast_ft:
                    return [xs[0], unfold_time(xs[1], fast_ft)]
                return xs

        head_dim_in = [w * 32, w * 32 // beta_inv]
        if cfg.DETECTION.ENABLE:
            return ResNetRoIHead(
                fc_init_std=cfg.MODEL.FC_INIT_STD,
                dim_in=head_dim_in,
                num_classes=cfg.MODEL.NUM_CLASSES,
                pool_size=[
                    [cfg.DATA.NUM_FRAMES // cfg.SLOWFAST.ALPHA // pool_size[0][0], 1, 1],
                    [cfg.DATA.NUM_FRAMES // pool_size[1][0], 1, 1],
                ],
                resolution=[[cfg.DETECTION.ROI_XFORM_RESOLUTION] * 2] * 2,
                scale_factor=[cfg.DETECTION.SPATIAL_SCALE_FACTOR] * 2,
                dropout_rate=cfg.MODEL.DROPOUT_RATE,
                act_func=cfg.MODEL.HEAD_ACT,
                aligned=cfg.DETECTION.ALIGNED,
                detach_final_fc=cfg.MODEL.DETACH_FINAL_FC,
                dtype=dtype,
                name="head",
            )(xs, bboxes, train=train)
        pool = (
            None
            if cfg.MULTIGRID.SHORT_CYCLE
            or cfg.MODEL.MODEL_NAME == "ContrastiveModel"
            else [
                [
                    cfg.DATA.NUM_FRAMES // cfg.SLOWFAST.ALPHA // pool_size[0][0],
                    cfg.DATA.TRAIN_CROP_SIZE // 32 // pool_size[0][1],
                    cfg.DATA.TRAIN_CROP_SIZE // 32 // pool_size[0][2],
                ],
                [
                    cfg.DATA.NUM_FRAMES // pool_size[1][0],
                    cfg.DATA.TRAIN_CROP_SIZE // 32 // pool_size[1][1],
                    cfg.DATA.TRAIN_CROP_SIZE // 32 // pool_size[1][2],
                ],
            ]
        )
        return ResNetBasicHead(
            fc_init_std=cfg.MODEL.FC_INIT_STD,
            dim_in=head_dim_in,
            num_classes=cfg.MODEL.NUM_CLASSES,
            pool_size=pool,
            dropout_rate=cfg.MODEL.DROPOUT_RATE,
            act_func=cfg.MODEL.HEAD_ACT,
            detach_final_fc=cfg.MODEL.DETACH_FINAL_FC,
            mlp_layers=cfg.CONTRASTIVE.NUM_MLP_LAYERS,
            mlp_dim=cfg.CONTRASTIVE.MLP_DIM,
            bn_mlp=cfg.CONTRASTIVE.BN_MLP or cfg.CONTRASTIVE.BN_SYNC_MLP,
            dtype=dtype,
            name="head",
        )(xs, train=train)


class ResNet(nn.Module):
    """Single-pathway C2D/I3D/Slow ResNet (reference :444-660)."""

    cfg: Any

    @nn.compact
    def __call__(self, xs, bboxes=None, train: bool = False):
        cfg = self.cfg
        norm = norm_builder(cfg)
        dtype = compute_dtype(cfg)
        pool_size = POOL1[cfg.MODEL.ARCH]
        if cfg.MODEL.MODEL_NAME == "ResNet_nopool":
            # Zoo C2D variant: no temporal pool1; the head pools the full
            # temporal extent instead (NUM_FRAMES // 1).
            pool_size = [[1, 1, 1]]
        d2, d3, d4, d5 = MODEL_STAGE_DEPTH[cfg.RESNET.DEPTH]
        num_groups = cfg.RESNET.NUM_GROUPS
        w = cfg.RESNET.WIDTH_PER_GROUP
        dim_inner = num_groups * w
        tk = TEMPORAL_KERNEL_BASIS[cfg.MODEL.ARCH]
        zero_bn = cfg.RESNET.ZERO_INIT_FINAL_BN

        xs = [x.astype(dtype) for x in xs]
        xs = VideoModelStem(
            dim_out=[w],
            kernel=[tk[0][0] + [7, 7]],
            stride=[[1, 2, 2]],
            padding=[[tk[0][0][0] // 2, 3, 3]],
            norm=norm,
            dtype=dtype,
            name="s1",
        )(xs, train=train)

        dims = [
            (w, w * 4, dim_inner),
            (w * 4, w * 8, dim_inner * 2),
            (w * 8, w * 16, dim_inner * 4),
            (w * 16, w * 32, dim_inner * 8),
        ]
        num_blocks = [d2, d3, d4, d5]
        for i in range(4):
            xs = ResStage(
                dim_in=[dims[i][0]],
                dim_out=[dims[i][1]],
                dim_inner=[dims[i][2]],
                temp_kernel_sizes=tk[i + 1],
                stride=cfg.RESNET.SPATIAL_STRIDES[i],
                num_blocks=[num_blocks[i]],
                num_groups=[num_groups],
                num_block_temp_kernel=cfg.RESNET.NUM_BLOCK_TEMP_KERNEL[i],
                nonlocal_inds=cfg.NONLOCAL.LOCATION[i],
                nonlocal_group=cfg.NONLOCAL.GROUP[i],
                nonlocal_pool=cfg.NONLOCAL.POOL[i],
                instantiation=cfg.NONLOCAL.INSTANTIATION,
                trans_func_name=cfg.RESNET.TRANS_FUNC,
                norm=norm,
                stride_1x1=cfg.RESNET.STRIDE_1X1,
                dilation=cfg.RESNET.SPATIAL_DILATIONS[i],
                zero_init_final_bn=zero_bn,
                zero_init_final_conv=cfg.RESNET.ZERO_INIT_FINAL_CONV,
                drop_connect_rate=cfg.MODEL.DROPCONNECT_RATE,
                act_checkpoint=cfg.MODEL.ACT_CHECKPOINT,
                remat_policy=remat_policy(cfg),
                dtype=dtype,
                name=f"s{i + 2}",
            )(xs, train=train)
            if i == 0 and any(k > 1 for k in pool_size[0]):
                xs = [max_pool3d(xs[0], pool_size[0], pool_size[0])]

        if cfg.DETECTION.ENABLE:
            return ResNetRoIHead(
                fc_init_std=cfg.MODEL.FC_INIT_STD,
                dim_in=[w * 32],
                num_classes=cfg.MODEL.NUM_CLASSES,
                pool_size=[[cfg.DATA.NUM_FRAMES // pool_size[0][0], 1, 1]],
                resolution=[[cfg.DETECTION.ROI_XFORM_RESOLUTION] * 2],
                scale_factor=[cfg.DETECTION.SPATIAL_SCALE_FACTOR],
                dropout_rate=cfg.MODEL.DROPOUT_RATE,
                act_func=cfg.MODEL.HEAD_ACT,
                aligned=cfg.DETECTION.ALIGNED,
                detach_final_fc=cfg.MODEL.DETACH_FINAL_FC,
                dtype=dtype,
                name="head",
            )(xs, bboxes, train=train)
        pool = (
            None
            if cfg.MULTIGRID.SHORT_CYCLE
            or cfg.MODEL.MODEL_NAME == "ContrastiveModel"
            else [
                [
                    cfg.DATA.NUM_FRAMES // pool_size[0][0],
                    cfg.DATA.TRAIN_CROP_SIZE // 32 // pool_size[0][1],
                    cfg.DATA.TRAIN_CROP_SIZE // 32 // pool_size[0][2],
                ]
            ]
        )
        return ResNetBasicHead(
            fc_init_std=cfg.MODEL.FC_INIT_STD,
            dim_in=[w * 32],
            num_classes=cfg.MODEL.NUM_CLASSES,
            pool_size=pool,
            dropout_rate=cfg.MODEL.DROPOUT_RATE,
            act_func=cfg.MODEL.HEAD_ACT,
            detach_final_fc=cfg.MODEL.DETACH_FINAL_FC,
            mlp_layers=cfg.CONTRASTIVE.NUM_MLP_LAYERS,
            mlp_dim=cfg.CONTRASTIVE.MLP_DIM,
            bn_mlp=cfg.CONTRASTIVE.BN_MLP or cfg.CONTRASTIVE.BN_SYNC_MLP,
            dtype=dtype,
            name="head",
        )(xs, train=train)


class X3D(nn.Module):
    """X3D network (reference :663-802)."""

    cfg: Any

    @nn.compact
    def __call__(self, xs, bboxes=None, train: bool = False):
        cfg = self.cfg
        norm = norm_builder(cfg)
        dtype = compute_dtype(cfg)
        tk = TEMPORAL_KERNEL_BASIS[cfg.MODEL.ARCH]
        zero_bn = cfg.RESNET.ZERO_INIT_FINAL_BN

        exp_stage = 2.0
        dim_c1 = cfg.X3D.DIM_C1
        dim_res2 = (
            round_width(dim_c1, exp_stage, divisor=8) if cfg.X3D.SCALE_RES2 else dim_c1
        )
        dim_res3 = round_width(dim_res2, exp_stage, divisor=8)
        dim_res4 = round_width(dim_res3, exp_stage, divisor=8)
        dim_res5 = round_width(dim_res4, exp_stage, divisor=8)
        block_basis = [
            [1, dim_res2, 2],
            [2, dim_res3, 2],
            [5, dim_res4, 2],
            [3, dim_res5, 2],
        ]
        w_mul = cfg.X3D.WIDTH_FACTOR
        d_mul = cfg.X3D.DEPTH_FACTOR
        dim_res1 = round_width(dim_c1, w_mul)

        xs = [x.astype(dtype) for x in xs]
        xs = VideoModelStem(
            dim_out=[dim_res1],
            kernel=[tk[0][0] + [3, 3]],
            stride=[[1, 2, 2]],
            padding=[[tk[0][0][0] // 2, 1, 1]],
            norm=norm,
            stem_func_name="x3d_stem",
            dtype=dtype,
            name="s1",
        )(xs, train=train)

        dim_in = dim_res1
        dim_out = dim_in
        dim_inner = dim_in
        for stage, block in enumerate(block_basis):
            dim_out = round_width(block[1], w_mul)
            dim_inner = int(cfg.X3D.BOTTLENECK_FACTOR * dim_out)
            n_rep = int(math.ceil(d_mul * block[0])) if d_mul else block[0]
            xs = ResStage(
                dim_in=[dim_in],
                dim_out=[dim_out],
                dim_inner=[dim_inner],
                temp_kernel_sizes=tk[1],
                stride=[block[2]],
                num_blocks=[n_rep],
                num_groups=[dim_inner] if cfg.X3D.CHANNELWISE_3x3x3 else [
                    cfg.RESNET.NUM_GROUPS
                ],
                num_block_temp_kernel=[n_rep],
                nonlocal_inds=cfg.NONLOCAL.LOCATION[0],
                nonlocal_group=cfg.NONLOCAL.GROUP[0],
                nonlocal_pool=cfg.NONLOCAL.POOL[0],
                instantiation=cfg.NONLOCAL.INSTANTIATION,
                trans_func_name=cfg.RESNET.TRANS_FUNC,
                norm=norm,
                stride_1x1=cfg.RESNET.STRIDE_1X1,
                dilation=cfg.RESNET.SPATIAL_DILATIONS[stage],
                zero_init_final_bn=zero_bn,
                zero_init_final_conv=cfg.RESNET.ZERO_INIT_FINAL_CONV,
                drop_connect_rate=cfg.MODEL.DROPCONNECT_RATE
                * (stage + 2)
                / (len(block_basis) + 1),
                act_checkpoint=cfg.MODEL.ACT_CHECKPOINT,
                remat_policy=remat_policy(cfg),
                dtype=dtype,
                name=f"s{stage + 2}",
            )(xs, train=train)
            dim_in = dim_out

        spat_sz = int(math.ceil(cfg.DATA.TRAIN_CROP_SIZE / 32.0))
        return X3DHead(
            fc_init_std=cfg.MODEL.FC_INIT_STD,
            dim_in=dim_out,
            dim_inner=dim_inner,
            dim_out=cfg.X3D.DIM_C5,
            num_classes=cfg.MODEL.NUM_CLASSES,
            pool_size=[cfg.DATA.NUM_FRAMES, spat_sz, spat_sz],
            norm=norm,
            dropout_rate=cfg.MODEL.DROPOUT_RATE,
            act_func=cfg.MODEL.HEAD_ACT,
            bn_lin5_on=cfg.X3D.BN_LIN5,
            dtype=dtype,
            name="head",
        )(xs, train=train)
