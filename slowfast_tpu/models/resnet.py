"""3D ResNet machinery: transforms, residual blocks, stages.

Reference: slowfast/models/resnet_helper.py:12-726. All modules operate on
NTHWC tensors; module names mirror the reference's (``a``/``a_bn``/...,
``branch1``/``branch2``, ``pathway{p}_res{i}``) so torch checkpoints map
mechanically.
"""

from typing import Any, Callable, Sequence

import jax.numpy as jnp
from flax import linen as nn

from .common import SE, FoldedConv3D, conv3d, drop_path
from .nonlocal_block import Nonlocal


class BasicTransform(nn.Module):
    """Tx3x3 -> BN -> ReLU -> 1x3x3 -> BN (reference resnet_helper.py:27-115)."""

    dim_out: int
    temp_kernel_size: int
    stride: int
    norm: Callable
    dilation: int = 1
    zero_init_final_bn: bool = False
    zero_init_final_conv: bool = False
    dtype: Any = None
    # Unused, kept for a uniform transform signature:
    dim_inner: int = 0
    num_groups: int = 1
    stride_1x1: bool = False
    block_idx: int = 0

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = conv3d(
            self.dim_out,
            (self.temp_kernel_size, 3, 3),
            (1, self.stride, self.stride),
            (self.temp_kernel_size // 2, 1, 1),
            dtype=self.dtype,
            name="a",
        )(x)
        x = self.norm(self.dim_out, name="a_bn")(x, train=train)
        x = nn.relu(x)
        x = conv3d(
            self.dim_out,
            (1, 3, 3),
            (1, 1, 1),
            (0, self.dilation, self.dilation),
            dilation=(1, self.dilation, self.dilation),
            dtype=self.dtype,
            kernel_init=(
                nn.initializers.zeros if self.zero_init_final_conv else None
            ),
            name="b",
        )(x)
        x = self.norm(
            self.dim_out, zero_init_gamma=self.zero_init_final_bn, name="b_bn"
        )(x, train=train)
        return x


class BottleneckTransform(nn.Module):
    """Tx1x1 -> 1x3x3 -> 1x1x1 bottleneck (reference resnet_helper.py:259-392)."""

    dim_out: int
    temp_kernel_size: int
    stride: int
    dim_inner: int
    num_groups: int
    norm: Callable
    stride_1x1: bool = False
    dilation: int = 1
    zero_init_final_bn: bool = False
    zero_init_final_conv: bool = False
    folded_t: int = 0  # >0: input is (B, H, W, T*C) folded
    dtype: Any = None
    block_idx: int = 0

    @nn.compact
    def __call__(self, x, train: bool = False):
        str1x1, str3x3 = (self.stride, 1) if self.stride_1x1 else (1, self.stride)

        if self.folded_t:
            T = self.folded_t
            x, _ = FoldedConv3D(
                self.dim_inner,
                (self.temp_kernel_size, 1, 1),
                T,
                (1, str1x1, str1x1),
                (self.temp_kernel_size // 2, 0, 0),
                dtype=self.dtype,
                name="a",
            )(x)
            x = self.norm(self.dim_inner, name="a_bn", folded_t=T)(x, train=train)
            x = nn.relu(x)
            x, _ = FoldedConv3D(
                self.dim_inner,
                (1, 3, 3),
                T,
                (1, str3x3, str3x3),
                (0, self.dilation, self.dilation),
                dtype=self.dtype,
                name="b",
            )(x)
            x = self.norm(self.dim_inner, name="b_bn", folded_t=T)(x, train=train)
            x = nn.relu(x)
            x, _ = FoldedConv3D(
                self.dim_out, (1, 1, 1), T, dtype=self.dtype,
                kernel_init=(
                    nn.initializers.zeros if self.zero_init_final_conv
                    else None
                ),
                name="c",
            )(x)
            x = self.norm(
                self.dim_out,
                zero_init_gamma=self.zero_init_final_bn,
                name="c_bn",
                folded_t=T,
            )(x, train=train)
            return x

        x = conv3d(
            self.dim_inner,
            (self.temp_kernel_size, 1, 1),
            (1, str1x1, str1x1),
            (self.temp_kernel_size // 2, 0, 0),
            dtype=self.dtype,
            name="a",
        )(x)
        x = self.norm(self.dim_inner, name="a_bn")(x, train=train)
        x = nn.relu(x)

        x = conv3d(
            self.dim_inner,
            (1, 3, 3),
            (1, str3x3, str3x3),
            (0, self.dilation, self.dilation),
            groups=self.num_groups,
            dilation=(1, self.dilation, self.dilation),
            dtype=self.dtype,
            name="b",
        )(x)
        x = self.norm(self.dim_inner, name="b_bn")(x, train=train)
        x = nn.relu(x)

        x = conv3d(self.dim_out, (1, 1, 1), dtype=self.dtype, kernel_init=nn.initializers.zeros if self.zero_init_final_conv else None, name="c")(x)
        x = self.norm(
            self.dim_out, zero_init_gamma=self.zero_init_final_bn, name="c_bn"
        )(x, train=train)
        return x


class X3DTransform(nn.Module):
    """1x1x1 -> depthwise Tx3x3 (+SE every other block, Swish) -> 1x1x1.

    Reference: resnet_helper.py:118-256.
    """

    dim_out: int
    temp_kernel_size: int
    stride: int
    dim_inner: int
    num_groups: int
    norm: Callable
    stride_1x1: bool = False
    dilation: int = 1
    zero_init_final_bn: bool = False
    zero_init_final_conv: bool = False
    se_ratio: float = 0.0625
    swish_inner: bool = True
    block_idx: int = 0
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        str1x1, str3x3 = (self.stride, 1) if self.stride_1x1 else (1, self.stride)

        x = conv3d(
            self.dim_inner,
            (1, 1, 1),
            (1, str1x1, str1x1),
            dtype=self.dtype,
            name="a",
        )(x)
        x = self.norm(self.dim_inner, name="a_bn")(x, train=train)
        x = nn.relu(x)

        x = conv3d(
            self.dim_inner,
            (self.temp_kernel_size, 3, 3),
            (1, str3x3, str3x3),
            (self.temp_kernel_size // 2, self.dilation, self.dilation),
            groups=self.num_groups,
            dilation=(1, self.dilation, self.dilation),
            dtype=self.dtype,
            name="b",
        )(x)
        x = self.norm(self.dim_inner, name="b_bn")(x, train=train)

        # SE on odd block indices (reference: use_se iff (block_idx+1) % 2).
        if self.se_ratio > 0.0 and (self.block_idx + 1) % 2:
            x = SE(dim_in=self.dim_inner, ratio=self.se_ratio, name="se")(x)

        x = nn.silu(x) if self.swish_inner else nn.relu(x)

        x = conv3d(self.dim_out, (1, 1, 1), dtype=self.dtype, kernel_init=nn.initializers.zeros if self.zero_init_final_conv else None, name="c")(x)
        x = self.norm(
            self.dim_out, zero_init_gamma=self.zero_init_final_bn, name="c_bn"
        )(x, train=train)
        return x


class CSNTransform(nn.Module):
    """Channel-separated bottleneck (ir-CSN): 1x1x1 -> depthwise 3x3x3 ->
    1x1x1. The capability the reference gains via pytorchvideo's CSN
    builder (reference ptv_model_builder.py PTVCSN)."""

    dim_out: int
    temp_kernel_size: int
    stride: int
    dim_inner: int
    num_groups: int
    norm: Callable
    stride_1x1: bool = False
    dilation: int = 1
    zero_init_final_bn: bool = False
    zero_init_final_conv: bool = False
    block_idx: int = 0
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = conv3d(self.dim_inner, (1, 1, 1), dtype=self.dtype, name="a")(x)
        x = self.norm(self.dim_inner, name="a_bn")(x, train=train)
        x = nn.relu(x)
        x = conv3d(
            self.dim_inner,
            (3, 3, 3),
            (1, self.stride, self.stride),
            (1, self.dilation, self.dilation),
            groups=self.dim_inner,
            dilation=(1, self.dilation, self.dilation),
            dtype=self.dtype,
            name="b",
        )(x)
        x = self.norm(self.dim_inner, name="b_bn")(x, train=train)
        x = nn.relu(x)
        x = conv3d(self.dim_out, (1, 1, 1), dtype=self.dtype, kernel_init=nn.initializers.zeros if self.zero_init_final_conv else None, name="c")(x)
        x = self.norm(
            self.dim_out, zero_init_gamma=self.zero_init_final_bn, name="c_bn"
        )(x, train=train)
        return x


class R2Plus1DTransform(nn.Module):
    """(2+1)D bottleneck: the Tx3x3 middle conv factorizes into a spatial
    (1,3,3) conv and a temporal (3,1,1) conv with BN+ReLU between (the
    capability the reference gains via pytorchvideo's R(2+1)D builder)."""

    dim_out: int
    temp_kernel_size: int
    stride: int
    dim_inner: int
    num_groups: int
    norm: Callable
    stride_1x1: bool = False
    dilation: int = 1
    zero_init_final_bn: bool = False
    zero_init_final_conv: bool = False
    block_idx: int = 0
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = conv3d(self.dim_inner, (1, 1, 1), dtype=self.dtype, name="a")(x)
        x = self.norm(self.dim_inner, name="a_bn")(x, train=train)
        x = nn.relu(x)
        # Spatial then temporal factorized conv.
        x = conv3d(
            self.dim_inner,
            (1, 3, 3),
            (1, self.stride, self.stride),
            (0, self.dilation, self.dilation),
            dilation=(1, self.dilation, self.dilation),
            dtype=self.dtype,
            name="b_spatial",
        )(x)
        x = self.norm(self.dim_inner, name="b_spatial_bn")(x, train=train)
        x = nn.relu(x)
        x = conv3d(
            self.dim_inner,
            (3, 1, 1),
            (1, 1, 1),
            (1, 0, 0),
            dtype=self.dtype,
            name="b_temporal",
        )(x)
        x = self.norm(self.dim_inner, name="b_temporal_bn")(x, train=train)
        x = nn.relu(x)
        x = conv3d(self.dim_out, (1, 1, 1), dtype=self.dtype, kernel_init=nn.initializers.zeros if self.zero_init_final_conv else None, name="c")(x)
        x = self.norm(
            self.dim_out, zero_init_gamma=self.zero_init_final_bn, name="c_bn"
        )(x, train=train)
        return x


TRANS_FUNCS = {
    "bottleneck_transform": BottleneckTransform,
    "basic_transform": BasicTransform,
    "x3d_transform": X3DTransform,
    "csn_transform": CSNTransform,
    "r2plus1d_transform": R2Plus1DTransform,
}


class ResBlock(nn.Module):
    """Residual block with optional projection shortcut and drop-connect.

    Reference: resnet_helper.py:395-521.
    """

    dim_in: int
    dim_out: int
    temp_kernel_size: int
    stride: int
    trans_func_name: str
    dim_inner: int
    num_groups: int
    norm: Callable
    stride_1x1: bool = False
    dilation: int = 1
    zero_init_final_bn: bool = False
    zero_init_final_conv: bool = False
    block_idx: int = 0
    drop_connect_rate: float = 0.0
    folded_t: int = 0
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        trans_cls = TRANS_FUNCS[self.trans_func_name]
        trans_kwargs = dict(
            dim_out=self.dim_out,
            temp_kernel_size=self.temp_kernel_size,
            stride=self.stride,
            dim_inner=self.dim_inner,
            num_groups=self.num_groups,
            norm=self.norm,
            stride_1x1=self.stride_1x1,
            dilation=self.dilation,
            zero_init_final_bn=self.zero_init_final_bn,
            zero_init_final_conv=self.zero_init_final_conv,
            block_idx=self.block_idx,
            dtype=self.dtype,
            name="branch2",
        )
        if self.folded_t:
            trans_kwargs["folded_t"] = self.folded_t
        f_x = trans_cls(**trans_kwargs)(x, train=train)

        if train and self.drop_connect_rate > 0.0:
            f_x = drop_path(f_x, self.drop_connect_rate, self.make_rng("dropout"))

        if self.dim_in != self.dim_out or self.stride != 1:
            if self.folded_t:
                shortcut, _ = FoldedConv3D(
                    self.dim_out,
                    (1, 1, 1),
                    self.folded_t,
                    (1, self.stride, self.stride),
                    dtype=self.dtype,
                    name="branch1",
                )(x)
                shortcut = self.norm(
                    self.dim_out, name="branch1_bn", folded_t=self.folded_t
                )(shortcut, train=train)
            else:
                shortcut = conv3d(
                    self.dim_out,
                    (1, 1, 1),
                    (1, self.stride, self.stride),
                    dtype=self.dtype,
                    name="branch1",
                )(x)
                shortcut = self.norm(self.dim_out, name="branch1_bn")(
                    shortcut, train=train
                )
        else:
            shortcut = x
        return nn.relu(shortcut + f_x)


class ResStage(nn.Module):
    """A multi-pathway stage of residual blocks with optional non-local.

    Reference: resnet_helper.py:524-726. The per-block temporal kernel
    schedule repeats ``temp_kernel_sizes`` across blocks, truncated at
    ``num_block_temp_kernel`` (the rest use kernel 1).
    """

    dim_in: Sequence[int]
    dim_out: Sequence[int]
    dim_inner: Sequence[int]
    temp_kernel_sizes: Sequence[Sequence[int]]
    stride: Sequence[int]
    num_blocks: Sequence[int]
    num_groups: Sequence[int]
    num_block_temp_kernel: Sequence[int]
    nonlocal_inds: Sequence[Sequence[int]]
    nonlocal_group: Sequence[int]
    nonlocal_pool: Sequence[Sequence[int]]
    instantiation: str
    trans_func_name: str
    norm: Callable
    stride_1x1: bool = False
    dilation: Sequence[int] = (1, 1)
    zero_init_final_bn: bool = False
    zero_init_final_conv: bool = False
    drop_connect_rate: float = 0.0
    act_checkpoint: bool = False
    remat_policy: Any = None  # jax.checkpoint policy for act_checkpoint
    # Per-pathway: input arrives already folded with this T (0 = NTHWC).
    in_folded_t: Sequence[int] = ()
    # Per-pathway: keep the output folded (skip the exit unfold).
    out_folded: Sequence[bool] = ()
    dtype: Any = None

    @nn.compact
    def __call__(self, xs, train: bool = False):
        # MODEL.ACT_CHECKPOINT: rematerialize each block in the backward
        # pass (reference wraps stages in fairscale checkpoint_wrapper,
        # video_model_builder.py:535-541).
        block_cls = (
            nn.remat(
                ResBlock, static_argnums=(2,), policy=self.remat_policy
            )
            if self.act_checkpoint
            else ResBlock
        )
        num_pathways = len(self.num_blocks)
        out = []
        for p in range(num_pathways):
            # Per-block temporal kernel schedule.
            tks = (list(self.temp_kernel_sizes[p]) * self.num_blocks[p])[
                : self.num_block_temp_kernel[p]
            ] + [1] * (self.num_blocks[p] - self.num_block_temp_kernel[p])
            x = xs[p]
            # Small-channel pathways (SlowFast fast path) run the whole
            # stage in T-folded layout: channels-last tiling pads C to 128
            # lanes, so C=8..32 tensors waste 4-16x memory bandwidth on
            # every op. Folding trades padded conv FLOPs for full-width
            # MXU/VPU utilization.
            from slowfast_tpu.ops.video_conv import SMALL_C, fold_time, unfold_time

            in_ft = self.in_folded_t[p] if p < len(self.in_folded_t) else 0
            folded_t = in_ft
            # Fold only deeply-underfilled pathways (C < 32: >=4x lane
            # waste); at moderate C the block-diag padded FLOPs outweigh
            # the bandwidth win (measured: threshold 128 regressed 153 ->
            # 138 clips/s on SlowFast-R50).
            if not folded_t and (
                self.dim_inner[p] < SMALL_C
                and x.ndim == 5
                and x.shape[1] > 1
                and self.trans_func_name == "bottleneck_transform"
                and not self.nonlocal_inds[p]
                and not self.act_checkpoint
            ):
                folded_t = x.shape[1]
                x = fold_time(x)
            for i in range(self.num_blocks[p]):
                x = block_cls(
                    dim_in=self.dim_in[p] if i == 0 else self.dim_out[p],
                    dim_out=self.dim_out[p],
                    temp_kernel_size=tks[i],
                    stride=self.stride[p] if i == 0 else 1,
                    trans_func_name=self.trans_func_name,
                    dim_inner=self.dim_inner[p],
                    num_groups=self.num_groups[p],
                    norm=self.norm,
                    stride_1x1=self.stride_1x1,
                    dilation=self.dilation[p],
                    zero_init_final_bn=self.zero_init_final_bn,
                    zero_init_final_conv=self.zero_init_final_conv,
                    block_idx=i,
                    drop_connect_rate=self.drop_connect_rate,
                    folded_t=folded_t,
                    dtype=self.dtype,
                    name=f"pathway{p}_res{i}",
                )(x, train)
                if i in self.nonlocal_inds[p]:
                    assert not folded_t
                    group = self.nonlocal_group[p]
                    if group > 1:
                        # Fold temporal groups into batch (reference :707-724).
                        b, t, h, w, c = x.shape
                        x = x.reshape(b * group, t // group, h, w, c)
                    x = Nonlocal(
                        dim=self.dim_out[p],
                        dim_inner=self.dim_out[p] // 2,
                        pool_size=self.nonlocal_pool[p],
                        instantiation=self.instantiation,
                        norm=self.norm,
                        dtype=self.dtype,
                        name=f"pathway{p}_nonlocal{i}",
                    )(x, train=train)
                    if group > 1:
                        bg, tg, h, w, c = x.shape
                        x = x.reshape(bg // group, tg * group, h, w, c)
            keep = p < len(self.out_folded) and self.out_folded[p]
            if folded_t and not keep:
                x = unfold_time(x, folded_t)
            out.append(x)
        return out
