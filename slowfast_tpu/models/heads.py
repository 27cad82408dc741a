"""Model heads (reference slowfast/models/head_helper.py:20-672).

Heads follow the reference's train/eval contract: during training they
return raw logits; during evaluation they apply the configured activation
and, for fully-convolutional inference on larger-than-train crops, average
over the remaining T/H/W positions before flattening.
"""

from typing import Any, Callable, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from slowfast_tpu.ops.roi_align import roi_align
from .common import avg_pool3d, conv3d, max_pool3d


def _head_act(act_func: str):
    if act_func == "softmax":
        return lambda x: nn.softmax(x, axis=-1)
    if act_func == "sigmoid":
        return nn.sigmoid
    if act_func == "none":
        return None
    raise NotImplementedError(f"{act_func} is not supported as an activation function.")


class ResNetBasicHead(nn.Module):
    """Multi-pathway avg-pool -> concat -> dropout -> linear projection.

    Reference: head_helper.py:198-350. ``pool_size[p] is None`` means global
    average pooling (AdaptiveAvgPool3d((1,1,1)) in the reference).
    """

    dim_in: Sequence[int]
    num_classes: int
    pool_size: Optional[Sequence[Optional[Sequence[int]]]]
    dropout_rate: float = 0.0
    act_func: str = "softmax"
    detach_final_fc: bool = False
    # Contrastive MLP projection (reference head_helper.py:262-276).
    mlp_layers: int = 1
    mlp_dim: int = 2048
    bn_mlp: bool = False
    dtype: Any = None
    fc_init_std: float = 0.01

    @nn.compact
    def __call__(self, xs, train: bool = False):
        assert len(xs) == len(self.dim_in)
        pooled = []
        for p, x in enumerate(xs):
            if self.pool_size is None or self.pool_size[p] is None:
                x = jnp.mean(x, axis=(1, 2, 3), keepdims=True)
            else:
                x = avg_pool3d(x, self.pool_size[p], (1, 1, 1))
            pooled.append(x)
        x = jnp.concatenate(pooled, axis=-1)  # NTHWC already channel-last

        if self.dropout_rate > 0.0:
            x = nn.Dropout(self.dropout_rate)(x, deterministic=not train)
        if self.detach_final_fc:
            x = jax.lax.stop_gradient(x)

        if self.mlp_layers > 1:
            x = MLPHead(
                dim_out=self.num_classes,
                mlp_dim=self.mlp_dim,
                num_layers=self.mlp_layers,
                bn_on=self.bn_mlp,
                dtype=self.dtype,
                name="projection",
            )(x, train=train)
        else:
            x = nn.Dense(
                self.num_classes,
                dtype=self.dtype,
                kernel_init=nn.initializers.normal(self.fc_init_std),
                bias_init=nn.initializers.zeros,
                name="projection",
            )(x)

        if not train:
            act = _head_act(self.act_func)
            if act is not None:
                x = act(x)
            if x.shape[1:4] != (1, 1, 1):
                # Fully-convolutional inference: average over positions.
                x = jnp.mean(x, axis=(1, 2, 3), keepdims=True)
        return x.reshape(x.shape[0], -1)


class X3DHead(nn.Module):
    """conv5 -> BN -> ReLU -> pool -> lin5 -> (BN) -> ReLU -> proj.

    Reference: head_helper.py:353-488.
    """

    dim_in: int
    dim_inner: int
    dim_out: int
    num_classes: int
    pool_size: Optional[Sequence[int]]
    norm: Callable
    dropout_rate: float = 0.0
    act_func: str = "softmax"
    bn_lin5_on: bool = False
    dtype: Any = None
    fc_init_std: float = 0.01

    @nn.compact
    def __call__(self, xs, train: bool = False):
        assert len(xs) == 1, "X3DHead is single-pathway"
        x = xs[0]
        x = conv3d(self.dim_inner, (1, 1, 1), dtype=self.dtype, name="conv_5")(x)
        x = self.norm(self.dim_inner, name="conv_5_bn")(x, train=train)
        x = nn.relu(x)

        if self.pool_size is None:
            x = jnp.mean(x, axis=(1, 2, 3), keepdims=True)
        else:
            x = avg_pool3d(x, self.pool_size, (1, 1, 1))

        x = conv3d(self.dim_out, (1, 1, 1), dtype=self.dtype, name="lin_5")(x)
        if self.bn_lin5_on:
            x = self.norm(self.dim_out, name="lin_5_bn")(x, train=train)
        x = nn.relu(x)

        if self.dropout_rate > 0.0:
            x = nn.Dropout(self.dropout_rate)(x, deterministic=not train)
        x = nn.Dense(
            self.num_classes,
            dtype=self.dtype,
            kernel_init=nn.initializers.normal(self.fc_init_std),
            bias_init=nn.initializers.zeros,
            name="projection",
        )(x)

        if not train:
            act = _head_act(self.act_func)
            if act is not None:
                x = act(x)
            x = jnp.mean(x, axis=(1, 2, 3), keepdims=True)
        return x.reshape(x.shape[0], -1)


class ResNetRoIHead(nn.Module):
    """RoI head for detection (reference head_helper.py:20-144).

    Per pathway: temporal avg-pool -> ROIAlign (aligned, 1/scale_factor) ->
    spatial max-pool -> concat -> dropout -> linear -> activation (applied in
    both train and eval, as the reference does for detection).
    """

    dim_in: Sequence[int]
    num_classes: int
    pool_size: Sequence[Sequence[int]]  # [[T_p, 1, 1], ...]
    resolution: Sequence[Sequence[int]]
    scale_factor: Sequence[int]
    dropout_rate: float = 0.0
    act_func: str = "softmax"
    aligned: bool = True
    detach_final_fc: bool = False
    dtype: Any = None
    fc_init_std: float = 0.01

    @nn.compact
    def __call__(self, xs, bboxes, train: bool = False):
        """bboxes: (B, MAX_BOXES, 4) padded [x1,y1,x2,y2] per sample (static
        shape; invalid rows are zero boxes masked out of the loss/meter), or
        the reference's ragged (R, 5) [batch_idx, x1,y1,x2,y2] layout.
        Returns (B*MAX_BOXES, num_classes) (resp. (R, num_classes))."""
        assert len(xs) == len(self.dim_in)
        if bboxes.ndim == 3:
            B, M = bboxes.shape[:2]
            bidx = jnp.broadcast_to(
                jnp.arange(B, dtype=bboxes.dtype)[:, None, None], (B, M, 1)
            )
            rois = jnp.concatenate([bidx, bboxes], axis=-1).reshape(B * M, 5)
        else:
            rois = bboxes
        pooled = []
        for p, x in enumerate(xs):
            # Temporal average pooling to a single frame.
            x = jnp.mean(x, axis=1)  # (B, H, W, C)
            res = self.resolution[p][0]
            out = roi_align(
                x,
                rois,
                output_size=res,
                spatial_scale=1.0 / self.scale_factor[p],
                sampling_ratio=0,
                aligned=self.aligned,
            )  # (R, res, res, C)
            out = jnp.max(out, axis=(1, 2))  # spatial max-pool -> (R, C)
            pooled.append(out)
        x = jnp.concatenate(pooled, axis=-1)

        if self.dropout_rate > 0.0:
            x = nn.Dropout(self.dropout_rate)(x, deterministic=not train)
        if self.detach_final_fc:
            x = jax.lax.stop_gradient(x)
        x = nn.Dense(
            self.num_classes,
            dtype=self.dtype,
            kernel_init=nn.initializers.normal(self.fc_init_std),
            bias_init=nn.initializers.zeros,
            name="projection",
        )(x)
        act = _head_act(self.act_func)
        if self.act_func == "softmax":
            x = nn.softmax(x, axis=1)
        elif act is not None:
            x = act(x)
        return x


class MLPHead(nn.Module):
    """SSL projector MLP with optional BN (reference head_helper.py:147-195)."""

    dim_out: int
    mlp_dim: int
    num_layers: int
    bn_on: bool = False
    bias: bool = True
    flatten: bool = False
    norm: Optional[Callable] = None
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.flatten:
            x = x.reshape(-1, x.shape[-1])
        b = (not self.bn_on) and self.bias
        xavier = nn.initializers.xavier_uniform()
        idx = 0
        x = nn.Dense(self.mlp_dim, use_bias=b, kernel_init=xavier, dtype=self.dtype,
                     name=f"projection_{idx}")(x)
        for i in range(1, self.num_layers):
            if self.bn_on:
                idx += 1
                # 1D BN over features; global-batch stats under GSPMD.
                x = nn.BatchNorm(
                    use_running_average=not train,
                    momentum=0.9,
                    epsilon=1e-5,
                    dtype=jnp.float32,
                    name=f"projection_{idx}",
                )(x)
            idx += 1  # ReLU occupies a Sequential slot in the reference
            x = nn.relu(x)
            last = i == self.num_layers - 1
            d = self.dim_out if last else self.mlp_dim
            use_b = self.bias if last else b
            idx += 1
            x = nn.Dense(d, use_bias=use_b, kernel_init=xavier, dtype=self.dtype,
                         name=f"projection_{idx}")(x)
        return x


class TransformerBasicHead(nn.Module):
    """Dropout -> linear -> (eval: activation) (reference head_helper.py:491-563)."""

    dim_in: int
    num_classes: int
    dropout_rate: float = 0.0
    act_func: str = "softmax"
    detach_final_fc: bool = False
    head_init_scale: float = 1.0
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.dropout_rate > 0.0:
            x = nn.Dropout(self.dropout_rate)(x, deterministic=not train)
        if self.detach_final_fc:
            x = jax.lax.stop_gradient(x)
        x = nn.Dense(
            self.num_classes,
            kernel_init=nn.initializers.truncated_normal(0.02 * self.head_init_scale),
            bias_init=nn.initializers.zeros,
            dtype=self.dtype,
            name="projection",
        )(x)
        if not train:
            act = _head_act(self.act_func)
            if act is not None:
                x = act(x)
        return x
