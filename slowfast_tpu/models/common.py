"""Common building blocks: MLP, DropPath, TwoStreamFusion, conv/init helpers.

Reference: slowfast/models/common.py:7-146, slowfast/models/operators.py.
"""

from typing import Any, Callable, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

# MSRA/He fan-out init used for all convolutions (reference init via
# fvcore c2_msra_fill, slowfast/utils/weight_init_helper.py:10-54).
msra_fill = nn.initializers.variance_scaling(2.0, "fan_out", "normal")


class Conv3D(nn.Module):
    """3D conv on NTHWC inputs, dispatched to TPU-efficient formulations.

    Stores its weight in the same logical layout as flax ``nn.Conv``
    ((kt, kh, kw, Cin/groups, Cout), param name ``kernel``) so checkpoint
    conversion is formulation-independent; the forward routes through
    :mod:`slowfast_tpu.ops.video_conv` (2D folds / tap matmuls / T-folded
    block-Toeplitz matmuls) instead of XLA's slow direct 3D conv path.
    """

    features: int
    kernel: Sequence[int]
    stride: Sequence[int] = (1, 1, 1)
    padding: Sequence[int] = (0, 0, 0)
    groups: int = 1
    bias: bool = False
    dilation: Sequence[int] = (1, 1, 1)
    kernel_init: Callable = None
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        from slowfast_tpu.ops.video_conv import video_conv

        cin = x.shape[-1]
        w = self.param(
            "kernel",
            self.kernel_init or msra_fill,
            tuple(self.kernel) + (cin // self.groups, self.features),
            jnp.float32,
        )
        w = w.astype(x.dtype)
        y = video_conv(
            x,
            w,
            stride=tuple(self.stride),
            padding=tuple(self.padding),
            groups=self.groups,
            dilation=tuple(self.dilation),
        )
        if self.bias:
            b = self.param(
                "bias", nn.initializers.zeros, (self.features,), jnp.float32
            )
            y = y + b.astype(y.dtype)
        return y


class FoldedConv3D(nn.Module):
    """Conv on a T-folded (B, H, W, T*C) tensor.

    Same param layout/name as Conv3D ((kt,kh,kw,Cin,Cout) under 'kernel'),
    so checkpoints are independent of which layout executed.
    """

    features: int
    kernel: Sequence[int]
    t: int
    stride: Sequence[int] = (1, 1, 1)
    padding: Sequence[int] = (0, 0, 0)
    kernel_init: Callable = None
    dtype: Any = None

    @nn.compact
    def __call__(self, xf):
        from slowfast_tpu.ops.video_conv import folded_conv

        cin = xf.shape[-1] // self.t
        w = self.param(
            "kernel",
            self.kernel_init or msra_fill,
            tuple(self.kernel) + (cin, self.features),
            jnp.float32,
        )
        y, t_out = folded_conv(
            xf, w.astype(xf.dtype), self.t, tuple(self.stride), tuple(self.padding)
        )
        return y, t_out


class Conv3DParam(nn.Module):
    """Declares a conv kernel param (standard layout) without running it.

    Used by fused/folded pipelines that consume the weight directly while
    keeping the same checkpoint path (<name>/kernel) as Conv3D.
    """

    features: int
    kernel: Sequence[int]
    kernel_init: Callable = None

    @nn.compact
    def __call__(self, cin):
        return self.param(
            "kernel",
            self.kernel_init or msra_fill,
            tuple(self.kernel) + (cin, self.features),
            jnp.float32,
        )


def conv3d(
    features: int,
    kernel: Sequence[int],
    stride: Sequence[int] = (1, 1, 1),
    padding: Sequence[int] = (0, 0, 0),
    groups: int = 1,
    bias: bool = False,
    dilation: Sequence[int] = (1, 1, 1),
    dtype: Any = None,
    kernel_init: Callable = None,
    name: Optional[str] = None,
) -> Conv3D:
    """A 3D conv on NTHWC inputs with torch-style symmetric integer padding."""
    return Conv3D(
        features=features,
        kernel=tuple(kernel),
        stride=tuple(stride),
        padding=tuple(padding),
        groups=groups,
        bias=bias,
        dilation=tuple(dilation),
        kernel_init=kernel_init,
        dtype=dtype,
        name=name,
    )


def max_pool3d(x, kernel, stride=None, padding=(0, 0, 0)):
    """Torch-style MaxPool3d on NTHWC input (small-C pools in folded layout)."""
    from slowfast_tpu.ops.video_conv import max_pool3d_fast

    stride = stride or kernel
    return max_pool3d_fast(x, tuple(kernel), tuple(stride), tuple(padding))


def avg_pool3d(x, kernel, stride=None, padding=(0, 0, 0)):
    stride = stride or kernel
    pad = [(p, p) for p in padding]
    return nn.avg_pool(
        x, window_shape=tuple(kernel), strides=tuple(stride), padding=pad
    )


def drop_path(x, rate: float, rng) -> jnp.ndarray:
    """Stochastic depth: drop the entire residual branch per sample.

    Reference: slowfast/models/common.py:46-70 (keep_prob scaling).
    """
    keep = 1.0 - rate
    mask_shape = (x.shape[0],) + (1,) * (x.ndim - 1)
    mask = jax.random.bernoulli(rng, keep, mask_shape).astype(x.dtype)
    return x / keep * mask


class DropPath(nn.Module):
    """Module wrapper around :func:`drop_path` using the 'dropout' RNG."""

    rate: float = 0.0

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        if self.rate == 0.0 or deterministic:
            return x
        return drop_path(x, self.rate, self.make_rng("dropout"))


@jax.custom_vjp
def gelu_exact(x):
    """Exact-erf GELU (torch nn.GELU parity) with a SAVED derivative.

    The autodiff VJP recomputes erf+exp over the full hidden activation in
    the backward pass — transcendentals over ~770M elements/step dominate
    the MViT MLP backward on the VPU (fc2 bwd fusions measured at ~190GB/s,
    compute-bound). Here the forward computes y AND y' in one fused read of
    x and saves y' in the compute dtype; the backward is a single multiply.
    Same math as autodiff of x*Phi(x) (derivative Phi(x) + x*phi(x)).
    """
    return _gelu_exact_fwd(x)[0]


def _gelu_exact_fwd(x):
    x32 = x.astype(jnp.float32)
    cdf = 0.5 * (1.0 + jax.lax.erf(x32 * (2.0 ** -0.5)))
    pdf = jnp.exp(-0.5 * x32 * x32) * ((2.0 * jnp.pi) ** -0.5)
    y = (x32 * cdf).astype(x.dtype)
    d = (cdf + x32 * pdf).astype(x.dtype)
    return y, d


def _gelu_exact_bwd(d, g):
    return ((g.astype(jnp.float32) * d.astype(jnp.float32)).astype(g.dtype),)


gelu_exact.defvjp(_gelu_exact_fwd, _gelu_exact_bwd)


class Mlp(nn.Module):
    """Transformer MLP (reference slowfast/models/common.py:7-34)."""

    hidden_features: int
    out_features: int
    # torch nn.GELU computes the exact erf form; flax defaults to tanh.
    act_layer: Callable = staticmethod(gelu_exact)
    drop_rate: float = 0.0
    bias_init: Callable = nn.initializers.zeros
    dtype: Any = None

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        x = nn.Dense(
            self.hidden_features,
            dtype=self.dtype,
            kernel_init=nn.initializers.truncated_normal(0.02),
            bias_init=self.bias_init,
            name="fc1",
        )(x)
        # Tensor partitioning: the hidden axis shards over the "model" mesh
        # axis (column-parallel fc1, row-parallel fc2 + psum); no-op off.
        from slowfast_tpu.parallel.mesh import constrain_channels

        x = constrain_channels(x)
        x = self.act_layer(x)
        if self.drop_rate > 0.0:
            x = nn.Dropout(self.drop_rate)(x, deterministic=deterministic)
        x = nn.Dense(
            self.out_features,
            dtype=self.dtype,
            kernel_init=nn.initializers.truncated_normal(0.02),
            bias_init=self.bias_init,
            name="fc2",
        )(x)
        if self.drop_rate > 0.0:
            x = nn.Dropout(self.drop_rate)(x, deterministic=deterministic)
        return x


class TwoStreamFusion(nn.Module):
    """Fuse the two reversible streams (reference common.py:73-146).

    mode: "add" | "max" | "min" | "avg" | "concat" | "concat_linear_{1,2}"
    or "ln+mlp"-style projected fusions operating on the channel-concat.
    """

    mode: str
    dim: int = 0  # concat dim size (2 * channel), needed for projected modes

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        a, b = jnp.split(x, 2, axis=-1)
        if self.mode == "add":
            return a + b
        if self.mode == "max":
            return jnp.maximum(a, b)
        if self.mode == "min":
            return jnp.minimum(a, b)
        if self.mode == "avg":
            return (a + b) * 0.5
        if self.mode == "concat":
            return x
        if self.mode in ("concat_linear", "concat_linear_1"):
            return x + nn.Dense(self.dim, name="fuse_fn")(x)
        if self.mode == "concat_linear_2":
            y = nn.Dense(self.dim, name="fuse_fn1")(x)
            return x + nn.Dense(self.dim, name="fuse_fn2")(y)
        if self.mode == "ln+mlp":
            y = nn.LayerNorm(name="fuse_norm")(x)
            y = Mlp(
                hidden_features=4 * self.dim,
                out_features=self.dim,
                name="fuse_mlp",
            )(y, deterministic=deterministic)
            return x + y
        raise NotImplementedError(f"TwoStreamFusion mode {self.mode}")


class SE(nn.Module):
    """Squeeze-and-Excitation on NTHWC (reference operators.py:15-59)."""

    dim_in: int
    ratio: float

    @staticmethod
    def _round_width(width, multiplier, min_width=8, divisor=8):
        if not multiplier:
            return width
        width *= multiplier
        min_width = min_width or divisor
        width_out = max(min_width, int(width + divisor / 2) // divisor * divisor)
        if width_out < 0.9 * width:
            width_out += divisor
        return int(width_out)

    @nn.compact
    def __call__(self, x):
        dim_fc = self._round_width(self.dim_in, self.ratio)
        s = jnp.mean(x, axis=(1, 2, 3), keepdims=True)
        s = conv3d(dim_fc, (1, 1, 1), bias=True, name="fc1")(s)
        s = nn.relu(s)
        s = conv3d(self.dim_in, (1, 1, 1), bias=True, name="fc2")(s)
        s = nn.sigmoid(s)
        return x * s
