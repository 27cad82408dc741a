"""Video model stems (reference slowfast/models/stem_helper.py:20-320).

All modules operate on NTHWC tensors.
"""

from typing import Any, Callable, Optional, Sequence

import jax.numpy as jnp
from flax import linen as nn

from .common import conv3d, max_pool3d


class ResNetBasicStem(nn.Module):
    """Conv(Txkxk) -> BN -> ReLU -> MaxPool(1x3x3 /1,2,2).

    Reference: stem_helper.py:127-201.

    TPU fast path: the whole pipeline runs in T-folded layout
    (B, H, W, T*C) — one transpose in, block-Toeplitz 2D conv at full MXU
    lane width, folded BN/ReLU/pool, one transpose out. This is ~5x faster
    than the direct formulation for the RGB/small-channel stems (measured
    on v5e; the fast-pathway stem alone was 42 ms -> ~8 ms at B=16).
    """

    dim_out: int
    kernel: Sequence[int]
    stride: Sequence[int]
    padding: Sequence[int]
    norm: Callable
    keep_folded: bool = False  # return (B,H,W,T*C) instead of NTHWC
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        from slowfast_tpu.ops.video_conv import (
            SMALL_C,
            _conv2d,
            _toeplitz_weights,
            fold_time,
            unfold_time,
        )
        from .common import msra_fill

        B, T, H, W, C = x.shape
        kt, kh, kw = self.kernel
        st, sh, sw = self.stride
        pt, ph, pw = self.padding

        if C < SMALL_C and st == 1:
            # Folded pipeline. Parameter lives under conv/kernel exactly as
            # in the direct path. The conv runs CHUNKED: output chunks of G
            # frames (G*co >= 128 lanes) with their (G+kt-1)-frame input
            # windows stacked into the batch dim — the full-T Toeplitz
            # kernel is kt/Tin dense (7.2x wasted stem FLOPs at T=32,kt=5),
            # chunking drops the inflation to (G+kt-1)/G.
            import jax
            import jax.numpy as jnp

            from slowfast_tpu.ops.video_conv import (
                _POOL_VJP,
                _pick_chunk,
                _toeplitz_weights_span,
                max_pool_2d_argmax,
                max_pool_2d_slices,
            )

            pool2d = (
                max_pool_2d_argmax
                if _POOL_VJP == "argmax"
                else max_pool_2d_slices
            )

            kernel = self.param_holder(C)
            xp = jnp.pad(x, ((0, 0), (pt, pt), (0, 0), (0, 0), (0, 0)))
            Tp = T + 2 * pt
            Tout = (Tp - kt) // st + 1
            G = _pick_chunk(Tout, self.dim_out)
            n = Tout // G
            if n <= 1:
                xf = fold_time(xp).astype(x.dtype)
                Wb, _ = _toeplitz_weights_span(kernel.astype(x.dtype), Tp, st)
                y = _conv2d(xf, Wb, (sh, sw), (ph, pw))
                G = Tout
            else:
                span = (G - 1) * st + kt
                xc = jnp.stack(
                    [
                        jax.lax.dynamic_slice_in_dim(xp, j * G * st, span, 1)
                        for j in range(n)
                    ],
                    axis=1,
                ).reshape(B * n, span, H, W, C)
                xf = fold_time(xc).astype(x.dtype)
                Wb, _ = _toeplitz_weights_span(
                    kernel.astype(x.dtype), span, st
                )
                y = _conv2d(xf, Wb, (sh, sw), (ph, pw))  # (B*n,Ho,Wo,G*co)
            y = self.norm(self.dim_out, name="bn", folded_t=G)(y, train=train)
            y = nn.relu(y)
            y = pool2d(y, (3, 3), (2, 2), (1, 1))
            co = self.dim_out
            Ho, Wo = y.shape[1], y.shape[2]
            if n <= 1:
                return y if self.keep_folded else unfold_time(y, Tout)
            y = y.reshape(B, n, Ho, Wo, G * co)
            if self.keep_folded:
                # (B, Ho, Wo, Tout*co), time-major channels.
                return y.transpose(0, 2, 3, 1, 4).reshape(B, Ho, Wo, Tout * co)
            return (
                y.reshape(B, n, Ho, Wo, G, co)
                .transpose(0, 1, 4, 2, 3, 5)
                .reshape(B, Tout, Ho, Wo, co)
            )

        x = conv3d(
            self.dim_out,
            self.kernel,
            self.stride,
            self.padding,
            dtype=self.dtype,
            name="conv",
        )(x)
        x = self.norm(self.dim_out, name="bn")(x, train=train)
        x = nn.relu(x)
        x = max_pool3d(x, (1, 3, 3), (1, 2, 2), (0, 1, 1))
        return x

    def param_holder(self, cin):
        """The stem conv weight in the standard (kt,kh,kw,Cin,Cout) layout,
        scoped as conv/kernel for checkpoint compatibility."""
        from .common import Conv3DParam

        return Conv3DParam(
            features=self.dim_out, kernel=tuple(self.kernel), name="conv"
        )(cin)


class X3DStem(nn.Module):
    """Spatial conv then depthwise temporal conv -> BN -> ReLU.

    Reference: stem_helper.py:204-285.
    """

    dim_out: int
    kernel: Sequence[int]
    stride: Sequence[int]
    padding: Sequence[int]
    norm: Callable
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = conv3d(
            self.dim_out,
            (1, self.kernel[1], self.kernel[2]),
            (1, self.stride[1], self.stride[2]),
            (0, self.padding[1], self.padding[2]),
            dtype=self.dtype,
            name="conv_xy",
        )(x)
        x = conv3d(
            self.dim_out,
            (self.kernel[0], 1, 1),
            (self.stride[0], 1, 1),
            (self.padding[0], 0, 0),
            groups=self.dim_out,
            dtype=self.dtype,
            name="conv",
        )(x)
        x = self.norm(self.dim_out, name="bn")(x, train=train)
        x = nn.relu(x)
        return x


class VideoModelStem(nn.Module):
    """Per-pathway stem dispatch (reference stem_helper.py:20-124).

    Module names follow the reference's ``pathway{i}_stem`` convention so
    checkpoint name mapping is mechanical.
    """

    dim_out: Sequence[int]
    kernel: Sequence[Sequence[int]]
    stride: Sequence[Sequence[int]]
    padding: Sequence[Sequence[int]]
    norm: Callable
    stem_func_name: str = "basic_stem"
    keep_folded: Sequence[bool] = ()
    dtype: Any = None

    @nn.compact
    def __call__(self, xs, train: bool = False):
        assert len(xs) == len(self.dim_out), (
            f"Input has {len(xs)} pathways, expected {len(self.dim_out)}"
        )
        stem_cls = {"basic_stem": ResNetBasicStem, "x3d_stem": X3DStem}[
            self.stem_func_name
        ]
        out = []
        for p, x in enumerate(xs):
            kwargs = dict(
                dim_out=self.dim_out[p],
                kernel=self.kernel[p],
                stride=self.stride[p],
                padding=self.padding[p],
                norm=self.norm,
                dtype=self.dtype,
                name=f"pathway{p}_stem",
            )
            if self.stem_func_name == "basic_stem":
                kwargs["keep_folded"] = (
                    p < len(self.keep_folded) and self.keep_folded[p]
                )
            stem = stem_cls(**kwargs)
            out.append(stem(x, train=train))
        return out


class PatchEmbed(nn.Module):
    """Conv patchification stem for MViT (reference stem_helper.py:288-320).

    Returns (tokens [B, N, C], spatial shape [T', H', W']).
    """

    dim_out: int = 768
    kernel: Sequence[int] = (1, 16, 16)
    stride: Sequence[int] = (1, 4, 4)
    padding: Sequence[int] = (1, 7, 7)
    conv_2d: bool = False
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        # x: NTHWC (or NHWC when conv_2d).
        if self.conv_2d:
            # [-2:]: the (h, w) tail of a 3-length (t, h, w) spec AND a
            # 2-length image spec (in1k configs ship PATCH_KERNEL [16, 16];
            # [1:] would silently drop the H entry and run a 1-D conv).
            kernel, stride, padding = (
                self.kernel[-2:],
                self.stride[-2:],
                self.padding[-2:],
            )
            x = nn.Conv(
                self.dim_out,
                kernel_size=tuple(kernel),
                strides=tuple(stride),
                padding=[(p, p) for p in padding],
                use_bias=True,
                kernel_init=nn.initializers.truncated_normal(0.02),
                dtype=self.dtype,
                name="proj",
            )(x)
            shape = x.shape[1:-1]  # (H', W')
        else:
            from .common import Conv3D

            x = Conv3D(
                features=self.dim_out,
                kernel=tuple(self.kernel),
                stride=tuple(self.stride),
                padding=tuple(self.padding),
                bias=True,
                kernel_init=nn.initializers.truncated_normal(0.02),
                dtype=self.dtype,
                name="proj",
            )(x)
            shape = x.shape[1:-1]  # (T', H', W')
        tokens = x.reshape(x.shape[0], -1, x.shape[-1])
        return tokens, shape
