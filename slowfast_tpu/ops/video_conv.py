"""TPU-native 3D-convolution formulations.

XLA's direct 3-spatial-dim convolution lowers poorly on TPU (measured ~10x
slower than equivalent matmul/2D-conv formulations on v5e), andsmall-channel
video tensors (the SlowFast fast pathway: C=3..32) waste most of the 128
vector lanes in channels-last layout. Every conv in this framework therefore
routes through one of these formulations, chosen statically by kernel/shape:

  * (1,kh,kw) spatial conv      -> fold T into batch, 2D conv (free reshape).
  * (kt,1,1) temporal conv      -> per-tap matmuls over shifted T slices
                                   (large C), or T-folded block-Toeplitz 1x1
                                   conv (small C: full-lane matmul).
  * (kt,kh,kw) full 3D          -> T-folded block-Toeplitz 2D conv (small C,
                                   e.g. RGB stems: 42ms -> ~4ms on v5e), or
                                   kt summed 2D convs (large C).
  * depthwise (X3D)             -> per-tap 2D depthwise convs summed.

All take x: (B, T, H, W, C) and weights in the logical torch-like shape
(kt, kh, kw, Cin/groups, Cout), so checkpoints are layout-independent.
"""

from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

# Below this channel count, prefer T-folded (channel-packed) formulations.
SMALL_C = 32


def _conv2d(x, w, stride, padding, groups=1, dilation=(1, 1)):
    # No explicit preferred_element_type: the TPU MXU accumulates bf16
    # matmuls in fp32 internally, and a widened output dtype breaks the
    # conv VJP (mixed-dtype transpose conv is rejected by lax).
    return jax.lax.conv_general_dilated(
        x,
        w,
        window_strides=tuple(stride),
        padding=[(p, p) for p in padding],
        rhs_dilation=tuple(dilation),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=groups,
    )


def _toeplitz_weights(w, T, stride_t, pad_t):
    """Scatter (kt,kh,kw,C,co) into a T-folded (kh,kw,Tin*C,Tout*co) kernel.

    Tin = T + 2*pad_t; output temporal index t reads input block
    t*stride_t + dt. Built with an einsum against a constant selection
    tensor so it traces to one fused op.
    """
    return _toeplitz_weights_span(w, T + 2 * pad_t, stride_t)


def _toeplitz_weights_span(w, t_in, stride_t):
    """Toeplitz weights over an explicit (already padded) input extent."""
    kt, kh, kw, C, co = w.shape
    Tout = (t_in - kt) // stride_t + 1
    p = np.arange(t_in)[None, :, None]
    t = np.arange(Tout)[None, None, :]
    dt = np.arange(kt)[:, None, None]
    sel = jnp.asarray((p == t * stride_t + dt), w.dtype)
    Wb = jnp.einsum("dpt,dhwco->hwpcto", sel, w)
    return Wb.reshape(kh, kw, t_in * C, Tout * co), Tout


def fold_time(x):
    """(B,T,H,W,C) -> (B,H,W,T*C). A real transpose (data movement)."""
    B, T, H, W, C = x.shape
    return x.transpose(0, 2, 3, 1, 4).reshape(B, H, W, T * C)


def unfold_time(x, T):
    B, H, W, TC = x.shape
    return x.reshape(B, H, W, T, TC // T).transpose(0, 3, 1, 2, 4)


import os as _os

# "ndhwc" (default): spatial convs run on the rank-5 tensor with a unit
# temporal window — XLA keeps one layout through the whole residual stage.
# "fold2d": reshape (B*T, H, W, C) around a 2D conv. Measured on v5e
# (SlowFast 4x16 R50 train, B=16): ndhwc 181.8 clips/s vs fold2d 157.7 —
# the rank-5<->rank-4 roundtrip around EVERY spatial conv materialized
# layout copies (~10 ms/step across the net).
_SPATIAL_IMPL = _os.environ.get("SF_SPATIAL_CONV", "ndhwc")
_DEPTHWISE_IMPL = _os.environ.get("SF_DEPTHWISE_CONV", "ndhwc")
# Pointwise (1,1,1) convs as an explicit dot_general instead of a
# unit-window conv. Hypothesis: the conv VJP of a rank-5 NDHWC pointwise
# conv lowers poorly on thin channels, and a dot (whose VJP is two more
# dots) would tile better. MEASURED NEGATIVE on v5e (X3D-M train, B=16):
# dot 139.0 clips/s vs conv 162.0 — XLA fuses the unit-window conv into
# the surrounding BN/ReLU elementwise work, and the explicit dot breaks
# that fusion for more than the lowering win. Kept behind
# SF_POINTWISE_CONV=dot for future A/B on other topologies/hardware.
_POINTWISE_IMPL = _os.environ.get("SF_POINTWISE_CONV", "conv")


def pointwise_conv(x, w2d, stride_hw=(1, 1)):
    """(1,1,1) conv on (B, T, H, W, C) as a dot over the channel dim.

    A 1x1x1 kernel with zero padding commutes with spatial striding, so
    stride is a pre-slice (reads 1/(sh*sw) of the input instead of
    discarding conv outputs). w2d: (Cin, Cout).
    """
    sh, sw = stride_hw
    if sh > 1 or sw > 1:
        x = x[:, :, ::sh, ::sw, :]
    return jax.lax.dot_general(
        x, w2d, dimension_numbers=(((x.ndim - 1,), (0,)), ((), ()))
    )


# Hybrid pointwise conv: the FORWARD stays a unit-window rank-5 conv
# (XLA fuses the adjacent BN/ReLU chains into conv fusions — losing
# that cost 29 ms/step on X3D-M, see the dot negative result above),
# and the BACKWARD replaces pieces of the conv VJP with explicit dots.
# MEASURED NEGATIVE in both splits (X3D-M train B=16 on v5e, vs 162.7
# clips/s for the plain conv path):
#   - dx AND dW as dots: 142.6 — the backward elementwise fusion
#     (BN/ReLU VJP folded into the transpose convs) is lost too.
#   - dW alone as a gemm (dx stays a conv): 150.4 — the "slow"
#     transpose-conv op is really a multi-output fusion computing
#     dx + dW + BN-backward in ONE pass over x/dy; extracting dW does
#     not shrink that pass, it adds a second full read of x and dy.
# Conclusion: per-op profiler bandwidth under-sells conv fusions, and
# the conv formulation is the optimum of this search space. Kept
# behind SF_POINTWISE_CONV=hybrid for A/B on other shapes/hardware.
# Gated to stride-1, Cin/Cout <= _HYBRID_MAX_C: at >=128 channels the
# conv VJP already tiles full MXU lanes (s4/s5 a-convs stream at
# 644 GB/s) and is left alone.
_HYBRID_MAX_C = 128


def _pointwise_conv5d(x, w, stride_hw):
    return jax.lax.conv_general_dilated(
        x,
        w,
        window_strides=(1,) + tuple(stride_hw),
        padding=[(0, 0)] * 3,
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
    )


from functools import partial as _partial


@_partial(jax.custom_vjp, nondiff_argnums=(2,))
def _pointwise_conv_dot_bwd(x, w, stride_hw):
    return _pointwise_conv5d(x, w, stride_hw)


def _pointwise_fwd(x, w, stride_hw):
    return _pointwise_conv5d(x, w, stride_hw), (x, w)


def _pointwise_bwd(stride_hw, res, dy):
    x, w = res
    w2d = w[0, 0, 0]  # (Cin, Cout)
    ci, co = w2d.shape
    # dx stays a unit-window CONV (of dy with the transposed weight):
    # it sits on the activation chain, and XLA fuses the BN/ReLU
    # backward elementwise into conv ops — computing it as a dot lost
    # that fusion (hybrid-both-dots measured 142.6 vs 162.7 clips/s).
    dx = _pointwise_conv5d(dy, w2d.T.reshape(1, 1, 1, co, ci), (1, 1))
    # dW feeds the optimizer — nothing on the activation chain fuses
    # into it — so it is safe to replace the pathological transpose-conv
    # (8.96 ms/step at 208 GB/s on X3D-M s2 res0/a) with a plain gemm.
    # C is minor in NDHWC, so the (N, C) reshapes are free.
    dW = jax.lax.dot_general(
        x.reshape(-1, ci),
        dy.reshape(-1, co),
        dimension_numbers=(((0,), (0,)), ((), ())),
    )
    return dx, dW.reshape(w.shape).astype(w.dtype)


_pointwise_conv_dot_bwd.defvjp(_pointwise_fwd, _pointwise_bwd)


def spatial_conv(x, w, stride_hw, pad_hw, groups=1, dilation_hw=(1, 1)):
    """(1,kh,kw) conv on (B, T, H, W, C), layout-preserving by default."""
    B, T, H, W, C = x.shape
    if (
        groups == 1
        and w.shape[1] == 1
        and w.shape[2] == 1
        and pad_hw[0] == 0
        and pad_hw[1] == 0
    ):
        if _POINTWISE_IMPL == "dot":
            return pointwise_conv(x, w[0, 0, 0], stride_hw)
        if (
            _POINTWISE_IMPL == "hybrid"
            and tuple(stride_hw) == (1, 1)
            and max(w.shape[3], w.shape[4]) <= _HYBRID_MAX_C
        ):
            return _pointwise_conv_dot_bwd(x, w, (1, 1))
    if _SPATIAL_IMPL == "ndhwc":
        return jax.lax.conv_general_dilated(
            x,
            w,
            window_strides=(1,) + tuple(stride_hw),
            padding=[(0, 0)] + [(p, p) for p in pad_hw],
            rhs_dilation=(1,) + tuple(dilation_hw),
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
            feature_group_count=groups,
        )
    y = _conv2d(
        x.reshape(B * T, H, W, C), w[0], stride_hw, pad_hw, groups, dilation_hw
    )
    return y.reshape(B, T, *y.shape[1:])


def temporal_conv_taps(x, w, stride_t, pad_t):
    """(kt,1,1) conv as kt shifted matmuls (good for large C)."""
    B, T, H, W, C = x.shape
    kt, _, _, ci, co = w.shape
    assert ci == C
    xp = jnp.pad(x, ((0, 0), (pad_t, pad_t), (0, 0), (0, 0), (0, 0)))
    Tout = (T + 2 * pad_t - kt) // stride_t + 1
    acc = None
    for d in range(kt):
        xs = xp[:, d : d + (Tout - 1) * stride_t + 1 : stride_t]
        term = jnp.einsum("bthwc,co->bthwo", xs, w[d, 0, 0])
        acc = term if acc is None else acc + term
    return acc


def temporal_conv_folded(x, w, stride_t, pad_t):
    """(kt,1,1) conv in T-folded layout as one full-lane 1x1 conv."""
    B, T, H, W, C = x.shape
    kt, _, _, ci, co = w.shape
    xp = jnp.pad(x, ((0, 0), (pad_t, pad_t), (0, 0), (0, 0), (0, 0)))
    xf = fold_time(xp)
    Wb, Tout = _toeplitz_weights(w, T, stride_t, pad_t)
    y = _conv2d(xf, Wb[0:1, 0:1].reshape(1, 1, *Wb.shape[2:]), (1, 1), (0, 0))
    return unfold_time(y, Tout)


def _pick_chunk(t_out, co):
    """Smallest divisor G of t_out with G*co >= 128 (full output lanes)."""
    import math

    target = max(1, -(-128 // co))
    for g in range(target, t_out):
        if t_out % g == 0:
            return g
    return t_out


def conv3d_folded(x, w, stride, padding):
    """Full (kt,kh,kw) conv via CHUNKED T-folded block-Toeplitz 2D conv.

    The formulation of choice for small-channel stems (RGB in): MXU runs at
    full width on the folded channel dim. Folding the FULL temporal extent
    makes the Toeplitz kernel mostly zeros (density kt/Tin — 7.2x wasted
    FLOPs for the SlowFast fast stem, kt=5, T=32); instead the output is
    computed in chunks of G frames whose input windows (G-1)*st+kt frames
    are stacked into the batch dim. G is the smallest divisor of Tout with
    G*co >= 128, so output lanes stay full while FLOP inflation drops to
    ((G-1)*st+kt)/(G*st).
    """
    B, T, H, W, C = x.shape
    kt, kh, kw, ci, co = w.shape
    st, sh, sw = stride
    pt, ph, pw = padding
    xp = jnp.pad(x, ((0, 0), (pt, pt), (0, 0), (0, 0), (0, 0)))
    Tp = T + 2 * pt
    Tout = (Tp - kt) // st + 1
    G = _pick_chunk(Tout, co)
    n = Tout // G
    if n <= 1:
        xf = fold_time(xp)
        Wb, _ = _toeplitz_weights_span(w, Tp, st)
        y = _conv2d(xf, Wb, (sh, sw), (ph, pw))
        return unfold_time(y, Tout)
    span = (G - 1) * st + kt
    xc = jnp.stack(
        [
            jax.lax.dynamic_slice_in_dim(xp, j * G * st, span, 1)
            for j in range(n)
        ],
        axis=1,
    ).reshape(B * n, span, H, W, C)
    xf = fold_time(xc)  # (B*n, H, W, span*C)
    Wb, _ = _toeplitz_weights_span(w, span, st)  # (kh, kw, span*C, G*co)
    y = _conv2d(xf, Wb, (sh, sw), (ph, pw))  # (B*n, Ho, Wo, G*co)
    y = unfold_time(y, G)  # (B*n, G, Ho, Wo, co)
    Ho, Wo = y.shape[2], y.shape[3]
    return y.reshape(B, n * G, Ho, Wo, co)


def conv3d_taps(x, w, stride, padding, groups=1, dilation=(1, 1, 1)):
    """Full 3D conv as kt summed 2D convs over shifted T slices.

    (Keeping each tap rank-4 measured FASTER than rank-5 NDHWC taps on
    v5e — 181.8 vs 174.6 clips/s SlowFast train — the temporal strided
    slices already force a copy, after which the rank-4 conv layout wins.)
    """
    B, T, H, W, C = x.shape
    kt, kh, kw, ci, co = w.shape
    st, sh, sw = stride
    pt, ph, pw = padding
    xp = jnp.pad(x, ((0, 0), (pt, pt), (0, 0), (0, 0), (0, 0)))
    Tout = (T + 2 * pt - kt) // st + 1
    acc = None
    for d in range(kt):
        xs = xp[:, d : d + (Tout - 1) * st + 1 : st]
        xs = xs.reshape(B * Tout, H, W, C)
        term = _conv2d(xs, w[d], (sh, sw), (ph, pw), groups, dilation[1:])
        acc = term if acc is None else acc + term
    Ho, Wo = acc.shape[1], acc.shape[2]
    return acc.reshape(B, Tout, Ho, Wo, co)


def video_conv(x, w, stride=(1, 1, 1), padding=(0, 0, 0), groups=1,
               dilation=(1, 1, 1)):
    """Dispatch a 3D conv to the best TPU formulation (static decision)."""
    kt, kh, kw = w.shape[0], w.shape[1], w.shape[2]
    C = x.shape[-1]
    if groups > 1:
        # Depthwise/grouped (X3D, MViT pool convs): per-tap 2D grouped
        # convs, except fully-depthwise 3D kernels where ONE rank-5 NDHWC
        # grouped conv wins — the VPU tap math is trivial (~27 mults/elem)
        # and the per-tap (B*T,H,W,C) reshape copies dominate.
        if kt == 1:
            return spatial_conv(x, w, stride[1:], padding[1:], groups, dilation[1:])
        if groups == C and _DEPTHWISE_IMPL == "ndhwc":
            return jax.lax.conv_general_dilated(
                x,
                w,
                window_strides=tuple(stride),
                padding=[(p, p) for p in padding],
                rhs_dilation=tuple(dilation),
                dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
                feature_group_count=groups,
            )
        return conv3d_taps(x, w, stride, padding, groups, dilation)
    if kt == 1:
        return spatial_conv(x, w, stride[1:], padding[1:], 1, dilation[1:])
    if kh == 1 and kw == 1:
        if C < SMALL_C:
            return temporal_conv_folded(x, w, stride[0], padding[0])
        return temporal_conv_taps(x, w, stride[0], padding[0])
    if C < SMALL_C:
        return conv3d_folded(x, w, stride, padding)
    return conv3d_taps(x, w, stride, padding, 1, dilation)


def max_pool_2d_slices(x, kernel_hw, stride_hw, pad_hw):
    """Spatial max pool via shifted strided slices + elementwise max.

    XLA TPU's reduce-window lowers poorly here (measured ~10 ms for a
    ~50 MB pool on v5e vs <1 ms for this formulation, which fuses into
    plain vector ops). x: (..., H, W, C).
    """
    kh, kw = kernel_hw
    sh, sw = stride_hw
    ph, pw = pad_hw
    neg = jnp.asarray(-jnp.inf, jnp.float32).astype(x.dtype)
    lead = [(0, 0)] * (x.ndim - 3)
    xp = jnp.pad(x, lead + [(ph, ph), (pw, pw), (0, 0)], constant_values=neg)
    H = x.shape[-3] + 2 * ph
    W = x.shape[-2] + 2 * pw
    Ho = (H - kh) // sh + 1
    Wo = (W - kw) // sw + 1
    out = None
    for i in range(kh):
        for j in range(kw):
            sl = xp[
                ...,
                i : i + (Ho - 1) * sh + 1 : sh,
                j : j + (Wo - 1) * sw + 1 : sw,
                :,
            ]
            out = sl if out is None else jnp.maximum(out, sl)
    return out


# ---------------------------------------------------------------------------
# Argmax-saving max pool with an input-centric custom VJP.
#
# Autodiff of the shifted-slice max chain produces, per tap, a full
# input-resolution mask multiply (select(x_tap == running_max) * dy) — for
# the SlowFast/C2D stems that backward is ~2.4 ms/step/pathway of
# HBM-bound `mul`s (~1.7 GB of traffic), the single largest op in the
# profiled step. This formulation instead:
#   * forward: computes the max AND the winning tap index (uint8, first
#     strict max — torch MaxPool semantics) in one fused pass;
#   * backward: computes dx directly on the input grid. A padded input
#     index i = s*m + r is covered by at most ceil(k/s) windows per dim;
#     for each stride-residue class r the covering windows sit at static
#     offsets, so dx is a sum of <= ceil(k/s)^2 elementwise
#     dy*(idx == tap) terms per class, gathered with static strided
#     slices and re-interleaved with a reshape. Traffic is
#     read(idx)+read(dy)+write(dx) — ~6x less than the mask-mul chain.
# ---------------------------------------------------------------------------

from functools import partial


def _pool_geom(H, k, s, p):
    """Per-dim geometry: padded extent (rounded up to a multiple of s so
    residue classes interleave with one reshape) and output extent."""
    Hp = H + 2 * p
    Ho = (Hp - k) // s + 1
    Hp_r = -(-Hp // s) * s  # round up; extra tail is just ignored padding
    return Hp, Ho, Hp_r


def max_pool_2d_argmax(x, kernel_hw, stride_hw, pad_hw):
    """Spatial max pool on (..., H, W, C), argmax-saving custom VJP."""
    return _max_pool_2d_argmax(
        x, tuple(kernel_hw), tuple(stride_hw), tuple(pad_hw),
        x.shape[-3:-1], jnp.dtype(x.dtype).name,
    )


@partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3, 4, 5))
def _max_pool_2d_argmax(x, kernel_hw, stride_hw, pad_hw, x_hw, x_dtype):
    y, _ = _max_pool_2d_fwd_impl(x, kernel_hw, stride_hw, pad_hw)
    return y


def _max_pool_2d_fwd_impl(x, kernel_hw, stride_hw, pad_hw):
    kh, kw = kernel_hw
    sh, sw = stride_hw
    ph, pw = pad_hw
    neg = jnp.asarray(-jnp.inf, jnp.float32).astype(x.dtype)
    lead = [(0, 0)] * (x.ndim - 3)
    xp = jnp.pad(x, lead + [(ph, ph), (pw, pw), (0, 0)], constant_values=neg)
    H = x.shape[-3] + 2 * ph
    W = x.shape[-2] + 2 * pw
    Ho = (H - kh) // sh + 1
    Wo = (W - kw) // sw + 1
    best = None
    idx = None
    for i in range(kh):
        for j in range(kw):
            sl = xp[
                ...,
                i : i + (Ho - 1) * sh + 1 : sh,
                j : j + (Wo - 1) * sw + 1 : sw,
                :,
            ]
            code = jnp.uint8(i * kw + j)
            if best is None:
                best, idx = sl, jnp.full(sl.shape, code, jnp.uint8)
            else:
                win = sl > best  # strict: first max wins (torch semantics)
                best = jnp.maximum(best, sl)
                idx = jnp.where(win, code, idx)
    return best, idx


def _max_pool_2d_argmax_fwd(x, kernel_hw, stride_hw, pad_hw, x_hw, x_dtype):
    y, idx = _max_pool_2d_fwd_impl(x, kernel_hw, stride_hw, pad_hw)
    return y, idx


def _max_pool_2d_argmax_bwd(kernel_hw, stride_hw, pad_hw, x_hw, x_dtype, res, dy):
    idx = res
    kh, kw = kernel_hw
    sh, sw = stride_hw
    ph, pw = pad_hw
    H, W = x_hw
    _, Ho, Hp_r = _pool_geom(H, kh, sh, ph)
    _, Wo, Wp_r = _pool_geom(W, kw, sw, pw)
    Mh = Hp_r // sh  # class length along H
    Mw = Wp_r // sw
    dh_max = (kh - 1) // sh  # max window back-offset per dim
    dw_max = (kw - 1) // sw
    lead = [(0, 0)] * (dy.ndim - 3)
    # Left-pad by d_max so w = m - d indexes at static offset; right-pad so
    # every class slice [off : off + M] is in range. Sentinel 255 in idx
    # never matches a tap code, so padded windows contribute zero.
    dyp = jnp.pad(
        dy,
        lead + [(dh_max, Mh + dh_max - Ho), (dw_max, Mw + dw_max - Wo), (0, 0)],
    )
    idxp = jnp.pad(
        idx,
        lead + [(dh_max, Mh + dh_max - Ho), (dw_max, Mw + dw_max - Wo), (0, 0)],
        constant_values=jnp.uint8(255),
    )
    dz = jnp.asarray(0, dy.dtype)
    rows = []
    for rh in range(sh):
        cols = []
        for rw in range(sw):
            # A residue class with no covering window (stride > kernel
            # gap positions) gets zero gradient.
            acc = jnp.zeros(
                dyp.shape[:-3] + (Mh, Mw, dyp.shape[-1]), dy.dtype
            )
            for dh in range(max(0, (kh - 1 - rh) // sh + 1)):
                for dw in range(max(0, (kw - 1 - rw) // sw + 1)):
                    tap = jnp.uint8((rh + sh * dh) * kw + (rw + sw * dw))
                    oh = dh_max - dh
                    ow = dw_max - dw
                    dsl = dyp[..., oh : oh + Mh, ow : ow + Mw, :]
                    isl = idxp[..., oh : oh + Mh, ow : ow + Mw, :]
                    acc = acc + jnp.where(isl == tap, dsl, dz)
            cols.append(acc)
        # Interleave the sw residue classes along W: (..., Mh, Mw, sw, C).
        row = jnp.stack(cols, axis=-2)  # (..., Mh, Mw, sw, C)
        rows.append(row.reshape(row.shape[:-3] + (Mw * sw, row.shape[-1])))
    out = jnp.stack(rows, axis=-3)  # (..., Mh, sh, Wp_r, C)
    out = out.reshape(out.shape[:-4] + (Mh * sh, Wp_r, out.shape[-1]))
    dx = out[..., ph : ph + H, pw : pw + W, :].astype(x_dtype)
    return (dx,)


_max_pool_2d_argmax.defvjp(_max_pool_2d_argmax_fwd, _max_pool_2d_argmax_bwd)

# Default ON for the hot stem pools; SF_POOL_VJP=chain restores the
# autodiff'd max-chain backward for A/B.
_POOL_VJP = _os.environ.get("SF_POOL_VJP", "argmax")


def max_pool3d_fast(x, kernel, stride, padding=(0, 0, 0)):
    """Max pool; spatial-only pools use the slice formulation (argmax
    custom-VJP backward by default), small-C additionally pools in
    T-folded layout for full lanes."""
    B, T, H, W, C = x.shape
    kt, kh, kw = kernel
    pool2d = (
        max_pool_2d_argmax if _POOL_VJP == "argmax" else max_pool_2d_slices
    )
    if kt == 1:
        if C < SMALL_C:
            xf = fold_time(x)
            y = pool2d(
                xf, (kh, kw), (stride[1], stride[2]), (padding[1], padding[2])
            )
            return unfold_time(y, T)
        y = pool2d(
            x.reshape(B * T, H, W, C),
            (kh, kw),
            (stride[1], stride[2]),
            (padding[1], padding[2]),
        )
        return y.reshape((B, T) + y.shape[1:])
    if kh == 1 and kw == 1:
        # Temporal-only pool (POOL1 [2,1,1]).
        if _POOL_VJP == "argmax":
            xr = x.reshape(B, T, 1, H * W * C)
            y = max_pool_2d_argmax(
                xr, (kt, 1), (stride[0], 1), (padding[0], 0)
            )
            return y.reshape(B, y.shape[1], H, W, C)
        neg = jnp.asarray(-jnp.inf, jnp.float32).astype(x.dtype)
        xp = jnp.pad(
            x, [(0, 0), (padding[0], padding[0]), (0, 0), (0, 0), (0, 0)],
            constant_values=neg,
        )
        To = (T + 2 * padding[0] - kt) // stride[0] + 1
        out = None
        for d in range(kt):
            sl = xp[:, d : d + (To - 1) * stride[0] + 1 : stride[0]]
            out = sl if out is None else jnp.maximum(out, sl)
        return out
    return jax.lax.reduce_window(
        x,
        -jnp.inf,
        jax.lax.max,
        (1, kt, kh, kw, 1),
        (1,) + tuple(stride) + (1,),
        [(0, 0)] + [(p, p) for p in padding] + [(0, 0)],
    )


# ---------------------------------------------------------------------------
# Folded-layout convolutions: input/output stay (B, H, W, T*C).
#
# Small-channel pathways (SlowFast fast path, C=8..64) waste up to 16x
# memory bandwidth in channels-last tiling (C pads to 128 lanes). Folding T
# into channels makes every elementwise/BN/conv op run at full lane width;
# convs become block-diagonal (spatial) or block-Toeplitz (temporal) dense
# matmuls — padded FLOPs, but the MXU runs them at full throughput.
# ---------------------------------------------------------------------------

def _blockdiag_weights(w2d, T):
    """(kh,kw,C,Co) -> (kh,kw,T*C,T*Co) with per-t identical diagonal blocks."""
    kh, kw, C, Co = w2d.shape
    eye = jnp.eye(T, dtype=w2d.dtype)
    Wb = jnp.einsum("ts,hwio->hwtiso", eye, w2d).reshape(kh, kw, T * C, T * Co)
    return Wb


def folded_conv(xf, w, T, stride=(1, 1, 1), padding=(0, 0, 0), groups=1):
    """Conv on a folded (B, H, W, T*C) tensor with logical 3D weights.

    Supports spatial-only, temporal-only, and pointwise kernels (the shapes
    appearing in ResNet-family blocks). Depthwise/grouped kernels fall back
    to unfold -> video_conv -> fold.
    """
    kt, kh, kw = w.shape[0], w.shape[1], w.shape[2]
    st, sh, sw = stride
    pt, ph, pw = padding
    if groups > 1 or (kt > 1 and (kh > 1 or kw > 1)):
        x = unfold_time(xf, T)
        y = video_conv(x, w, stride, padding, groups)
        return fold_time(y), y.shape[1]
    if kt == 1:
        Wb = _blockdiag_weights(w[0], T)
        y = _conv2d(xf, Wb, (sh, sw), (ph, pw))
        return y, T
    # temporal-only: pad T inside the folded channel dim via unfold-free
    # block-Toeplitz weights over the padded extent.
    B, H, W, TC = xf.shape
    C = TC // T
    if pt > 0:
        # Zero-pad the folded channel dim at block granularity.
        xf = jnp.pad(xf, [(0, 0), (0, 0), (0, 0), (pt * C, pt * C)])
    Wb, Tout = _toeplitz_weights(w, T, st, pt)
    y = _conv2d(xf, Wb[0:1, 0:1].reshape(1, 1, *Wb.shape[2:]), (1, 1), (0, 0))
    return y, Tout
