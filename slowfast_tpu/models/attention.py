"""MViT pooling attention (reference slowfast/models/attention.py:13-514).

TPU-native notes:
  * tokens stay (B, N, heads*head_dim) END TO END — there is no
    (B, heads, N, d) materialization anywhere. The reference's per-block
    q/k/v layout flips (reshape+transpose into a heads-major layout, then
    (B*heads, T, H, W, d) for pooling and back) cost ~30% of an MViTv2-S
    step on v5e as pure HBM copies; here the head split lives only inside
    einsum contraction specs (fused into the matmuls by XLA) and the
    pooling conv runs directly on the (B, T, H, W, heads*d) clip with the
    shared per-head depthwise weights tiled across heads (a weight-side
    transform, zero data movement).
  * the attention matmuls run through einsum with fp32 accumulation; the
    decomposed relative-position bias is folded into the q.k contraction
    as augmented channels (see _augment_qk_relpos) — matmul-only forward
    and backward.
  * all shape decisions (pool schedules, rel-pos interpolation) happen at
    trace time, so XLA sees fully static shapes.
"""

import math
from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from .common import Conv3DParam, Mlp, drop_path

# MViT's unusual init convention (reference video_model_builder.py:1085-1092):
# Linear/conv weights trunc_normal(0.02), Linear & LayerNorm biases = 0.02.
trunc02 = nn.initializers.truncated_normal(0.02, lower=-2.0, upper=2.0)
bias02 = nn.initializers.constant(0.02)


def pool_tokens_flat(x, thw, kernel, stride, mode, has_cls, pool_w=None,
                     heads=1):
    """Pool (B, L, C) tokens spatially/temporally WITHOUT a head split.

    C = heads * dim_conv; ``pool_w`` is the shared per-head depthwise
    kernel (kt, kh, kw, 1, dim_conv), tiled across heads channel-wise
    (channel c uses tap c % dim_conv — the head axis is slowest in the
    (heads, d) feature decomposition, matching the reference's shared
    Conv3d(groups=head_dim) applied per head). Returns (pooled, new_thw).
    """
    if not kernel:
        return x, thw
    B, L, C = x.shape
    cls_tok = None
    if has_cls:
        cls_tok, x = x[:, :1], x[:, 1:]
    T, H, W = thw
    x4 = x.reshape(B, T, H, W, C)
    if mode in ("avg", "max"):
        pad = [(k // 2, k // 2) for k in kernel]
        op = nn.max_pool if mode == "max" else nn.avg_pool
        y = op(x4, tuple(kernel), tuple(stride), pad)
    else:  # conv
        from slowfast_tpu.ops.video_conv import video_conv

        w = pool_w
        if heads > 1:
            w = jnp.tile(w, (1, 1, 1, 1, heads))
        y = video_conv(
            x4,
            w.astype(x.dtype),
            stride=tuple(stride),
            padding=tuple(k // 2 for k in kernel),
            groups=C,
        )
    new_thw = list(y.shape[1:4])
    y = y.reshape(B, -1, C)
    if has_cls:
        y = jnp.concatenate([cls_tok, y], axis=1)
    return y, new_thw


def _pool_tokens(x, thw, kernel, stride, mode, has_cls, pool_conv=None):
    """Legacy (B, nh, L, C) pooling — kept for max-mode residual paths."""
    if not kernel:
        return x, thw
    B, nh, L, C = x.shape
    y, new_thw = pool_tokens_flat(
        x.reshape(B * nh, L, C), thw, kernel, stride, mode, has_cls
    )
    return y.reshape(B, nh, -1, C), new_thw


def _resize_rel_pos(rel_pos, d):
    """Linear-resize a (L, C) rel-pos table to (d, C) if needed
    (reference attention.py:48-61)."""
    if rel_pos.shape[0] == d:
        return rel_pos
    return jax.image.resize(rel_pos, (d, rel_pos.shape[1]), method="linear")


def _rel_dist(q_size, k_size):
    """Relative-distance index matrix with q/k ratio rescaling
    (reference attention.py:72-85)."""
    q_ratio = max(k_size / q_size, 1.0)
    k_ratio = max(q_size / k_size, 1.0)
    dist = (
        np.arange(q_size)[:, None] * q_ratio - np.arange(k_size)[None, :] * k_ratio
    )
    dist += (k_size - 1) * k_ratio
    return jnp.asarray(dist.astype(np.int64))


def _augment_qk_relpos(q, k, scale, has_cls, q_shape, k_shape,
                       rel_pos_h, rel_pos_w, rel_pos_t):
    """Fold decomposed rel-pos into augmented q/k for a single matmul.

    q, k: (B, N, heads, d). attn[q, k] = scale*q.k + rel_h_q[q, kh(k)]
    + rel_w_q[q, kw(k)] + rel_t_q[q, kt(k)]; the bias terms become extra
    contraction channels: q gains the per-axis bias rows, k gains the
    matching one-hot position indicators (zeros on the cls row/col ->
    bias 0, matching the reference's sp: slicing).
    """
    sp = 1 if has_cls else 0
    q_t, q_h, q_w = q_shape
    k_t, k_h, k_w = k_shape
    B, Nq, nh, C = q.shape
    Nk = k.shape[1]
    r_q = q[:, sp:].reshape(B, q_t, q_h, q_w, nh, C)

    extras_q = []
    extras_k = []

    def onehot_axis(axis_len, period, block):
        # For raveled k index (kt, kh, kw): axis position cycles with the
        # given block size; build (Nk_core, axis_len) one-hot as a constant.
        idx = (np.arange(k_t * k_h * k_w) // block) % period
        return jnp.asarray(np.eye(axis_len, dtype=np.float32)[idx])

    if rel_pos_h is not None:
        Rh = _resize_rel_pos(rel_pos_h, 2 * max(q_h, k_h) - 1)[_rel_dist(q_h, k_h)]
        Rw = _resize_rel_pos(rel_pos_w, 2 * max(q_w, k_w) - 1)[_rel_dist(q_w, k_w)]
        rel_h_q = jnp.einsum(
            "bxyznc,ykc->bxyznk", r_q, Rh.astype(r_q.dtype)
        )
        rel_w_q = jnp.einsum(
            "bxyznc,zkc->bxyznk", r_q, Rw.astype(r_q.dtype)
        )
        extras_q += [
            rel_h_q.reshape(B, Nq - sp, nh, k_h),
            rel_w_q.reshape(B, Nq - sp, nh, k_w),
        ]
        extras_k += [onehot_axis(k_h, k_h, k_w), onehot_axis(k_w, k_w, 1)]
    if rel_pos_t is not None:
        Rt = _resize_rel_pos(rel_pos_t, 2 * max(q_t, k_t) - 1)[_rel_dist(q_t, k_t)]
        rel_t_q = jnp.einsum(
            "bxyznc,xkc->bxyznk", r_q, Rt.astype(r_q.dtype)
        )
        extras_q.append(rel_t_q.reshape(B, Nq - sp, nh, k_t))
        extras_k.append(onehot_axis(k_t, k_t, k_h * k_w))

    eq = jnp.concatenate(extras_q, axis=-1)  # (B, Nq-sp, nh, extra)
    if sp:
        eq = jnp.pad(eq, ((0, 0), (sp, 0), (0, 0), (0, 0)))
    ek = jnp.concatenate(extras_k, axis=-1)  # (Nk_core, extra)
    if sp:
        ek = jnp.pad(ek, ((sp, 0), (0, 0)))
    ek = jnp.broadcast_to(ek[None, :, None, :], (B, Nk, nh) + ek.shape[-1:])

    q_aug = jnp.concatenate([q * scale, eq.astype(q.dtype)], axis=-1)
    k_aug = jnp.concatenate([k, ek.astype(k.dtype)], axis=-1)
    return q_aug, k_aug


class _QKVProj(nn.Module):
    """Fused-parameter qkv projection computed as THREE gemms over weight
    slices.

    Parameter layout is identical to ``nn.Dense(3*features, name="qkv")``
    (one (C, 3C) kernel + (3C,) bias), so checkpoints and the reference
    import path (attention.py:173 ``self.qkv``) are unchanged — but the
    (B, N, 3C) activation is never materialized and re-sliced: the step
    profile showed those slices as a full extra HBM round trip of the
    widest activation in every early attention block. Slicing the (C, 3C)
    WEIGHT instead is ~N/C times cheaper.
    """

    features: int  # per-member output dim
    use_bias: bool = False
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        C = x.shape[-1]
        F = self.features
        kernel = self.param("kernel", trunc02, (C, 3 * F), jnp.float32)
        bias = (
            self.param("bias", bias02, (3 * F,), jnp.float32)
            if self.use_bias
            else None
        )
        x, kernel, bias = nn.dtypes.promote_dtype(
            x, kernel, bias, dtype=self.dtype
        )
        outs = []
        for i in range(3):
            w = jax.lax.slice_in_dim(kernel, i * F, (i + 1) * F, axis=1)
            o = x @ w
            if bias is not None:
                o = o + jax.lax.slice_in_dim(bias, i * F, (i + 1) * F, axis=0)
            outs.append(o)
        return outs


@jax.custom_vjp
def _attention_core(q_in, k_in, vh):
    """softmax(q k^T) v with compute-dtype HBM intermediates.

    XLA's default VJP of softmax(einsum) materializes the (Nq, Nk) logits,
    probabilities, dp and dlogits ALL in fp32 — ~60% of an MViTv2-S step's
    HBM traffic on v5e (the matrices reach (16, 2, 6272, 392) per block).
    This custom VJP keeps every HBM-resident (Nq, Nk) tensor in the compute
    dtype (bf16 in mixed precision: half the bytes) while all contractions
    and the softmax itself still accumulate in fp32. In fp32 runs every
    cast is a no-op, so parity tests see identical math.
    """
    out, _ = _attention_core_fwd(q_in, k_in, vh)
    return out


def _attention_core_fwd(q_in, k_in, vh):
    dtype = vh.dtype
    logits = jnp.einsum(
        "bqnc,bknc->bnqk", q_in, k_in, preferred_element_type=jnp.float32
    )
    # Constant-shift unnormalized softmax: any constant cancels in p = e/s,
    # so the row-max reduction pass is skipped — exp fuses into the matmul
    # epilogue and the fp32 logits never make a second HBM round trip. The
    # min(50) clamp guards exp overflow (logits are O(10) in practice;
    # beyond the clamp the softmax is saturated anyway), and the s floor
    # turns an all-underflow row into a zero output instead of NaN.
    e = jnp.exp(jnp.minimum(logits, 50.0) - 20.0)
    e16 = e.astype(dtype)
    s = jnp.maximum(
        jnp.sum(e, axis=-1, keepdims=True), 1e-30
    )  # (B, nh, Nq, 1) fp32
    o = jnp.einsum(
        "bnqk,bknc->bqnc", e16, vh, preferred_element_type=jnp.float32
    )
    s_q = jnp.transpose(s, (0, 2, 1, 3))  # (B, Nq, nh, 1)
    out = (o / s_q).astype(dtype)
    return out, (q_in, k_in, vh, e16, s, out)


def _attention_core_bwd(res, do):
    q_in, k_in, vh, e16, s, out = res
    dtype = vh.dtype
    s_q = jnp.transpose(s, (0, 2, 1, 3))  # (B, Nq, nh, 1)
    # Fold the softmax denominator into do once (small tensor): with
    # do_n = do/s, dv = e^T do_n and dpn = do_n v^T = dp/s, so
    # dl = p (dp - <dp, p>) = e16 * (dpn - <dp, p>/s).
    do32 = do.astype(jnp.float32)
    do_n = (do32 / s_q).astype(dtype)
    dv = jnp.einsum(
        "bnqk,bqnc->bknc", e16, do_n, preferred_element_type=jnp.float32
    ).astype(dtype)
    dpn = jnp.einsum(
        "bqnc,bknc->bnqk", do_n, vh, preferred_element_type=jnp.float32
    )
    # Flash-attention "delta" trick: <dp, p> = rowsum(do * out) — an
    # O(Nq*c) reduction over ALREADY-SMALL tensors instead of the
    # O(Nq*Nk) fp32 product sum(dpn * e16) it replaces. That fp32 upcast
    # of e16 plus the fp32 dl materialization were the two largest
    # convert_element_type ops in the step profile (~2 GB of HBM traffic
    # per early block); with D the entire (Nq, Nk) backward chain stays
    # in the compute dtype: dpn's cast fuses into its matmul epilogue,
    # and dl is produced directly in bf16.
    # (An earlier variant forcing bf16 via optimization barriers around
    # the fp32 chain measured SLOWER, 72.9 vs 74.4 clips/s — the win
    # comes from never computing in fp32, not from converting earlier.)
    d_row = jnp.sum(do32 * out.astype(jnp.float32), axis=-1, keepdims=True)
    d_row = jnp.transpose(d_row, (0, 2, 1, 3))  # (B, nh, Nq, 1)
    # The subtraction stays in fp32: dpn ~= <dp, p> on converged rows, so
    # rounding each operand to bf16 BEFORE subtracting would leave the
    # cancellation with relative error of order 2^-8 of dpn rather than of
    # the difference (ADVICE r4). Only dl itself is cast down; XLA fuses
    # the fp32 chain into dpn's matmul epilogue, so no fp32 (Nq, Nk)
    # tensor is HBM-resident (verified on-chip: 95.9 vs 95.7 clips/s).
    dl = (e16.astype(jnp.float32) * (dpn - d_row / s)).astype(dtype)
    dq = jnp.einsum(
        "bnqk,bknc->bqnc", dl, k_in, preferred_element_type=jnp.float32
    ).astype(q_in.dtype)
    dk = jnp.einsum(
        "bnqk,bqnc->bknc", dl, q_in, preferred_element_type=jnp.float32
    ).astype(k_in.dtype)
    return dq, dk, dv


_attention_core.defvjp(_attention_core_fwd, _attention_core_bwd)


class MultiScaleAttention(nn.Module):
    """Pooling attention (reference attention.py:150-392)."""

    dim: int
    dim_out: int
    input_size: Sequence[int]
    num_heads: int = 8
    qkv_bias: bool = False
    drop_rate: float = 0.0
    kernel_q: Tuple[int, ...] = ()
    kernel_kv: Tuple[int, ...] = ()
    stride_q: Tuple[int, ...] = ()
    stride_kv: Tuple[int, ...] = ()
    has_cls_embed: bool = True
    mode: str = "conv"
    pool_first: bool = False
    rel_pos_spatial: bool = False
    rel_pos_temporal: bool = False
    rel_pos_zero_init: bool = False
    residual_pooling: bool = False
    separate_qkv: bool = False
    use_pallas_attention: bool = False
    fused_attention: bool = False
    dtype: Any = None

    def _pool_param(self, kernel, dim_conv, name):
        if self.mode not in ("conv", "conv_unshared") or not kernel:
            return None
        return Conv3DParam(
            features=dim_conv,
            kernel=tuple(kernel),
            kernel_init=trunc02,
            name=name,
        )(1)

    @staticmethod
    def _apply_ln_heads(ln, x, heads):
        """Apply a LayerNorm over the per-head feature dim of
        (B, L, heads*d); ``ln`` is a bound module so reuse shares weights."""
        B, L, C = x.shape
        if heads == 1:
            return ln(x)
        return ln(x.reshape(B, L, heads, C // heads)).reshape(B, L, C)

    @nn.compact
    def __call__(self, x, thw_shape, deterministic: bool = True, res_input=None):
        """res_input: optional tensor to pool with the shared Q-pool conv
        (Rev-MViT StageTransitionBlock residual path, reference
        reversible_mvit.py:352-366). When given, returns
        (out, q_shape, pooled_res)."""
        B, N, _ = x.shape
        nh = self.num_heads
        head_dim = self.dim_out // nh
        scale = head_dim ** -0.5
        # Skip no-op pooling (reference :197-200).
        kq = () if np.prod(self.kernel_q or (1,)) == 1 and np.prod(
            self.stride_q or (1,)
        ) == 1 else tuple(self.kernel_q)
        kkv = () if np.prod(self.kernel_kv or (1,)) == 1 and np.prod(
            self.stride_kv or (1,)
        ) == 1 else tuple(self.kernel_kv)

        conv_mode = self.mode in ("conv", "conv_unshared")
        # conv: one shared depthwise kernel per head; conv_unshared: every
        # channel its own tap (heads factor 1 in the tiling).
        if self.mode == "conv":
            dim_conv = (self.dim if self.pool_first else self.dim_out) // nh
            tile_heads = nh
        else:
            dim_conv = self.dim if self.pool_first else self.dim_out
            tile_heads = 1
        w_q = self._pool_param(kq, dim_conv, "pool_q")
        w_k = self._pool_param(kkv, dim_conv, "pool_k")
        w_v = self._pool_param(kkv, dim_conv, "pool_v")

        dense = lambda feats, name: nn.Dense(
            feats,
            use_bias=self.qkv_bias,
            kernel_init=trunc02,
            bias_init=bias02,
            dtype=self.dtype,
            name=name,
        )

        # Tensor partitioning: channels are head-major, so pinning them to
        # the "model" mesh axis runs heads on separate chips (no-op off).
        from slowfast_tpu.parallel.mesh import constrain_channels

        if self.pool_first:
            q = k = v = x
        else:
            if not self.separate_qkv:
                # feature decomposition (3, heads, d): member-major
                # weight slices, three gemms (see _QKVProj).
                q, k, v = _QKVProj(
                    self.dim_out,
                    use_bias=self.qkv_bias,
                    dtype=self.dtype,
                    name="qkv",
                )(x)
            else:
                q = dense(self.dim_out, "q")(x)
                k = dense(self.dim_out, "k")(x)
                v = dense(self.dim_out, "v")(x)
            q, k, v = (
                constrain_channels(q),
                constrain_channels(k),
                constrain_channels(v),
            )

        pool = lambda t, kern, strd, w: pool_tokens_flat(
            t, thw_shape, kern, strd, self.mode, self.has_cls_embed,
            pool_w=w, heads=tile_heads,
        )
        q, q_shape = pool(q, kq, self.stride_q, w_q)
        k, k_shape = pool(k, kkv, self.stride_kv, w_k)
        v, v_shape = pool(v, kkv, self.stride_kv, w_v)
        ln_heads = nh if self.mode == "conv" else 1
        # dtype on the pool norms: LN statistics still accumulate in fp32
        # (flax computes in promoted precision) but the OUTPUT stays in the
        # compute dtype — without it q/k/v silently promote to fp32 and
        # every attention matmul runs as multi-pass fp32 MXU emulation.
        ln_q = (
            nn.LayerNorm(
                epsilon=1e-6, bias_init=bias02, dtype=self.dtype,
                name="norm_q",
            )
            if conv_mode and kq
            else None
        )
        if conv_mode:
            if kq:
                q = self._apply_ln_heads(ln_q, q, ln_heads)
            if kkv:
                k = self._apply_ln_heads(
                    nn.LayerNorm(
                        epsilon=1e-6, bias_init=bias02, dtype=self.dtype,
                        name="norm_k",
                    ),
                    k, ln_heads,
                )
                v = self._apply_ln_heads(
                    nn.LayerNorm(
                        epsilon=1e-6, bias_init=bias02, dtype=self.dtype,
                        name="norm_v",
                    ),
                    v, ln_heads,
                )

        if self.pool_first:
            q = constrain_channels(dense(self.dim_out, "q")(q))
            k = constrain_channels(dense(self.dim_out, "k")(k))
            v = constrain_channels(dense(self.dim_out, "v")(v))

        Nq, Nk = q.shape[1], k.shape[1]
        qh = q.reshape(B, Nq, nh, head_dim)
        kh = k.reshape(B, Nk, nh, head_dim)
        vh = v.reshape(B, Nk, nh, head_dim)

        rel_pos_h = rel_pos_w = rel_pos_t = None
        init = nn.initializers.zeros if self.rel_pos_zero_init else trunc02
        if self.rel_pos_spatial:
            rel_sp_dim = 2 * max(
                self.input_size[1] // (self.stride_q[1] if self.stride_q else 1),
                self.input_size[1] // (self.stride_kv[1] if self.stride_kv else 1),
            ) - 1
            rel_pos_h = self.param("rel_pos_h", init, (rel_sp_dim, head_dim))
            rel_pos_w = self.param("rel_pos_w", init, (rel_sp_dim, head_dim))
        if self.rel_pos_temporal:
            rel_pos_t = self.param(
                "rel_pos_t", init, (2 * self.input_size[0] - 1, head_dim)
            )
        if self.rel_pos_spatial or self.rel_pos_temporal:
            # Augmented-matmul rel-pos: fold the decomposed bias into the
            # q.k^T contraction by appending per-axis bias rows to q and
            # one-hot position indicators to k — ONE MXU matmul computes
            # logits + bias, with matmul-only backward (no (Nq x Nk) bias
            # materialization or broadcast-reduce VJPs; those cost ~45% of
            # an MViTv2-S step on v5e).
            q_in, k_in = _augment_qk_relpos(
                qh, kh, scale, self.has_cls_embed, q_shape, k_shape,
                rel_pos_h, rel_pos_w, rel_pos_t,
            )
        else:
            q_in, k_in = qh * scale, kh
        if self.use_pallas_attention:
            # Round-2 Pallas pooled-attention kernel: the (Nq, Nk) logits
            # matrix never touches HBM (ops/pallas_attention.py). Kept for
            # A/B; the fused aligned kernel below supersedes it.
            from slowfast_tpu.ops.pallas_attention import pooled_attention

            xo = pooled_attention(q_in, k_in, vh).astype(v.dtype)
        elif self.fused_attention and jax.default_backend() == "tpu":
            # True-flash kernel: NO (Nq, Nk) tensor in HBM in either pass
            # (the backward recomputes probabilities per q-tile in VMEM).
            # MEASURED NEGATIVE on v5e (kept for A/B, off by default):
            # 76.4 vs 95.7 clips/s MViTv2-S — the XLA path's attention
            # dots already stream at ~610 GB/s (~81% of effective HBM
            # peak) and fuse exp/scale into the matmul epilogues, while
            # the custom-call boundary un-fuses the surrounding chains
            # and pays rel-pos-augmented per-head padding copies.
            from slowfast_tpu.ops.pallas_attention import (
                flash_pooled_attention,
            )

            xo = flash_pooled_attention(
                q_in, k_in, vh.astype(q_in.dtype)
            )
        else:
            xo = _attention_core(q_in, k_in, vh.astype(q_in.dtype))
        if self.residual_pooling:
            # MViTv2 residual pooling (reference :381-385): skip cls token.
            if self.has_cls_embed:
                xo = jnp.concatenate(
                    [xo[:, :1], xo[:, 1:] + qh[:, 1:]], axis=1
                )
            else:
                xo = xo + qh

        x = xo.reshape(B, Nq, self.dim_out)
        x = nn.Dense(
            self.dim_out,
            kernel_init=trunc02,
            bias_init=bias02,
            dtype=self.dtype,
            name="proj",
        )(x)
        if self.drop_rate > 0.0:
            x = nn.Dropout(self.drop_rate)(x, deterministic=deterministic)

        if res_input is not None:
            # Pool the residual with the SAME conv + norm as Q (weight
            # sharing with pool_q/norm_q, reference reversible_mvit.py:352).
            r, _ = pool(res_input, kq, self.stride_q, w_q)
            if ln_q is not None:
                r = self._apply_ln_heads(ln_q, r, ln_heads)
            return x, q_shape, r
        return x, q_shape


class MultiScaleBlock(nn.Module):
    """Pre-LN transformer block with pooled attention and pooled residual.

    Reference: attention.py:395-514.
    """

    dim: int
    dim_out: int
    num_heads: int
    input_size: Sequence[int]
    mlp_ratio: float = 4.0
    qkv_bias: bool = False
    drop_rate: float = 0.0
    droppath_rate: float = 0.0
    layer_scale_init_value: float = 0.0
    kernel_q: Tuple[int, ...] = ()
    kernel_kv: Tuple[int, ...] = ()
    stride_q: Tuple[int, ...] = ()
    stride_kv: Tuple[int, ...] = ()
    mode: str = "conv"
    has_cls_embed: bool = True
    pool_first: bool = False
    rel_pos_spatial: bool = False
    rel_pos_temporal: bool = False
    rel_pos_zero_init: bool = False
    residual_pooling: bool = False
    dim_mul_in_att: bool = False
    separate_qkv: bool = False
    use_pallas_attention: bool = False
    fused_attention: bool = False
    dtype: Any = None

    @nn.compact
    def __call__(self, x, thw_shape, deterministic: bool = True):
        att_dim = self.dim_out if self.dim_mul_in_att else self.dim
        x_norm = nn.LayerNorm(epsilon=1e-6, bias_init=bias02, name="norm1")(x)
        x_block, thw_new = MultiScaleAttention(
            dim=self.dim,
            dim_out=att_dim,
            input_size=self.input_size,
            num_heads=self.num_heads,
            qkv_bias=self.qkv_bias,
            drop_rate=self.drop_rate,
            kernel_q=self.kernel_q,
            kernel_kv=self.kernel_kv,
            stride_q=self.stride_q,
            stride_kv=self.stride_kv,
            has_cls_embed=self.has_cls_embed,
            mode=self.mode,
            pool_first=self.pool_first,
            rel_pos_spatial=self.rel_pos_spatial,
            rel_pos_temporal=self.rel_pos_temporal,
            rel_pos_zero_init=self.rel_pos_zero_init,
            residual_pooling=self.residual_pooling,
            separate_qkv=self.separate_qkv,
            use_pallas_attention=self.use_pallas_attention,
            fused_attention=self.fused_attention,
            dtype=self.dtype,
            name="attn",
        )(x_norm, thw_shape, deterministic=deterministic)

        if self.layer_scale_init_value > 0:
            gamma_1 = self.param(
                "gamma_1",
                nn.initializers.constant(self.layer_scale_init_value),
                (att_dim,),
            )
            x_block = gamma_1 * x_block

        if self.dim_mul_in_att and self.dim != self.dim_out:
            x = nn.Dense(
                self.dim_out, kernel_init=trunc02, bias_init=bias02,
                dtype=self.dtype, name="proj",
            )(x_norm)

        # Pooled residual path (max-pool skip, reference :421-424,496-498).
        stride_skip = tuple(self.stride_q)
        if stride_skip and np.prod(stride_skip) > 1:
            kernel_skip = tuple(s + 1 if s > 1 else s for s in stride_skip)
            x_res, _ = pool_tokens_flat(
                x, thw_shape, kernel_skip, stride_skip, "max",
                self.has_cls_embed,
            )
        else:
            x_res = x

        if self.droppath_rate > 0.0 and not deterministic:
            x_block = drop_path(x_block, self.droppath_rate, self.make_rng("dropout"))
        x = x_res + x_block

        x_norm = nn.LayerNorm(epsilon=1e-6, bias_init=bias02, name="norm2")(x)
        x_mlp = Mlp(
            hidden_features=int(att_dim * self.mlp_ratio),
            out_features=self.dim_out,
            drop_rate=self.drop_rate,
            bias_init=bias02,
            dtype=self.dtype,
            name="mlp",
        )(x_norm, deterministic=deterministic)
        if self.layer_scale_init_value > 0:
            gamma_2 = self.param(
                "gamma_2",
                nn.initializers.constant(self.layer_scale_init_value),
                (self.dim_out,),
            )
            x_mlp = gamma_2 * x_mlp
        if not self.dim_mul_in_att and self.dim != self.dim_out:
            x = nn.Dense(
                self.dim_out, kernel_init=trunc02, bias_init=bias02,
                dtype=self.dtype, name="proj",
            )(x_norm)
        if self.droppath_rate > 0.0 and not deterministic:
            x_mlp = drop_path(x_mlp, self.droppath_rate, self.make_rng("dropout"))
        x = x + x_mlp
        return x, thw_new
