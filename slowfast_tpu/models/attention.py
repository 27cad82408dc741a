"""MViT pooling attention (reference slowfast/models/attention.py:13-514).

TPU-native notes:
  * tokens stay (B, N, C); pooling reshapes to (B*heads, T, H, W, head_dim)
    NTHWC and uses a depthwise conv / avg / max pool — all MXU/VPU friendly.
  * the attention matmuls run through einsum with fp32 accumulation; the
    decomposed relative-position bias is added as rank-structured einsum
    terms (no (N x M x C) materialization beyond the attention logits).
  * all shape decisions (pool schedules, rel-pos interpolation) happen at
    trace time, so XLA sees fully static shapes.
"""

import math
from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from .common import Mlp, drop_path

# MViT's unusual init convention (reference video_model_builder.py:1085-1092):
# Linear/conv weights trunc_normal(0.02), Linear & LayerNorm biases = 0.02.
trunc02 = nn.initializers.truncated_normal(0.02, lower=-2.0, upper=2.0)
bias02 = nn.initializers.constant(0.02)


def _pool_tokens(x, thw, kernel, stride, mode, has_cls, pool_conv=None):
    """Pool (B, H_heads, L, C) tokens spatially/temporally.

    Returns (pooled tokens, new thw). ``pool_conv`` is a bound flax module
    (depthwise conv) when mode == 'conv'.
    """
    if not kernel:
        return x, thw
    B, nh, L, C = x.shape
    cls_tok = None
    if has_cls:
        cls_tok, x = x[:, :, :1, :], x[:, :, 1:, :]
    T, H, W = thw
    x = x.reshape(B * nh, T, H, W, C)
    if mode in ("avg", "max"):
        pad = [(k // 2, k // 2) for k in kernel]
        op = nn.max_pool if mode == "max" else nn.avg_pool
        x = op(x, tuple(kernel), tuple(stride), pad)
    else:  # conv
        x = pool_conv(x)
    new_thw = list(x.shape[1:4])
    x = x.reshape(B, nh, -1, C)
    if has_cls:
        x = jnp.concatenate([cls_tok, x], axis=2)
    return x, new_thw


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


def rel_pos_bias(
    q, has_cls, q_shape, k_shape,
    rel_pos_h=None, rel_pos_w=None, rel_pos_t=None,
):
    """Combined decomposed rel-pos bias, built flat in ONE fused pass.

    Equivalent to the reference's sequential spatial+temporal updates
    (attention.py:64-147) but without slicing/scattering the attention
    matrix: the (Nq, Nk) bias is assembled from the three rank-structured
    einsum terms and zero-padded for the cls row/col (cls gets +0 in the
    reference too, since updates only touch attn[..., sp:, sp:]).
    Avoids the f32 dynamic-update-slice copies of the full attention
    matrix (~6.5 ms each at MViTv2-S block sizes on v5e).
    """
    sp = 1 if has_cls else 0
    q_t, q_h, q_w = q_shape
    k_t, k_h, k_w = k_shape
    B, nh = q.shape[:2]
    r_q = q[:, :, sp:].reshape(B, nh, q_t, q_h, q_w, -1)

    terms = []
    if rel_pos_h is not None:
        Rh = _resize_rel_pos(rel_pos_h, 2 * max(q_h, k_h) - 1)[_rel_dist(q_h, k_h)]
        Rw = _resize_rel_pos(rel_pos_w, 2 * max(q_w, k_w) - 1)[_rel_dist(q_w, k_w)]
        rel_h = jnp.einsum("bythwc,hkc->bythwk", r_q, Rh.astype(r_q.dtype))
        rel_w = jnp.einsum("bythwc,wkc->bythwk", r_q, Rw.astype(r_q.dtype))
        terms.append(rel_h[:, :, :, :, :, None, :, None])
        terms.append(rel_w[:, :, :, :, :, None, None, :])
    if rel_pos_t is not None:
        Rt = _resize_rel_pos(rel_pos_t, 2 * max(q_t, k_t) - 1)[_rel_dist(q_t, k_t)]
        rel_t = jnp.einsum("bythwc,tkc->bythwk", r_q, Rt.astype(r_q.dtype))
        terms.append(rel_t[:, :, :, :, :, :, None, None])

    bias = terms[0]
    for t in terms[1:]:
        bias = bias + t
    bias = jnp.broadcast_to(
        bias, (B, nh, q_t, q_h, q_w, k_t, k_h, k_w)
    ).reshape(B, nh, q_t * q_h * q_w, k_t * k_h * k_w)
    if sp:
        bias = jnp.pad(bias, ((0, 0), (0, 0), (sp, 0), (sp, 0)))
    return bias


def _augment_qk_relpos(q, k, scale, has_cls, q_shape, k_shape,
                       rel_pos_h, rel_pos_w, rel_pos_t):
    """Fold decomposed rel-pos into augmented q/k for a single matmul.

    attn[q, k] = scale*q.k + rel_h_q[q, kh(k)] + rel_w_q[q, kw(k)]
               + rel_t_q[q, kt(k)]; the bias terms become extra contraction
    channels: q gains the per-axis bias rows, k gains the matching one-hot
    position indicators (zeros on the cls row/col -> bias 0, matching the
    reference's sp: slicing).
    """
    sp = 1 if has_cls else 0
    q_t, q_h, q_w = q_shape
    k_t, k_h, k_w = k_shape
    B, nh, Nq, C = q.shape
    Nk = k.shape[2]
    r_q = q[:, :, sp:].reshape(B, nh, q_t, q_h, q_w, C)

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
        rel_h_q = jnp.einsum("bythwc,hkc->bythwk", r_q, Rh.astype(r_q.dtype))
        rel_w_q = jnp.einsum("bythwc,wkc->bythwk", r_q, Rw.astype(r_q.dtype))
        extras_q += [
            rel_h_q.reshape(B, nh, Nq - sp, k_h),
            rel_w_q.reshape(B, nh, Nq - sp, k_w),
        ]
        extras_k += [onehot_axis(k_h, k_h, k_w), onehot_axis(k_w, k_w, 1)]
    if rel_pos_t is not None:
        Rt = _resize_rel_pos(rel_pos_t, 2 * max(q_t, k_t) - 1)[_rel_dist(q_t, k_t)]
        rel_t_q = jnp.einsum("bythwc,tkc->bythwk", r_q, Rt.astype(r_q.dtype))
        extras_q.append(rel_t_q.reshape(B, nh, Nq - sp, k_t))
        extras_k.append(onehot_axis(k_t, k_t, k_h * k_w))

    eq = jnp.concatenate(extras_q, axis=-1)
    if sp:
        eq = jnp.pad(eq, ((0, 0), (0, 0), (sp, 0), (0, 0)))
    ek = jnp.concatenate(extras_k, axis=-1)  # (Nk_core, extra)
    if sp:
        ek = jnp.pad(ek, ((sp, 0), (0, 0)))
    ek = jnp.broadcast_to(ek[None, None], (B, nh) + ek.shape)

    q_aug = jnp.concatenate([q * scale, eq.astype(q.dtype)], axis=-1)
    k_aug = jnp.concatenate([k, ek.astype(k.dtype)], axis=-1)
    return q_aug, k_aug


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
    dtype: Any = None

    def _make_pool(self, kernel, stride, dim_conv, name):
        if self.mode not in ("conv", "conv_unshared") or not kernel:
            return None
        from .common import Conv3D

        return Conv3D(
            features=dim_conv,
            kernel=tuple(kernel),
            stride=tuple(stride),
            padding=tuple(k // 2 for k in kernel),
            groups=dim_conv,
            kernel_init=trunc02,
            dtype=self.dtype,
            name=name,
        )

    @nn.compact
    def __call__(self, x, thw_shape, deterministic: bool = True, res_input=None):
        """res_input: optional tensor to pool with the shared Q-pool conv
        (Rev-MViT StageTransitionBlock residual path, reference
        reversible_mvit.py:352-366). When given, returns
        (out, q_shape, pooled_res)."""
        B, N, _ = x.shape
        head_dim = self.dim_out // self.num_heads
        scale = head_dim ** -0.5
        # Skip no-op pooling (reference :197-200).
        kq = () if np.prod(self.kernel_q or (1,)) == 1 and np.prod(
            self.stride_q or (1,)
        ) == 1 else tuple(self.kernel_q)
        kkv = () if np.prod(self.kernel_kv or (1,)) == 1 and np.prod(
            self.stride_kv or (1,)
        ) == 1 else tuple(self.kernel_kv)

        dim_conv = (
            (self.dim if self.pool_first else self.dim_out) // self.num_heads
            if self.mode == "conv"
            else (self.dim if self.pool_first else self.dim_out)
        )
        pool_q = self._make_pool(kq, self.stride_q, dim_conv, "pool_q")
        pool_k = self._make_pool(kkv, self.stride_kv, dim_conv, "pool_k")
        pool_v = self._make_pool(kkv, self.stride_kv, dim_conv, "pool_v")
        conv_mode = self.mode in ("conv", "conv_unshared")
        norm_q = (
            nn.LayerNorm(epsilon=1e-6, bias_init=bias02, name="norm_q")
            if conv_mode and kq
            else None
        )

        dense = lambda feats, name: nn.Dense(
            feats,
            use_bias=self.qkv_bias,
            kernel_init=trunc02,
            bias_init=bias02,
            dtype=self.dtype,
            name=name,
        )

        if self.pool_first:
            fold = self.num_heads if self.mode == "conv" else 1
            xf = x.reshape(B, N, fold, -1).transpose(0, 2, 1, 3)
            q = k = v = xf
        else:
            if not self.separate_qkv:
                qkv = dense(self.dim_out * 3, "qkv")(x)
                qkv = qkv.reshape(B, N, 3, self.num_heads, -1).transpose(2, 0, 3, 1, 4)
                q, k, v = qkv[0], qkv[1], qkv[2]
            else:
                q = dense(self.dim_out, "q")(x).reshape(
                    B, N, self.num_heads, -1
                ).transpose(0, 2, 1, 3)
                k = dense(self.dim_out, "k")(x).reshape(
                    B, N, self.num_heads, -1
                ).transpose(0, 2, 1, 3)
                v = dense(self.dim_out, "v")(x).reshape(
                    B, N, self.num_heads, -1
                ).transpose(0, 2, 1, 3)

        q, q_shape = _pool_tokens(
            q, thw_shape, kq, self.stride_q, self.mode, self.has_cls_embed, pool_q
        )
        k, k_shape = _pool_tokens(
            k, thw_shape, kkv, self.stride_kv, self.mode, self.has_cls_embed, pool_k
        )
        v, v_shape = _pool_tokens(
            v, thw_shape, kkv, self.stride_kv, self.mode, self.has_cls_embed, pool_v
        )
        if conv_mode:
            if norm_q is not None:
                q = norm_q(q)
            if kkv:
                k = nn.LayerNorm(epsilon=1e-6, bias_init=bias02, name="norm_k")(k)
                v = nn.LayerNorm(epsilon=1e-6, bias_init=bias02, name="norm_v")(v)

        if self.pool_first:
            def unfold(t, shape, name):
                n_tok = int(np.prod(shape)) + (1 if self.has_cls_embed else 0)
                t = t.transpose(0, 2, 1, 3).reshape(B, n_tok, -1)
                t = dense(self.dim_out, name)(t)
                return t.reshape(B, n_tok, self.num_heads, -1).transpose(0, 2, 1, 3)

            q = unfold(q, q_shape, "q")
            k = unfold(k, k_shape, "k")
            v = unfold(v, v_shape, "v")

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
            q_aug, k_aug = _augment_qk_relpos(
                q, k, scale, self.has_cls_embed, q_shape, k_shape,
                rel_pos_h, rel_pos_w, rel_pos_t,
            )
            attn = jnp.einsum(
                "bhqc,bhkc->bhqk", q_aug, k_aug,
                preferred_element_type=jnp.float32,
            )
        else:
            attn = jnp.einsum(
                "bhqc,bhkc->bhqk", q * scale, k,
                preferred_element_type=jnp.float32,
            )
        attn = jax.nn.softmax(attn, axis=-1).astype(v.dtype)

        x = jnp.einsum("bhqk,bhkc->bhqc", attn, v, preferred_element_type=jnp.float32)
        x = x.astype(v.dtype)
        if self.residual_pooling:
            # MViTv2 residual pooling (reference :381-385): skip cls token.
            if self.has_cls_embed:
                x = jnp.concatenate([x[:, :, :1], x[:, :, 1:] + q[:, :, 1:]], axis=2)
            else:
                x = x + q

        Nq = x.shape[2]
        x = x.transpose(0, 2, 1, 3).reshape(B, Nq, self.dim_out)
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
            fold = self.num_heads if self.mode == "conv" else 1
            Br, Nr, Cr = res_input.shape
            r = res_input.reshape(Br, Nr, fold, Cr // fold).transpose(0, 2, 1, 3)
            r, _ = _pool_tokens(
                r, thw_shape, kq, self.stride_q, self.mode, self.has_cls_embed,
                pool_q,
            )
            if norm_q is not None:
                r = norm_q(r)
            r = r.transpose(0, 2, 1, 3).reshape(Br, r.shape[2], Cr)
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
            x_res, _ = _pool_tokens(
                x[:, None] if x.ndim == 3 else x,
                thw_shape,
                kernel_skip,
                stride_skip,
                "max",
                self.has_cls_embed,
            )
            x_res = x_res[:, 0]
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
