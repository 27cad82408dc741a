"""Masked pretraining: MaskFeat and MAE on the MViT trunk.

Reference: slowfast/models/masked.py:24-622. Returns (preds, labels) pairs;
the train step computes the configured loss against the generated targets.

TPU notes: masked-position selection is expressed as mask-weighted losses
(MaskFeat) or static-size gathers from an argsorted noise permutation
(MAE random masking) — both fully static-shaped for XLA.
"""

import math
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from slowfast_tpu.ops.hog import hog_features
from slowfast_tpu.ops.pallas_attention import use_pallas
from .attention import MultiScaleBlock, bias02, trunc02
from .mvit import MViT, get_3d_sincos_pos_embed, mvit_block_schedule
from .stem import PatchEmbed
from .video_models import compute_dtype


class MSSeparateHead(nn.Module):
    """Per-depth prediction head: LN -> Linear (+ optional transformer
    blocks when DECODER_DEPTH > 0). Reference head_helper.py:566-672."""

    num_classes: Any  # list per depth
    dtype: Any = None

    @nn.compact
    def __call__(self, feats):
        outs = []
        for i, x in enumerate(feats):
            x = nn.LayerNorm(epsilon=1e-6, bias_init=bias02, name=f"projections_{i}_norm")(x)
            x = nn.Dense(
                self.num_classes[i],
                kernel_init=trunc02,
                bias_init=bias02,
                dtype=self.dtype,
                name=f"projections_{i}_proj",
            )(x)
            outs.append(x)
        return outs


class MaskMViT(nn.Module):
    """MaskFeat / MAE pretraining model."""

    cfg: Any

    @nn.compact
    def __call__(self, xs, mask=None, train: bool = False):
        cfg = self.cfg
        dtype = compute_dtype(cfg)
        x_raw = xs[0]
        B = x_raw.shape[0]

        patch_2d = cfg.MVIT.PATCH_2D
        patch_stride = list(cfg.MVIT.PATCH_STRIDE)
        if patch_2d:
            patch_stride = [1] + patch_stride
        T0 = cfg.DATA.NUM_FRAMES // patch_stride[0]
        H0 = cfg.DATA.TRAIN_CROP_SIZE // patch_stride[1]
        W0 = cfg.DATA.TRAIN_CROP_SIZE // patch_stride[2]
        num_patches = T0 * H0 * W0
        embed_dim = cfg.MVIT.EMBED_DIM
        depth_keep = cfg.MASK.PRETRAIN_DEPTH[-1] + 1

        x = x_raw.astype(dtype)
        if patch_2d:
            # Fold T into batch for a 2D stem (in1k image MaskFeat,
            # reference use_2d_patch).
            B0, T_in = x.shape[0], x.shape[1]
            x = x.reshape((B0 * T_in,) + x.shape[2:])
        tokens, shape = PatchEmbed(
            dim_out=embed_dim,
            kernel=cfg.MVIT.PATCH_KERNEL,
            stride=cfg.MVIT.PATCH_STRIDE,
            padding=cfg.MVIT.PATCH_PADDING,
            conv_2d=patch_2d,
            dtype=dtype,
            name="patch_embed",
        )(x)
        if patch_2d:
            tokens = tokens.reshape(B0, -1, embed_dim)
            thw = [T_in, shape[0], shape[1]]
        else:
            thw = list(shape)

        if cfg.MASK.MAE_ON:
            return self._mae_forward(tokens, thw, x_raw, train)
        return self._maskfeat_forward(tokens, thw, x_raw, mask, train)

    # ------------------------------------------------------------------
    # MaskFeat (reference :519-613)
    # ------------------------------------------------------------------

    def _maskfeat_forward(self, tokens, thw, x_raw, mask, train):
        cfg = self.cfg
        dtype = compute_dtype(cfg)
        B, N, C = tokens.shape
        T0, H0, W0 = thw

        # mask: (B, t, h, w) boolean at MASK_WINDOW_SIZE granularity;
        # upsample to token granularity (reference float-mask interpolation).
        assert mask is not None, "MaskFeat requires a loader-generated mask"
        mask = mask.astype(jnp.float32)
        if mask.ndim == 3:  # (B, h, w) 2D masking -> broadcast over T
            mask = jnp.broadcast_to(mask[:, None], (B, T0) + mask.shape[1:])
        mt, mh, mw = mask.shape[1:]
        rt, rh, rw = T0 // mt, H0 // mh, W0 // mw
        mask_tok = jnp.repeat(jnp.repeat(jnp.repeat(mask, rt, 1), rh, 2), rw, 3)
        mask_flat = mask_tok.reshape(B, N, 1)

        mask_token = self.param("mask_token", trunc02, (1, 1, C), jnp.float32)
        tokens = tokens * (1.0 - mask_flat).astype(dtype) + (
            mask_token.astype(dtype) * mask_flat.astype(dtype)
        )

        # cls token is prepended AFTER mask replacement (reference :562-564),
        # so it is never replaced by the mask token.
        s = 1 if cfg.MVIT.CLS_EMBED_ON else 0
        if s:
            cls_token = self.param("cls_token", trunc02, (1, 1, C), jnp.float32)
            tokens = jnp.concatenate(
                [jnp.broadcast_to(cls_token.astype(dtype), (B, 1, C)), tokens],
                axis=1,
            )
        x = self._add_pos(tokens, B, num_cls=s)
        x, feats = self._trunk(x, [T0, H0, W0], train)

        # Targets: HOG (or raw pixels) of the input frames per feature cell.
        preds_labels = []
        nbins, cell_sz = 9, 8
        sched = mvit_block_schedule(cfg)
        for d_i, depth in enumerate(cfg.MASK.PRETRAIN_DEPTH):
            # Head drops the cls token before projecting (reference
            # head_helper.py MSSeparateHead.forward `x = x[:, 1:]`).
            feat = feats[d_i][:, s:]  # (B, N_d, C_d) grid tokens at that depth
            # Feature geometry at this depth: apply the pooling size formula
            # ((size-1)//stride+1) per pooled block — plain division diverges
            # from the real grid at odd sizes (e.g. 14 -> 7 -> 4 -> 2).
            t_d, h_d, w_d = T0, H0, W0
            stride_acc = [1, 1, 1]
            for i in range(depth + 1):
                sq = sched[i]["stride_q"]
                if sq:
                    t_d = (t_d - 1) // sq[0] + 1
                    h_d = (h_d - 1) // sq[1] + 1
                    w_d = (w_d - 1) // sq[2] + 1
                    stride_acc = [a * s for a, s in zip(stride_acc, sq)]
            # [-2] = the H stride in both the 3D (t, h, w) and 2D (h, w)
            # patch-stride layouts.
            feat_stride_sp = self.cfg.MVIT.PATCH_STRIDE[-2] * stride_acc[1]

            if cfg.MASK.PRED_HOG:
                labels = self._hog_labels(
                    x_raw, t_d, h_d, w_d, feat_stride_sp, nbins, cell_sz
                )
            else:
                labels = self._pixel_labels(x_raw, t_d, h_d, w_d)
            pred = MSSeparateHead(
                num_classes=[labels.shape[-1]], dtype=dtype, name=f"pred_head_{d_i}"
            )([feat])[0]

            # Mask at this depth's granularity.
            m = mask_tok.reshape(B, T0, H0, W0)
            m = m[:, :: max(T0 // t_d, 1), :: max(H0 // h_d, 1), :: max(W0 // w_d, 1)]
            m = m[:, :t_d, :h_d, :w_d]  # odd sizes: strided pick can overshoot
            m = m.reshape(B, -1)
            preds_labels.append((pred, labels, m))

        preds = [p for p, _, _ in preds_labels]
        labels = [(l, m) for _, l, m in preds_labels]
        return preds, labels

    def _hog_labels(self, x_raw, t_d, h_d, w_d, feat_stride, nbins, cell_sz):
        """HOG target per feature cell (reference _get_hog_label_2d :232-282).

        Uses the temporally-strided center frame of each feature time step.
        """
        cfg = self.cfg
        B, T, H, W, C = x_raw.shape
        t_stride = T // t_d
        frames = x_raw[:, ::t_stride][:, :t_d]  # (B, t_d, H, W, C)
        frames = frames.reshape(B * t_d, H, W, C).astype(jnp.float32)
        hog = hog_features(frames, nbins=nbins, cell_sz=cell_sz)
        # (B*t_d, 3, nbins, Hc, Wc) -> group cells per feature patch.
        Hc, Wc = hog.shape[-2], hog.shape[-1]
        assert Hc % h_d == 0 and Wc % w_d == 0, (
            f"HOG cell grid {Hc}x{Wc} (crop/{cell_sz}) must tile the "
            f"feature grid {h_d}x{w_d}; pick DATA.TRAIN_CROP_SIZE so "
            f"crop/{cell_sz} is a multiple of the pooled token grid"
        )
        cells_per = Hc // h_d
        hog = hog.reshape(B * t_d, 3, nbins, h_d, cells_per, w_d, cells_per)
        hog = hog.transpose(0, 3, 5, 1, 4, 6, 2)  # (B*t, h, w, 3, cp, cp, nbins)
        hog = hog.reshape(B, t_d * h_d * w_d, -1)
        return jax.lax.stop_gradient(hog)

    def _pixel_labels(self, x_raw, t_d, h_d, w_d):
        """Raw-pixel targets (reference _get_pixel_label_3d :197-231)."""
        B, T, H, W, C = x_raw.shape
        t_stride, h_stride, w_stride = T // t_d, H // h_d, W // w_d
        frames = x_raw[:, ::t_stride][:, :t_d].astype(jnp.float32)
        patches = frames.reshape(
            B, t_d, h_d, h_stride, w_d, w_stride, C
        ).transpose(0, 1, 2, 4, 3, 5, 6)
        patches = patches.reshape(B, t_d * h_d * w_d, -1)
        if self.cfg.MASK.NORM_PRED_PIXEL:
            mu = patches.mean(axis=-1, keepdims=True)
            var = patches.var(axis=-1, keepdims=True)
            patches = (patches - mu) / jnp.sqrt(var + 1e-6)
        return jax.lax.stop_gradient(patches)

    # ------------------------------------------------------------------
    # MAE (reference :283-477)
    # ------------------------------------------------------------------

    def _mae_forward(self, tokens, thw, x_raw, train):
        cfg = self.cfg
        dtype = compute_dtype(cfg)
        B, N, C = tokens.shape
        T0, H0, W0 = thw
        ratio = cfg.AUG.MASK_RATIO
        len_keep = int(N * (1 - ratio))
        s = 1 if cfg.MVIT.CLS_EMBED_ON else 0

        # Patch pos is added before the visible-token gather (equivalent to
        # the reference's gather-then-add, reference :363-377).
        pos = self._pos_table(N, C, num_cls=s)
        x = tokens if pos is None else tokens + pos[:, s:].astype(tokens.dtype)

        # Random masking via argsorted noise (reference :283-318).
        rng = self.make_rng("dropout") if train else jax.random.PRNGKey(0)
        noise = jax.random.uniform(rng, (B, N))
        ids_shuffle = jnp.argsort(noise, axis=1)
        ids_restore = jnp.argsort(ids_shuffle, axis=1)
        ids_keep = ids_shuffle[:, :len_keep]
        x_vis = jnp.take_along_axis(x, ids_keep[:, :, None], axis=1)

        if s:
            # cls token joins only the visible set (reference :340-346).
            cls_token = self.param("cls_token", trunc02, (1, 1, C), jnp.float32)
            cls = cls_token.astype(x_vis.dtype)
            if pos is not None:
                cls = cls + pos[:, :s].astype(x_vis.dtype)
            x_vis = jnp.concatenate(
                [jnp.broadcast_to(cls, (B, s, C)), x_vis], axis=1
            )

        # Encoder over visible tokens only.
        x_enc, _ = self._trunk(x_vis, None, train)
        x_enc = nn.LayerNorm(epsilon=1e-6, bias_init=bias02, name="norm")(x_enc)

        # Decoder (reference :394-446).
        dec_dim = cfg.MASK.DECODER_EMBED_DIM
        x_dec = nn.Dense(
            dec_dim, kernel_init=trunc02, bias_init=bias02, dtype=dtype,
            name="decoder_embed",
        )(x_enc)
        mask_token = self.param(
            "mask_token", trunc02, (1, 1, dec_dim), jnp.float32
        ).astype(x_dec.dtype)
        mask_tokens = jnp.broadcast_to(mask_token, (B, N - len_keep, dec_dim))
        # Unshuffle patch tokens only; cls stays at the front (reference
        # :400-414: `x_ = cat([x[:, s:], mask_tokens])` ... `cat([x[:, :s], x_])`).
        x_ = jnp.concatenate([x_dec[:, s:], mask_tokens], axis=1)
        x_ = jnp.take_along_axis(x_, ids_restore[:, :, None], axis=1)
        x_full = jnp.concatenate([x_dec[:, :s], x_], axis=1)
        dec_pos = self.param(
            "dec_pos_embed", trunc02, (1, s + N, dec_dim), jnp.float32
        )
        x_full = x_full + dec_pos.astype(x_full.dtype)
        for i in range(cfg.MASK.DECODER_DEPTH):
            x_full, _ = MultiScaleBlock(
                dim=dec_dim,
                dim_out=dec_dim,
                num_heads=max(dec_dim // 64, 1),
                input_size=(T0, H0, W0),
                mlp_ratio=cfg.MVIT.MLP_RATIO,
                use_pallas_attention=use_pallas(cfg),
                fused_attention=cfg.TPU.FUSED_ATTENTION,
                qkv_bias=cfg.MVIT.QKV_BIAS,
                has_cls_embed=bool(s),
                dtype=dtype,
                name=f"decoder_blocks_{i}",
            )(x_full, [T0, H0, W0], deterministic=not train)
        x_full = nn.LayerNorm(epsilon=1e-6, bias_init=bias02, name="decoder_norm")(
            x_full
        )

        # Pixel targets. Head drops the cls token before projecting
        # (reference head_helper.py MSSeparateHead.forward).
        labels = self._mae_pixel_targets(x_raw, T0, H0, W0)
        pred = nn.Dense(
            labels.shape[-1], kernel_init=trunc02, bias_init=bias02, dtype=dtype,
            name="pred_head",
        )(x_full[:, s:])

        mask = jnp.zeros((B, N))
        mask = mask.at[:, len_keep:].set(1.0)
        mask = jnp.take_along_axis(mask, ids_restore, axis=1)
        return [pred], [(labels, mask)]

    def _mae_pixel_targets(self, x_raw, T0, H0, W0):
        """Patchify pixels (reference _patchify :178-189). With
        TIME_STRIDE_LOSS, targets use the temporally-strided frames."""
        cfg = self.cfg
        B, T, H, W, C = x_raw.shape
        pt, ph, pw = cfg.MVIT.PATCH_STRIDE
        frames = x_raw.astype(jnp.float32)
        if cfg.MASK.TIME_STRIDE_LOSS:
            frames = frames[:, ::pt][:, :T0]
            patches = frames.reshape(B, T0, H0, ph, W0, pw, C)
            patches = patches.transpose(0, 1, 2, 4, 3, 5, 6).reshape(
                B, T0 * H0 * W0, ph * pw * C
            )
        else:
            patches = frames.reshape(B, T0, pt, H0, ph, W0, pw, C)
            patches = patches.transpose(0, 1, 3, 5, 2, 4, 6, 7).reshape(
                B, T0 * H0 * W0, pt * ph * pw * C
            )
        if cfg.MASK.NORM_PRED_PIXEL:
            mu = patches.mean(axis=-1, keepdims=True)
            var = patches.var(axis=-1, keepdims=True)
            patches = (patches - mu) / jnp.sqrt(var + 1e-6)
        return jax.lax.stop_gradient(patches)

    # ------------------------------------------------------------------
    # Shared trunk helpers
    # ------------------------------------------------------------------

    def _pos_table(self, n_patches, C, num_cls=0):
        """Absolute pos-embed table (1, num_cls + n_patches, C) or None.

        Sep mode builds spatial x temporal factors with a class slot
        prepended (reference :566-577); joint mode is one table whose
        first `num_cls` rows belong to the cls token (reference :106).
        """
        cfg = self.cfg
        if not cfg.MVIT.USE_ABS_POS:
            return None
        if cfg.MVIT.SEP_POS_EMBED:
            t_stride = 1 if cfg.MVIT.PATCH_2D else list(cfg.MVIT.PATCH_STRIDE)[0]
            T0 = cfg.DATA.NUM_FRAMES // t_stride
            HW = n_patches // T0
            pe_s = self.param("pos_embed_spatial", trunc02, (1, HW, C), jnp.float32)
            pe_t = self.param("pos_embed_temporal", trunc02, (1, T0, C), jnp.float32)
            pos = jnp.tile(pe_s, (1, T0, 1)) + jnp.repeat(pe_t, HW, axis=1)
            if num_cls:
                pe_c = self.param(
                    "pos_embed_class", trunc02, (1, num_cls, C), jnp.float32
                )
                pos = jnp.concatenate([pe_c, pos], axis=1)
        else:
            pos = self.param(
                "pos_embed", trunc02, (1, num_cls + n_patches, C), jnp.float32
            )
        return pos

    def _add_pos(self, tokens, B, num_cls=0):
        """Add pos embed to tokens that already include `num_cls` leading
        cls tokens."""
        pos = self._pos_table(tokens.shape[1] - num_cls, tokens.shape[-1], num_cls)
        if pos is None:
            return tokens
        return tokens + pos.astype(tokens.dtype)

    def _trunk(self, x, thw, train):
        """MViT blocks up to PRETRAIN_DEPTH; collects per-depth features.

        thw None (MAE visible-token mode) disables pooling attention
        (reference MAE path keeps token count; pool strides are unused in
        MAE pretrain configs).
        """
        cfg = self.cfg
        dtype = compute_dtype(cfg)
        sched = mvit_block_schedule(cfg)
        depth_keep = cfg.MASK.PRETRAIN_DEPTH[-1] + 1
        dpr = np.linspace(0, cfg.MVIT.DROPPATH_RATE, cfg.MVIT.DEPTH)
        feats = []
        cur_thw = list(thw) if thw is not None else None
        for i in range(depth_keep):
            blk = sched[i]
            use_pool = thw is not None
            x, cur_thw = MultiScaleBlock(
                dim=blk["dim"],
                dim_out=blk["dim_out"],
                num_heads=blk["num_heads"],
                input_size=tuple(cur_thw) if cur_thw else (1, 1, 1),
                mlp_ratio=cfg.MVIT.MLP_RATIO,
                use_pallas_attention=use_pallas(cfg),
                fused_attention=cfg.TPU.FUSED_ATTENTION,
                qkv_bias=cfg.MVIT.QKV_BIAS,
                droppath_rate=float(dpr[i]),
                kernel_q=blk["kernel_q"] if use_pool else (),
                kernel_kv=blk["kernel_kv"] if use_pool else (),
                stride_q=blk["stride_q"] if use_pool else (),
                stride_kv=blk["stride_kv"] if use_pool else (),
                mode=cfg.MVIT.MODE,
                has_cls_embed=cfg.MVIT.CLS_EMBED_ON,
                rel_pos_spatial=cfg.MVIT.REL_POS_SPATIAL and use_pool,
                rel_pos_temporal=cfg.MVIT.REL_POS_TEMPORAL and use_pool,
                residual_pooling=cfg.MVIT.RESIDUAL_POOLING,
                dim_mul_in_att=cfg.MVIT.DIM_MUL_IN_ATT,
                dtype=dtype,
                name=f"blocks_{i}",
            )(
                x,
                cur_thw if cur_thw else [1, 1, x.shape[1]],
                deterministic=not train,
            )
            if i in cfg.MASK.PRETRAIN_DEPTH:
                feats.append(x)
        return x, feats


def masked_loss(preds, labels, loss_name="mse"):
    """Mask-weighted loss over (pred, (target, mask)) pairs."""
    total = 0.0
    for pred, (target, mask) in zip(preds, labels):
        err = jnp.mean(
            jnp.square(pred.astype(jnp.float32) - target), axis=-1
        )  # (B, N)
        total = total + jnp.sum(err * mask) / jnp.maximum(jnp.sum(mask), 1.0)
    return total / len(preds)
