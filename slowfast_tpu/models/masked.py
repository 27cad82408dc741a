"""Masked pretraining: MaskFeat and MAE on the MViT trunk.

Reference: slowfast/models/masked.py:24-623. Returns (preds, labels) pairs;
the train step computes the configured loss against the generated targets.

TPU notes: masked-position selection is expressed as mask-weighted losses
(MaskFeat) or static-size gathers from an argsorted noise permutation
(MAE masking) — both fully static-shaped for XLA. The reference's mask
sources all map onto one noise tensor fed to the same argsort machinery:
random (MAE_RND_MASK), tube (AUG.MASK_TUBE), per-frame
(MASK.PER_FRAME_MASKING — argsort rows become B*T frames), and
loader-provided masks (MAE_RND_MASK=False — the mask itself is the noise,
so masked positions sort last; reference masked.py:299-301). The one
divergence from the reference: with a loader mask the reference derives
len_keep from the mask's live sum (masked.py:301-302), a data-dependent
shape XLA cannot compile; here len_keep is static from AUG.MASK_RATIO,
which every shipped recipe sets to the loader generator's target ratio.
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
    """Per-depth prediction heads: optional transformer decoder blocks
    (HEAD_TYPE separate_xformer, with MASK.DEC_KV_KERNEL/STRIDE KV pooling)
    followed by LayerNorm + Linear. Reference head_helper.py:565-672.

    Module layout mirrors the reference so torch checkpoints map
    mechanically: ``transforms_{i}_{j}`` are the xformer blocks with the
    final LayerNorm at the last j index (the reference packs both into one
    nn.Sequential), and ``projections_{i}`` is the output Linear. The
    reference gathers masked positions (``x[mask]``) before projecting;
    here the projection runs over the full static-shaped grid and the loss
    applies the mask as weights — loss-equivalent and XLA-friendly.
    """

    cfg: Any
    num_classes: Any  # list per depth: prediction target dim
    head_dims: Any  # list per depth: input feature dim
    feat_sizes: Any  # list per depth: (t, h, w) token geometry
    dtype: Any = None

    @nn.compact
    def __call__(self, feats, thws, train: bool = False):
        cfg = self.cfg
        head_type = cfg.MASK.HEAD_TYPE.split("_")
        n_xf = 0
        if len(head_type) > 1 and head_type[1] == "xformer":
            n_xf = cfg.MASK.DECODER_DEPTH
        outs = []
        for i, x in enumerate(feats):
            thw = list(thws[i])
            dim = self.head_dims[i]
            for j in range(n_xf):
                dim_out = cfg.MASK.DECODER_EMBED_DIM
                x, thw = MultiScaleBlock(
                    dim=dim,
                    dim_out=dim_out,
                    num_heads=max(dim_out // 64, 1),
                    input_size=tuple(self.feat_sizes[i]),
                    mlp_ratio=cfg.MVIT.MLP_RATIO,
                    qkv_bias=cfg.MVIT.QKV_BIAS,
                    drop_rate=cfg.MVIT.DROPOUT_RATE,
                    kernel_q=(),
                    kernel_kv=tuple(cfg.MASK.DEC_KV_KERNEL),
                    stride_q=(),
                    stride_kv=tuple(cfg.MASK.DEC_KV_STRIDE),
                    mode=cfg.MVIT.MODE,
                    has_cls_embed=cfg.MVIT.CLS_EMBED_ON,
                    pool_first=cfg.MVIT.POOL_FIRST,
                    use_pallas_attention=use_pallas(cfg),
                    fused_attention=cfg.TPU.FUSED_ATTENTION,
                    dtype=self.dtype,
                    name=f"transforms_{i}_{j}",
                )(x, thw, deterministic=not train)
                dim = dim_out
            # Reference head init (head_helper.py:646-656): Linear
            # trunc_normal(0.02) weight / zero bias, default LayerNorm —
            # NOT the trunk's 0.02 bias convention.
            x = nn.LayerNorm(epsilon=1e-6, name=f"transforms_{i}_{n_xf}")(x)
            if cfg.MVIT.CLS_EMBED_ON:
                x = x[:, 1:]  # reference head_helper.py:666
            x = nn.Dense(
                self.num_classes[i],
                kernel_init=trunc02,
                dtype=self.dtype,
                name=f"projections_{i}",
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
            return self._mae_forward(tokens, thw, x_raw, mask, train)
        return self._maskfeat_forward(tokens, thw, x_raw, mask, train)

    # ------------------------------------------------------------------
    # Masking helpers
    # ------------------------------------------------------------------

    def _mask_to_token_grid(self, mask, B, T0, H0, W0):
        """Upsample a loader mask to token granularity -> (B, T0, H0, W0)
        float (reference float-mask F.interpolate, masked.py:165-176)."""
        mask = mask.astype(jnp.float32)
        if mask.ndim == 3:  # (B, h, w) 2D masking -> broadcast over T
            mask = jnp.broadcast_to(mask[:, None], (B, T0) + mask.shape[1:])
        mt, mh, mw = mask.shape[1:]
        rt, rh, rw = T0 // mt, H0 // mh, W0 // mw
        return jnp.repeat(jnp.repeat(jnp.repeat(mask, rt, 1), rh, 2), rw, 3)

    def _random_token_mask(self, B, N, rng):
        """On-device random token mask at AUG.MASK_RATIO -> (B, N) float
        (reference _mae_random_masking used by MaskFeat when MAE_RND_MASK,
        masked.py:521-525)."""
        noise = jax.random.uniform(rng, (B, N))
        len_keep = int(N * (1 - self.cfg.AUG.MASK_RATIO))
        ids_shuffle = jnp.argsort(noise, axis=1)
        ids_restore = jnp.argsort(ids_shuffle, axis=1)
        m = jnp.zeros((B, N)).at[:, len_keep:].set(1.0)
        return jnp.take_along_axis(m, ids_restore, axis=1)

    # ------------------------------------------------------------------
    # MaskFeat (reference :519-613)
    # ------------------------------------------------------------------

    def _maskfeat_forward(self, tokens, thw, x_raw, mask, train):
        cfg = self.cfg
        dtype = compute_dtype(cfg)
        B, N, C = tokens.shape
        T0, H0, W0 = thw

        if cfg.MASK.MAE_RND_MASK:
            # MaskFeat x random mask: mask generated on device instead of
            # by the loader (reference masked.py:521-525).
            rng = self.make_rng("dropout") if train else jax.random.PRNGKey(0)
            mask_flat2 = self._random_token_mask(B, N, rng)
            mask_tok = mask_flat2.reshape(B, T0, H0, W0)
        else:
            assert mask is not None, "MaskFeat requires a loader-generated mask"
            mask_tok = self._mask_to_token_grid(mask, B, T0, H0, W0)
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
        nbins, cell_sz = 9, 8
        sched = mvit_block_schedule(cfg)
        feats_l, thws_l, labels_l, masks_l = [], [], [], []
        for d_i, depth in enumerate(cfg.MASK.PRETRAIN_DEPTH):
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
                    stride_acc = [a * st for a, st in zip(stride_acc, sq)]
            # [-2] = the H stride in both the 3D (t, h, w) and 2D (h, w)
            # patch-stride layouts.
            feat_stride_sp = self.cfg.MVIT.PATCH_STRIDE[-2] * stride_acc[1]

            if cfg.MASK.PRED_HOG:
                labels = self._hog_labels(
                    x_raw, t_d, h_d, w_d, feat_stride_sp, nbins, cell_sz
                )
            else:
                labels = self._pixel_labels(x_raw, t_d, h_d, w_d)

            # Mask at this depth's granularity.
            m = mask_tok
            m = m[:, :: max(T0 // t_d, 1), :: max(H0 // h_d, 1), :: max(W0 // w_d, 1)]
            m = m[:, :t_d, :h_d, :w_d]  # odd sizes: strided pick can overshoot
            feats_l.append(feats[d_i])  # cls kept; the head drops it
            thws_l.append([t_d, h_d, w_d])
            labels_l.append(labels)
            masks_l.append(m.reshape(B, -1))

        preds = MSSeparateHead(
            cfg=cfg,
            num_classes=[l.shape[-1] for l in labels_l],
            head_dims=[f.shape[-1] for f in feats_l],
            feat_sizes=thws_l,
            dtype=dtype,
            name="pred_head",
        )(feats_l, thws_l, train)
        return preds, list(zip(labels_l, masks_l))

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
        # Per-cell order (c, bin, i, j): the reference unfolds AFTER
        # flattening (C, nbins), so the cell offsets vary fastest
        # (masked.py:266-275 permute+unfold+flatten(3)).
        hog = hog.transpose(0, 3, 5, 1, 2, 4, 6)  # (B*t, h, w, 3, nbins, cp, cp)
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

    def _mae_forward(self, tokens, thw, x_raw, mask, train):
        cfg = self.cfg
        dtype = compute_dtype(cfg)
        B, N, C = tokens.shape
        T0, H0, W0 = thw
        ratio = cfg.AUG.MASK_RATIO
        s = 1 if cfg.MVIT.CLS_EMBED_ON else 0
        per_frame = cfg.MASK.PER_FRAME_MASKING

        # Patch pos is added before the visible-token gather (equivalent to
        # the reference's gather-then-add, reference :363-377; with
        # USE_FIXED_SINCOS_POS the reference itself adds pre-gather :329-330
        # — the only pos layout that composes with PER_FRAME_MASKING there).
        pos = self._pos_table(N, C, num_cls=s)
        x = tokens if pos is None else tokens + pos[:, s:].astype(tokens.dtype)

        # One noise tensor expresses every mask source; argsort turns it
        # into keep/drop index sets (reference _mae_random_masking :283-317).
        rng = self.make_rng("dropout") if train else jax.random.PRNGKey(0)
        if not cfg.MASK.MAE_RND_MASK:
            # Loader-provided mask as noise: unmasked (0) sorts first = kept
            # (reference :299-301). len_keep is static from AUG.MASK_RATIO
            # (see module docstring).
            assert mask is not None, (
                "MASK.MAE_RND_MASK=False requires a loader-generated mask "
                "(AUG.GEN_MASK_LOADER)"
            )
            # The reference flattens the loader mask directly (:299-300) —
            # MAE loader masks are generated AT token granularity
            # (AUG.MASK_WINDOW_SIZE == the token grid), unlike MaskFeat's
            # window masks which we upsample.
            assert mask.size == B * N, (
                f"MAE loader mask {mask.shape} must match the token grid "
                f"({B}, {T0}, {H0}, {W0}); set AUG.MASK_WINDOW_SIZE to the "
                "patch grid for MAE_RND_MASK=False"
            )
            noise = mask.astype(jnp.float32).reshape(B, N)
        elif cfg.AUG.MASK_TUBE:
            # Same spatial mask for every frame (reference :291-297).
            u = jax.random.uniform(rng, (B, 1, H0 * W0))
            noise = jnp.tile(u, (1, T0, 1)).reshape(B, N)
        else:
            noise = jax.random.uniform(rng, (B, N))

        # PER_FRAME_MASKING: each frame is masked independently at the same
        # ratio — the argsort rows become the B*T frames (reference :332-338).
        rows, L = (B * T0, H0 * W0) if per_frame else (B, N)
        len_keep = int(L * (1 - ratio))
        assert len_keep >= 1, f"MASK_RATIO {ratio} leaves no visible tokens"
        noise = noise.reshape(rows, L)
        ids_shuffle = jnp.argsort(noise, axis=1)
        ids_restore = jnp.argsort(ids_shuffle, axis=1)
        ids_keep = ids_shuffle[:, :len_keep]
        x_vis = jnp.take_along_axis(
            x.reshape(rows, L, C), ids_keep[:, :, None], axis=1
        ).reshape(B, -1, C)

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
        # Unshuffle patch tokens only; cls stays at the front (reference
        # :400-414: `x_ = cat([x[:, s:], mask_tokens])` ... `cat([x[:, :s], x_])`).
        # Per-frame mode reshapes to frame rows only AFTER appending the
        # mask tokens to the whole sample (reference :406-413) — so earlier
        # frames' masked slots are filled from LATER FRAMES' visible
        # embeddings before any actual mask token is reached. A reference
        # quirk, reproduced deliberately; with per-frame off, rows == B and
        # this is the standard MAE unshuffle.
        n_vis = x_dec.shape[1] - s
        mask_tokens = jnp.broadcast_to(mask_token, (B, N - n_vis, dec_dim))
        x_ = jnp.concatenate([x_dec[:, s:], mask_tokens], axis=1)
        x_ = x_.reshape(rows, L, dec_dim)
        x_ = jnp.take_along_axis(x_, ids_restore[:, :, None], axis=1)
        x_ = x_.reshape(B, N, dec_dim)
        x_full = jnp.concatenate([x_dec[:, :s], x_], axis=1)
        dec_pos = self._dec_pos_table(N, dec_dim, num_cls=s)
        if dec_pos is not None:
            x_full = x_full + dec_pos.astype(x_full.dtype)

        # Prediction head: DECODER_DEPTH transformer blocks (+ optional
        # DEC_KV pooling) + LN + Linear — the reference routes the MAE
        # decoder through the same MSSeparateHead (masked.py:438-443).
        labels = self._mae_pixel_targets(x_raw, T0, H0, W0)
        preds = MSSeparateHead(
            cfg=cfg,
            num_classes=[labels.shape[-1]],
            head_dims=[dec_dim],
            feat_sizes=[[T0, H0, W0]],
            dtype=dtype,
            name="pred_head",
        )([x_full], [[T0, H0, W0]], train)

        m = jnp.zeros((rows, L)).at[:, len_keep:].set(1.0)
        m = jnp.take_along_axis(m, ids_restore, axis=1).reshape(B, N)
        return preds, [(labels, m)]

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
        USE_FIXED_SINCOS_POS returns the (non-learned) 3D sincos table
        (reference video_model_builder.py pos_embed buffer).
        """
        cfg = self.cfg
        if not cfg.MVIT.USE_ABS_POS:
            return None
        t_stride = 1 if cfg.MVIT.PATCH_2D else list(cfg.MVIT.PATCH_STRIDE)[0]
        T0 = cfg.DATA.NUM_FRAMES // t_stride
        if cfg.MVIT.USE_FIXED_SINCOS_POS:
            grid = int(round(math.sqrt(n_patches // T0)))
            return jnp.asarray(
                get_3d_sincos_pos_embed(C, grid, T0, cls_token=num_cls > 0)
            )[None]
        if cfg.MVIT.SEP_POS_EMBED:
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

    def _dec_pos_table(self, n_patches, C, num_cls=0):
        """Decoder pos-embed table (reference :87-121, :416-436): joint
        `decoder_pos_embed` or, with MASK.DECODER_SEP_POS_EMBED, separated
        spatial x temporal factors + class slot."""
        cfg = self.cfg
        if not cfg.MVIT.USE_ABS_POS:
            return None
        if cfg.MASK.DECODER_SEP_POS_EMBED:
            t_stride = 1 if cfg.MVIT.PATCH_2D else list(cfg.MVIT.PATCH_STRIDE)[0]
            T0 = cfg.DATA.NUM_FRAMES // t_stride
            HW = n_patches // T0
            pe_s = self.param(
                "dec_pos_embed_spatial", trunc02, (1, HW, C), jnp.float32
            )
            pe_t = self.param(
                "dec_pos_embed_temporal", trunc02, (1, T0, C), jnp.float32
            )
            pos = jnp.tile(pe_s, (1, T0, 1)) + jnp.repeat(pe_t, HW, axis=1)
            if num_cls:
                pe_c = self.param(
                    "dec_pos_embed_class", trunc02, (1, num_cls, C), jnp.float32
                )
                pos = jnp.concatenate([pe_c, pos], axis=1)
        else:
            pos = self.param(
                "decoder_pos_embed", trunc02, (1, num_cls + n_patches, C),
                jnp.float32,
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
