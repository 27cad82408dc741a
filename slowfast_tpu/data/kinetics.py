"""Kinetics dataset (reference slowfast/datasets/kinetics.py:29-527).

CSV lists of ``path label``; train/val sample one random clip, test expands
each video into NUM_ENSEMBLE_VIEWS x NUM_SPATIAL_CROPS clips. Decode
failures retry with random replacement (<=100 tries). ``DATA.DUMMY_LOAD``
caches one synthetic item for input-pipeline-free benchmarking.
"""

import math
import os
import random

import numpy as np

from slowfast_tpu.utils import logging as logging_utils
from slowfast_tpu.utils.io import pathmgr
from . import decoder, utils as data_utils
from .build import DATASET_REGISTRY

logger = logging_utils.get_logger(__name__)


@DATASET_REGISTRY.register(name="Kinetics")
class Kinetics:
    def __init__(self, cfg, mode, num_retries=100):
        assert mode in ["train", "val", "test"]
        self.mode = mode
        self.cfg = cfg
        self._num_retries = num_retries
        self._video_meta = {}
        self.dummy_output = None
        if mode in ["train", "val"]:
            self._num_clips = 1
        else:
            self._num_clips = cfg.TEST.NUM_ENSEMBLE_VIEWS * cfg.TEST.NUM_SPATIAL_CROPS
        self._construct_loader()
        self.randaug = None
        if cfg.AUG.ENABLE and mode == "train" and cfg.AUG.AA_TYPE:
            from .rand_augment import rand_augment_transform

            self.randaug = rand_augment_transform(
                cfg.AUG.AA_TYPE,
                dict(
                    translate_const=int(cfg.DATA.TRAIN_CROP_SIZE * 0.45),
                    img_mean=tuple(
                        min(255, round(255 * m)) for m in cfg.DATA.MEAN
                    ),
                    interpolation=cfg.AUG.INTERPOLATION,
                ),
            )

    def _construct_loader(self):
        csv_name = {"train": "train.csv", "val": "val.csv", "test": "test.csv"}[
            self.mode
        ]
        path_to_file = os.path.join(self.cfg.DATA.PATH_TO_DATA_DIR, csv_name)
        assert pathmgr.exists(path_to_file), f"{path_to_file} not found"
        self._path_to_videos = []
        self._labels = []
        self._spatial_temporal_idx = []
        # Chunked csv loading for huge lists (reference kinetics.py:159-172):
        # only rows [SKIP_ROWS, SKIP_ROWS + LOADER_CHUNK_SIZE) are resident;
        # the trainer advances SKIP_ROWS each epoch and rebuilds the loader.
        chunk = self.cfg.DATA.LOADER_CHUNK_SIZE if self.mode == "train" else 0
        skip = self.cfg.DATA.SKIP_ROWS if chunk > 0 else 0
        clip_idx = 0
        with pathmgr.open(path_to_file) as f:
            for row_idx, line in enumerate(f):
                if chunk > 0 and (row_idx < skip or row_idx >= skip + chunk):
                    continue
                line = line.strip()
                if not line:
                    continue
                fields = line.split(self.cfg.DATA.PATH_LABEL_SEPARATOR)
                assert len(fields) == 2, f"bad line {line!r}"
                path, label = fields
                for idx in range(self._num_clips):
                    self._path_to_videos.append(
                        os.path.join(self.cfg.DATA.PATH_PREFIX, path)
                    )
                    self._labels.append(int(label))
                    self._spatial_temporal_idx.append(idx)
                    self._video_meta[clip_idx * self._num_clips + idx] = {}
                clip_idx += 1
        assert len(self._path_to_videos) > 0, (
            f"Failed to load Kinetics split {self.mode} from {path_to_file}"
        )
        logger.info(
            "Constructed kinetics dataloader (size: %d skip_rows %d) from %s",
            len(self._path_to_videos),
            skip,
            path_to_file,
        )

    def __len__(self):
        return len(self._path_to_videos)

    @property
    def num_videos(self):
        return len(self._path_to_videos)

    def __getitem__(self, index):
        cfg = self.cfg
        if self.dummy_output is not None:
            return self.dummy_output

        # Short-cycle multigrid passes (index, cycle position)
        # (reference kinetics.py:189-215).
        short_cycle_idx = None
        if isinstance(index, (tuple, list)):
            index, short_cycle_idx = index

        if self.mode in ["train", "val"]:
            temporal_sample_index = -1
            spatial_sample_index = -1
            min_scale, max_scale = cfg.DATA.TRAIN_JITTER_SCALES
            crop_size = cfg.DATA.TRAIN_CROP_SIZE
            if short_cycle_idx in (0, 1):
                crop_size = int(
                    round(
                        cfg.MULTIGRID.SHORT_CYCLE_FACTORS[short_cycle_idx]
                        * cfg.MULTIGRID.DEFAULT_S
                    )
                )
            if cfg.MULTIGRID.DEFAULT_S > 0:
                # Scale jitter proportionally to the current crop size.
                min_scale = int(
                    round(float(min_scale) * crop_size / cfg.MULTIGRID.DEFAULT_S)
                )
        else:
            temporal_sample_index = (
                self._spatial_temporal_idx[index] // cfg.TEST.NUM_SPATIAL_CROPS
            )
            spatial_sample_index = (
                self._spatial_temporal_idx[index] % cfg.TEST.NUM_SPATIAL_CROPS
                if cfg.TEST.NUM_SPATIAL_CROPS > 1
                else 1
            )
            min_scale, max_scale = [cfg.DATA.TEST_CROP_SIZE] * 2
            crop_size = cfg.DATA.TEST_CROP_SIZE

        sampling_rate = cfg.DATA.SAMPLING_RATE
        # Decode-at-scale: on the standard train path, sample the
        # short-side jitter size BEFORE decoding and fuse the resize into
        # the decoder's sws_scale (one image pass instead of decode-write +
        # resize-read-write; host memcpy bandwidth is the loader
        # bottleneck). The size is drawn from the same distribution the
        # jitter transform would use (reference transform.py:48-98), so the
        # spatial statistics are unchanged; the later jitter becomes a
        # no-op (or the sole upscale when the source is smaller).
        target_fps = cfg.DATA.TARGET_FPS
        if self.mode == "train" and cfg.DATA.TRAIN_JITTER_FPS > 0.0:
            # FPS jitter augmentation: vary the effective clip duration per
            # sample (reference kinetics.py:316-317).
            target_fps += random.uniform(0.0, cfg.DATA.TRAIN_JITTER_FPS)
        decode_at_scale = 0
        if (
            self.mode == "train"
            and cfg.DATA.DECODE_AT_SCALE
            and not cfg.DATA.TRAIN_JITTER_SCALES_RELATIVE
            and not (cfg.AUG.ENABLE and cfg.AUG.NUM_SAMPLE > 1)
            and cfg.MODEL.MODEL_NAME != "ContrastiveModel"
        ):
            from .transform import sample_jitter_size

            decode_at_scale = sample_jitter_size(
                min_scale, max_scale, cfg.DATA.INV_UNIFORM_SAMPLE
            )
            min_scale = max_scale = decode_at_scale
        # Fused decode-time crop (DATA.FUSED_DECODE_CROP): with the jitter
        # size already fixed per sample, draw the random-crop placement too
        # and let the native decoder emit exactly (T, crop, crop) via one
        # sws_scale from the source sub-rectangle — ~3x less scale+memcpy
        # work than scale-full-then-crop. Host augmentation reduces to the
        # horizontal flip. Gated to the uint8 pipeline (the float path
        # stays bit-reproducible vs the reference transform order) and off
        # under AUG/SSL recipes whose per-frame ops need the full frame.
        fused_crop = 0
        if (
            decode_at_scale
            and cfg.DATA.FUSED_DECODE_CROP
            and cfg.TPU.UINT8_PIPELINE
            and not cfg.AUG.ENABLE
            and not cfg.DATA.SSL_COLOR_JITTER
            and not cfg.DATA.TRAIN_JITTER_MOTION_SHIFT
        ):
            fused_crop = crop_size
        for i_try in range(self._num_retries):
            result = decoder.decode(
                self._path_to_videos[index],
                sampling_rate,
                cfg.DATA.NUM_FRAMES,
                clip_idx=temporal_sample_index,
                num_clips=cfg.TEST.NUM_ENSEMBLE_VIEWS,
                target_fps=target_fps,
                max_spatial_scale=(
                    cfg.DATA.DECODING_SHORT_SIZE
                    if self.mode in ["test"]
                    else decode_at_scale
                ),
                use_offset=cfg.DATA.USE_OFFSET_SAMPLING,
                backend=cfg.DATA.DECODING_BACKEND,
                crop_size=fused_crop,
                crop_fx=random.random(),
                crop_fy=random.random(),
            )
            if result is None:
                logger.warning(
                    "Failed to decode video idx %d, trial %d", index, i_try
                )
                if self.mode not in ["test"] and i_try > self._num_retries // 2:
                    index = random.randint(0, len(self._path_to_videos) - 1)
                continue
            frames, fps, _, time_frac = result
            break
        else:
            raise RuntimeError(
                f"Failed to fetch video after {self._num_retries} retries."
            )

        # SSL multi-view mode: TRAIN_CROP_NUM_TEMPORAL independently decoded
        # temporal windows x TRAIN_CROP_NUM_SPATIAL independent augmentations
        # each, min 2 views (reference multi-clip sampling,
        # kinetics.py:239-464 with DATA.TRAIN_CROP_NUM_*).
        if (
            cfg.MODEL.MODEL_NAME == "ContrastiveModel"
            and self.mode == "train"
        ):
            n_t = max(cfg.DATA.TRAIN_CROP_NUM_TEMPORAL, 1)
            n_s = max(cfg.DATA.TRAIN_CROP_NUM_SPATIAL, 1)
            if n_t * n_s < 2:
                n_s = 2
            # Extra temporal windows decoded in ONE packet sweep (native
            # multi-clip single-pass; reference decoder.py:228-370).
            # Falls back to per-view decode.
            extra_views = []
            extra_times = []
            # Pairwise temporal-gap constraints between views
            # (CONTRASTIVE.DELTA_CLIPS_MIN/MAX, reference kinetics.py:337).
            # When constrained, ALL n_t windows are drawn jointly by the
            # native multi-window decode so the constraint spans view 0 too.
            d_min = cfg.CONTRASTIVE.DELTA_CLIPS_MIN
            d_max = cfg.CONTRASTIVE.DELTA_CLIPS_MAX
            constrained = d_min > -math.inf or d_max < math.inf
            if n_t > 1:
                try:
                    result = decoder.decode_native(
                        self._path_to_videos[index],
                        sampling_rate,
                        cfg.DATA.NUM_FRAMES,
                        clip_idx=-1,
                        num_clips=cfg.TEST.NUM_ENSEMBLE_VIEWS,
                        target_fps=target_fps,
                        use_offset=cfg.DATA.USE_OFFSET_SAMPLING,
                        n_views=n_t if constrained else n_t - 1,
                        min_delta=d_min,
                        max_delta=d_max,
                    )
                    if result is not None:
                        got, got_t = result[0], result[3]
                        # n_views==1 returns a bare (T,H,W,C) clip.
                        extra_views = got if isinstance(got, list) else [got]
                        extra_times = (
                            got_t if isinstance(got_t, list) else [got_t]
                        )
                        if constrained and extra_views:
                            # Jointly-drawn window 0 replaces the main clip.
                            frames, time_frac = extra_views[0], extra_times[0]
                            extra_views = extra_views[1:]
                            extra_times = extra_times[1:]
                except Exception:
                    extra_views = []
                    extra_times = []
            views = []
            # Per-view normalized clip start time, consumed by the
            # time-indexed 2d memory bank (reference decoder returns the
            # clip's time indices, decoder.py:452-616; contrastive.py:362).
            view_times = []
            for t in range(n_t):
                if t == 0:
                    t_frames, t_time = frames, time_frac
                elif t - 1 < len(extra_views):
                    t_frames = extra_views[t - 1]
                    t_time = extra_times[t - 1]
                else:
                    # Fresh random temporal window for each extra view.
                    result = decoder.decode(
                        self._path_to_videos[index],
                        sampling_rate,
                        cfg.DATA.NUM_FRAMES,
                        clip_idx=-1,
                        num_clips=cfg.TEST.NUM_ENSEMBLE_VIEWS,
                        target_fps=target_fps,
                        use_offset=cfg.DATA.USE_OFFSET_SAMPLING,
                        backend=cfg.DATA.DECODING_BACKEND,
                    )
                    if result is not None:
                        t_frames, t_time = result[0], result[3]
                    else:
                        t_frames, t_time = frames, time_frac
                if cfg.DATA.TIME_DIFF_PROB > 0:
                    # Raw-frame temporal-difference aug, drawn ONCE per
                    # decoded temporal view as in the reference
                    # (decoder.py:574-596) — spatial crops of a view agree
                    # on time-diff. Frames stay float (no re-quantization);
                    # _process_clip handles float 0..255 input.
                    from .transform import augment_raw_frames

                    t_frames, _ = augment_raw_frames(
                        t_frames, time_diff_prob=cfg.DATA.TIME_DIFF_PROB
                    )
                for _ in range(n_s):
                    views.append(
                        self._process_clip(
                            t_frames, spatial_sample_index, min_scale,
                            max_scale, crop_size,
                        )
                    )
                    view_times.append(t_time)
            label = self._labels[index]
            return views, label, index, np.asarray(view_times, np.float32), {}

        label = self._labels[index]
        time_out = np.asarray([time_frac], np.float32)

        # Repeated augmentation (reference kinetics.py:359-464 via
        # AUG.NUM_SAMPLE + multiple_samples_collate): the SAME decoded clip
        # is independently augmented NUM_SAMPLE times; labels/indices are
        # replicated and the collate flattens samples into the batch axis.
        num_aug = (
            cfg.AUG.NUM_SAMPLE
            if self.mode == "train" and cfg.AUG.ENABLE
            else 1
        )
        if num_aug > 1:
            f_out, l_out, i_out, t_out, m_out = [], [], [], [], []
            for _ in range(num_aug):
                f_out.append(
                    self._process_clip(
                        frames, spatial_sample_index, min_scale, max_scale,
                        crop_size,
                    )
                )
                l_out.append(label)
                i_out.append(index)
                t_out.append(time_out)
                m_out.append(
                    {"mask": self._gen_mask()} if cfg.AUG.GEN_MASK_LOADER else {}
                )
            if cfg.DATA.DUMMY_LOAD and self.dummy_output is None:
                self.dummy_output = (f_out, l_out, i_out, t_out, m_out)
            return f_out, l_out, i_out, t_out, m_out

        frames = self._process_clip(
            frames,
            spatial_sample_index,
            min_scale,
            max_scale,
            crop_size,
            # The fused crop can fall back (cv2 backend, exotic pixel
            # format, undersized frame): trust the emitted dims, not the
            # request.
            pre_cropped=(
                fused_crop > 0
                and np.asarray(frames).shape[1:3] == (crop_size, crop_size)
            ),
        )
        meta = {}
        if cfg.AUG.GEN_MASK_LOADER:
            meta["mask"] = self._gen_mask()
        if cfg.DATA.DUMMY_LOAD and self.dummy_output is None:
            self.dummy_output = (frames, label, index, time_out, meta)
        return frames, label, index, time_out, meta

    def _gen_mask(self):
        return gen_mask(self.cfg)

    def _process_clip(
        self,
        frames,
        spatial_sample_index,
        min_scale,
        max_scale,
        crop_size,
        pre_cropped=False,
    ):
        cfg = self.cfg
        # Float frames arrive in 0..255 units (the SSL raw-frame time-diff
        # aug keeps floats to skip a re-quantization; the reference divides
        # by 255 unconditionally after decode, kinetics.py:375-376).
        frames = np.asarray(frames)
        is_float255 = frames.dtype != np.uint8
        if self.mode == "train" and cfg.DATA.SSL_COLOR_JITTER:
            # SSL color recipe on [0,1] floats BEFORE RandAugment
            # (reference kinetics.py:375-387).
            from .transform import color_jitter_video_ssl

            f = frames.astype(np.float32) / 255.0
            f = color_jitter_video_ssl(
                f,
                bri_con_sat=cfg.DATA.SSL_COLOR_BRI_CON_SAT,
                hue=cfg.DATA.SSL_COLOR_HUE,
                p_convert_gray=cfg.DATA.COLOR_RND_GRAYSCALE,
                moco_v2_aug=cfg.DATA.SSL_MOCOV2_AUG,
                gaussan_sigma_min=cfg.DATA.SSL_BLUR_SIGMA_MIN,
                gaussan_sigma_max=cfg.DATA.SSL_BLUR_SIGMA_MAX,
            )
            frames = np.clip(f, 0.0, 1.0) * 255.0
            is_float255 = True
        if self.randaug is not None:
            if is_float255:
                # RandAugment operates on uint8 images.
                frames = np.clip(frames, 0, 255).astype(np.uint8)
                is_float255 = False
            frames = self.randaug(frames)
        # uint8 pipeline: spatial resampling happens in uint8 and the
        # normalize + pathway split run ON DEVICE inside the train step
        # (ops/preprocess.py). Bilinear resize commutes with the affine
        # normalization, so the only deviation from the reference's float
        # path is one uint8 rounding after resize.
        uint8_path = (
            cfg.TPU.UINT8_PIPELINE
            and cfg.MODEL.MODEL_NAME != "ContrastiveModel"
        )
        if not uint8_path:
            # tensor_normalize scales uint8 by /255 itself; float frames
            # are pre-scaled to [0,1] here (they carry 0..255 units).
            frames = data_utils.tensor_normalize(
                frames.astype(np.float32) / 255.0 if is_float255 else frames,
                cfg.DATA.MEAN,
                cfg.DATA.STD,
            )
        elif frames.dtype != np.uint8:
            frames = np.clip(frames, 0, 255).astype(np.uint8)
        scl, asp = cfg.DATA.TRAIN_JITTER_SCALES_RELATIVE, cfg.DATA.TRAIN_JITTER_ASPECT_RELATIVE
        if pre_cropped:
            # Fused decode-time crop (DATA.FUSED_DECODE_CROP): the native
            # decoder already emitted the (T, crop, crop) window at scale;
            # only the horizontal flip remains on host.
            if cfg.DATA.RANDOM_FLIP:
                from . import transform

                frames = transform.horizontal_flip(0.5, frames)
        else:
            frames = data_utils.spatial_sampling(
                frames,
                spatial_idx=spatial_sample_index,
                min_scale=min_scale,
                max_scale=max_scale,
                crop_size=crop_size,
                random_horizontal_flip=cfg.DATA.RANDOM_FLIP,
                inverse_uniform_sampling=cfg.DATA.INV_UNIFORM_SAMPLE,
                aspect_ratio=asp if asp else None,
                scale=scl if scl else None,
                motion_shift=(
                    cfg.DATA.TRAIN_JITTER_MOTION_SHIFT
                    if self.mode == "train"
                    else False
                ),
            )
        if self.mode == "train" and cfg.AUG.ENABLE and cfg.AUG.RE_PROB > 0:
            from .random_erasing import RandomErasing

            re = RandomErasing(
                cfg.AUG.RE_PROB,
                mode=cfg.AUG.RE_MODE,
                max_count=cfg.AUG.RE_COUNT,
                num_splits=cfg.AUG.RE_COUNT,
            )
            frames = re(frames)
        if uint8_path:
            # Single uint8 clip; the device does normalize + pathway split.
            return [np.ascontiguousarray(frames)]
        return data_utils.pack_pathway_output(cfg, frames.astype(np.float32))


def gen_mask(cfg):
    """MaskFeat mask generation (reference kinetics.py:470-504):
    tube / per-frame / 3D-block masking at MASK_WINDOW_SIZE granularity.
    2D-patch models get the image-style feature-geometry mask."""
    from .transform import MaskingGenerator, MaskingGenerator3D

    if cfg.MVIT.PATCH_2D:
        from .imagenet import _maskfeat_mask

        return _maskfeat_mask(cfg)

    win = cfg.AUG.MASK_WINDOW_SIZE
    ratio = cfg.AUG.MASK_RATIO
    if cfg.AUG.MASK_TUBE:
        num = round(win[1] * win[2] * ratio)
        m = MaskingGenerator(
            (win[1], win[2]), num,
            max_num_patches=cfg.AUG.MAX_MASK_PATCHES_PER_BLOCK,
        )()
        return np.tile(m[None], (win[0], 1, 1)).astype(np.float32)
    if cfg.AUG.MASK_FRAMES:
        m = np.zeros(win, np.float32)
        n_frames = round(win[0] * ratio)
        idx = np.random.permutation(win[0])[:n_frames]
        m[idx] = 1.0
        return m
    num = round(np.prod(win) * ratio)
    return MaskingGenerator3D(
        win, num, max_num_patches=cfg.AUG.MAX_MASK_PATCHES_PER_BLOCK
    )().astype(np.float32)


@DATASET_REGISTRY.register(name="Syntheticvideo")
class Syntheticvideo:
    """Synthetic clips: the DUMMY_LOAD-style fixture as a first-class dataset
    (SURVEY.md §4) for benchmarks and tests without real data."""

    def __init__(self, cfg, mode, num_retries=1):
        self.cfg = cfg
        self.mode = mode
        # DATA.SYNTHETIC_SIZE (optional, 0 = default sizing) controls the
        # set size so integration tests can run a few-step epoch.
        override = getattr(cfg.DATA, "SYNTHETIC_SIZE", 0)
        self._size = override or (256 if mode == "train" else 64)
        self._rng = np.random.RandomState(0)
        if mode == "test":
            self._num_clips = (
                cfg.TEST.NUM_ENSEMBLE_VIEWS * cfg.TEST.NUM_SPATIAL_CROPS
            )
            self._size *= self._num_clips
        else:
            self._num_clips = 1

    def __len__(self):
        return self._size

    @property
    def num_videos(self):
        return self._size

    def __getitem__(self, index):
        cfg = self.cfg
        short_cycle_idx = None
        if isinstance(index, (tuple, list)):
            index, short_cycle_idx = index
        crop = (
            cfg.DATA.TRAIN_CROP_SIZE
            if self.mode in ("train", "val")
            else cfg.DATA.TEST_CROP_SIZE
        )
        if short_cycle_idx in (0, 1) and cfg.MULTIGRID.DEFAULT_S > 0:
            crop = int(
                round(
                    cfg.MULTIGRID.SHORT_CYCLE_FACTORS[short_cycle_idx]
                    * cfg.MULTIGRID.DEFAULT_S
                )
            )
        t = cfg.DATA.NUM_FRAMES
        rng = np.random.RandomState(index)
        frames = rng.randint(0, 255, (t, crop, crop, 3), np.uint8)
        if cfg.TPU.UINT8_PIPELINE and cfg.MODEL.MODEL_NAME != "ContrastiveModel":
            inputs = [frames]
        else:
            frames = data_utils.tensor_normalize(
                frames, cfg.DATA.MEAN, cfg.DATA.STD
            )
            inputs = data_utils.pack_pathway_output(
                cfg, frames.astype(np.float32)
            )
        if cfg.DETECTION.ENABLE:
            # Synthetic detection sample: 1-5 boxes with multi-hot labels,
            # matching the AVA dataset item contract (ava_dataset.py).
            n = int(rng.randint(1, 6))
            xy1 = rng.rand(n, 2) * (crop / 2)
            wh = rng.rand(n, 2) * (crop / 2) + 2.0
            boxes = np.concatenate([xy1, xy1 + wh], axis=1).astype(np.float32)
            labels = (
                rng.rand(n, cfg.MODEL.NUM_CLASSES) < 0.2
            ).astype(np.float32)
            meta = {
                "boxes": boxes,
                "ori_boxes": boxes / crop,
                "metadata": [[index, 900 + index]] * n,
            }
            return inputs, labels, index, np.zeros((1,)), meta
        # In test mode every view of a video must carry the same label
        # (TestMeter ensembles per video and checks consistency), so seed
        # the label by video id, not clip id.
        label_rng = np.random.RandomState(index // self._num_clips)
        label = int(label_rng.randint(0, cfg.MODEL.NUM_CLASSES))
        num_aug = (
            cfg.AUG.NUM_SAMPLE
            if self.mode == "train" and cfg.AUG.ENABLE
            else 1
        )
        if num_aug > 1:
            # Repeated augmentation contract (see Kinetics.__getitem__).
            return (
                [inputs] * num_aug,
                [label] * num_aug,
                [index] * num_aug,
                [np.zeros((1,))] * num_aug,
                [{}] * num_aug,
            )
        return (
            inputs,
            label,
            index,
            np.zeros((1,)),
            {"mask": gen_mask(cfg)} if cfg.AUG.GEN_MASK_LOADER else {},
        )


# The reference's pytorchvideo-backed dataset variants (Ptvkinetics etc.,
# reference ptv_datasets.py:133-427) map to the native datasets here.
DATASET_REGISTRY.register(Kinetics, name="Ptvkinetics")
