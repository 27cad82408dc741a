"""Charades dataset (reference slowfast/datasets/charades.py:20-246).

Frame lists with per-frame multi-labels; video-level multi-hot aggregation.
"""

import os
import random

import numpy as np

from slowfast_tpu.utils import logging as logging_utils
from slowfast_tpu.utils.io import pathmgr
from . import utils as data_utils
from .build import DATASET_REGISTRY

logger = logging_utils.get_logger(__name__)


@DATASET_REGISTRY.register(name="Charades")
class Charades:
    def __init__(self, cfg, mode, num_retries=10):
        assert mode in ["train", "val", "test"]
        self.mode = mode
        self.cfg = cfg
        if mode in ["train", "val"]:
            self._num_clips = 1
        else:
            self._num_clips = cfg.TEST.NUM_ENSEMBLE_VIEWS * cfg.TEST.NUM_SPATIAL_CROPS
        self._construct_loader()

    def _construct_loader(self):
        cfg = self.cfg
        split = "train" if self.mode == "train" else "val"
        path_to_file = os.path.join(cfg.DATA.PATH_TO_DATA_DIR, f"{split}.csv")
        assert pathmgr.exists(path_to_file), f"{path_to_file} not found"
        from collections import defaultdict

        paths = defaultdict(list)
        labels = defaultdict(list)
        with pathmgr.open(path_to_file) as f:
            f.readline()
            for line in f:
                row = line.split()
                video_name = row[0]
                paths[video_name].append(os.path.join(cfg.DATA.PATH_PREFIX, row[3]))
                frame_labels = row[-1].replace('"', "")
                if frame_labels:
                    labels[video_name].append(
                        [int(x) for x in frame_labels.split(",")]
                    )
                else:
                    labels[video_name].append([])

        self._video_names = []
        self._path_to_videos = []
        self._labels = []
        self._spatial_temporal_idx = []
        for name in paths:
            for idx in range(self._num_clips):
                self._video_names.append(name)
                self._path_to_videos.append(paths[name])
                self._labels.append(labels[name])
                self._spatial_temporal_idx.append(idx)
        logger.info(
            "Charades dataloader constructed (size: %d)", len(self._path_to_videos)
        )

    def __len__(self):
        return len(self._path_to_videos)

    @property
    def num_videos(self):
        return len(self._path_to_videos)

    def get_seq_frames(self, index):
        cfg = self.cfg
        num_frames = cfg.DATA.NUM_FRAMES
        sampling_rate = cfg.DATA.SAMPLING_RATE
        video_length = len(self._path_to_videos[index])

        clip_length = (num_frames - 1) * sampling_rate + 1
        if clip_length > video_length:
            start = random.randint(video_length - clip_length, 0)
        else:
            if self.mode == "train":
                start = random.randint(0, video_length - clip_length)
            else:
                temporal_idx = (
                    self._spatial_temporal_idx[index] // cfg.TEST.NUM_SPATIAL_CROPS
                )
                gap = max(video_length - clip_length, 0)
                start = int(
                    gap * temporal_idx / max(cfg.TEST.NUM_ENSEMBLE_VIEWS - 1, 1)
                )
        seq = [
            max(min(start + i * sampling_rate, video_length - 1), 0)
            for i in range(num_frames)
        ]
        return seq

    def __getitem__(self, index):
        cfg = self.cfg
        if self.mode in ["train", "val"]:
            spatial_sample_index = -1
            min_scale, max_scale = cfg.DATA.TRAIN_JITTER_SCALES
            crop_size = cfg.DATA.TRAIN_CROP_SIZE
        else:
            spatial_sample_index = (
                self._spatial_temporal_idx[index] % cfg.TEST.NUM_SPATIAL_CROPS
            )
            min_scale, max_scale = [cfg.DATA.TEST_CROP_SIZE] * 2
            crop_size = cfg.DATA.TEST_CROP_SIZE

        seq = self.get_seq_frames(index)
        frames = data_utils.retry_load_images(
            [self._path_to_videos[index][f] for f in seq]
        )
        frames = np.stack([f[:, :, ::-1] for f in frames])
        frames = data_utils.tensor_normalize(frames, cfg.DATA.MEAN, cfg.DATA.STD)
        frames = data_utils.spatial_sampling(
            frames,
            spatial_idx=spatial_sample_index,
            min_scale=min_scale,
            max_scale=max_scale,
            crop_size=crop_size,
            random_horizontal_flip=cfg.DATA.RANDOM_FLIP,
            inverse_uniform_sampling=cfg.DATA.INV_UNIFORM_SAMPLE,
        )

        # Video-level multi-hot aggregation over the clip's frames
        # (reference datasets/utils.py:204-232 aggregation).
        label_list = [self._labels[index][f] for f in seq]
        label = np.zeros((cfg.MODEL.NUM_CLASSES,), np.float32)
        for frame_labels in label_list:
            for l in frame_labels:
                label[l] = 1.0

        return (
            data_utils.pack_pathway_output(cfg, frames.astype(np.float32)),
            label,
            index,
            np.zeros((1,)),
            {},
        )


DATASET_REGISTRY.register(Charades, name="Ptvcharades")
