"""Something-Something V2 dataset (reference slowfast/datasets/ssv2.py:22-318).

JSON label maps + frame lists; uniform temporal sampling across the whole
video (SSv2 videos are short); same spatial pipeline as Kinetics.
"""

import json
import os
import random

import numpy as np

from slowfast_tpu.utils import logging as logging_utils
from slowfast_tpu.utils.io import pathmgr
from . import utils as data_utils
from .build import DATASET_REGISTRY

logger = logging_utils.get_logger(__name__)


@DATASET_REGISTRY.register(name="Ssv2")
class Ssv2:
    def __init__(self, cfg, mode, num_retries=10):
        assert mode in ["train", "val", "test"]
        self.mode = mode
        self.cfg = cfg
        self._num_retries = num_retries
        if mode in ["train", "val"]:
            self._num_clips = 1
        else:
            self._num_clips = cfg.TEST.NUM_ENSEMBLE_VIEWS * cfg.TEST.NUM_SPATIAL_CROPS
        self._construct_loader()

    def _construct_loader(self):
        cfg = self.cfg
        # Label mapping.
        with pathmgr.open(
            os.path.join(
                cfg.DATA.PATH_TO_DATA_DIR,
                "something-something-v2-labels.json",
            )
        ) as f:
            label_dict = json.load(f)
        # Per-video labels.
        split = "train" if self.mode == "train" else "validation"
        with pathmgr.open(
            os.path.join(
                cfg.DATA.PATH_TO_DATA_DIR, f"something-something-v2-{split}.json"
            )
        ) as f:
            label_json = json.load(f)
        self._video_names = []
        self._labels = []
        for video in label_json:
            video_name = video["id"]
            template = video["template"].replace("[", "").replace("]", "")
            self._video_names.append(video_name)
            self._labels.append(int(label_dict[template]))

        # Frame lists.
        split_name = "train" if self.mode == "train" else "val"
        path_to_file = os.path.join(
            cfg.DATA.PATH_TO_DATA_DIR, f"{split_name}.csv"
        )
        from collections import defaultdict

        self._path_to_videos = defaultdict(list)
        with pathmgr.open(path_to_file) as f:
            f.readline()
            for line in f:
                row = line.split()
                self._path_to_videos[row[0]].append(
                    os.path.join(cfg.DATA.PATH_PREFIX, row[3])
                )

        # Expand for multi-view test.
        names, labels, frame_lists, sti = [], [], [], []
        for name, label in zip(self._video_names, self._labels):
            if name not in self._path_to_videos:
                continue
            for idx in range(self._num_clips):
                names.append(name)
                labels.append(label)
                frame_lists.append(self._path_to_videos[name])
                sti.append(idx)
        self._video_names = names
        self._labels = labels
        self._frame_lists = frame_lists
        self._spatial_temporal_idx = sti
        logger.info(
            "Something-Something V2 dataloader constructed (size: %d)",
            len(self._video_names),
        )

    def __len__(self):
        return len(self._video_names)

    @property
    def num_videos(self):
        return len(self._video_names)

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

        num_frames = cfg.DATA.NUM_FRAMES
        video_length = len(self._frame_lists[index])
        seg_size = float(video_length - 1) / num_frames
        seq = []
        for i in range(num_frames):
            start = int(np.round(seg_size * i))
            end = int(np.round(seg_size * (i + 1)))
            if self.mode == "train":
                seq.append(random.randint(start, end))
            else:
                seq.append((start + end) // 2)

        frames = data_utils.retry_load_images(
            [self._frame_lists[index][f] for f in seq]
        )
        frames = np.stack([f[:, :, ::-1] for f in frames])  # BGR->RGB, (T,H,W,C)
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
        label = self._labels[index]
        return (
            data_utils.pack_pathway_output(cfg, frames.astype(np.float32)),
            label,
            index,
            np.zeros((1,)),
            {},
        )


DATASET_REGISTRY.register(Ssv2, name="Ptvssv2")
