"""ImageNet dataset (reference slowfast/datasets/imagenet.py:27-268).

Directory-tree layout; train: random-resized-crop + flip (+randaug/erasing);
test: short-side scale + center crop with IN_VAL_CROP_RATIO. Images are
returned as single-frame clips (T=1) through the standard pathway packing.
"""

import math
import os
import random

import numpy as np

from slowfast_tpu.utils import logging as logging_utils
from slowfast_tpu.utils.io import pathmgr
from . import transform
from . import utils as data_utils
from .build import DATASET_REGISTRY

logger = logging_utils.get_logger(__name__)


@DATASET_REGISTRY.register(name="Imagenet")
class Imagenet:
    def __init__(self, cfg, mode, num_retries=10):
        assert mode in ["train", "val", "test"]
        self.mode = "val" if mode == "test" else mode
        self.cfg = cfg
        self._construct_imdb()
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

    def _construct_imdb(self):
        if self.cfg.DATA.PATH_TO_PRELOAD_IMDB:
            # Preloaded imdb: {mode}.json with [{im_path, class}] entries
            # (reference imagenet.py:41-56) — skips the directory walk for
            # huge datasets on slow filesystems.
            import json

            path = os.path.join(
                self.cfg.DATA.PATH_TO_PRELOAD_IMDB, f"{self.mode}.json"
            )
            with pathmgr.open(path) as f:
                self._imdb = json.load(f)
            self._class_ids = {}
            logger.info(
                "Loaded imagenet imdb (size: %d) from %s", len(self._imdb), path
            )
            return
        split_path = os.path.join(self.cfg.DATA.PATH_TO_DATA_DIR, self.mode)
        assert pathmgr.exists(split_path), f"{split_path} not found"
        classes = sorted(
            d for d in os.listdir(split_path)
            if os.path.isdir(os.path.join(split_path, d))
        )
        self._class_ids = {c: i for i, c in enumerate(classes)}
        self._imdb = []
        for c in classes:
            cdir = os.path.join(split_path, c)
            for fname in sorted(os.listdir(cdir)):
                self._imdb.append(
                    {"im_path": os.path.join(cdir, fname), "class": self._class_ids[c]}
                )
        logger.info("Constructed imagenet imdb (size: %d)", len(self._imdb))

    def __len__(self):
        return len(self._imdb)

    @property
    def num_videos(self):
        return len(self._imdb)

    def __getitem__(self, index):
        import cv2

        cfg = self.cfg
        entry = self._imdb[index]
        img = cv2.imread(entry["im_path"])
        img = img[:, :, ::-1]  # BGR -> RGB
        frames = img[None]  # (1, H, W, C)

        crop = cfg.DATA.TRAIN_CROP_SIZE
        if self.mode == "train":
            if self.randaug is not None:
                frames = self.randaug(frames.astype(np.uint8))
            frames = data_utils.tensor_normalize(frames, cfg.DATA.MEAN, cfg.DATA.STD)
            frames = transform.random_resized_crop(
                frames, crop, crop, scale=(0.08, 1.0), ratio=(3 / 4, 4 / 3)
            )
            frames = transform.horizontal_flip(0.5, frames)
            if cfg.AUG.ENABLE and cfg.AUG.RE_PROB > 0:
                from .random_erasing import RandomErasing

                frames = RandomErasing(cfg.AUG.RE_PROB, mode=cfg.AUG.RE_MODE)(frames)
        else:
            test_crop = cfg.DATA.TEST_CROP_SIZE
            scale_size = int(round(test_crop / cfg.DATA.IN_VAL_CROP_RATIO))
            frames = data_utils.tensor_normalize(frames, cfg.DATA.MEAN, cfg.DATA.STD)
            frames = transform.random_short_side_scale_jitter(
                frames, scale_size, scale_size
            )
            frames = transform.uniform_crop(frames, test_crop, 1)

        label = entry["class"]
        meta = {}
        if self.mode == "train" and cfg.AUG.GEN_MASK_LOADER:
            meta["mask"] = _maskfeat_mask(cfg)
        return (
            data_utils.pack_pathway_output(cfg, np.ascontiguousarray(frames, np.float32)),
            label,
            index,
            np.zeros((1,)),
            meta,
        )


def _maskfeat_mask(cfg):
    """2D MaskFeat mask at the PRETRAIN_DEPTH feature geometry
    (reference imagenet.py:170-206: window = feat size at the deepest
    pretrain depth, num = h*w*MASK_RATIO, min = num//5)."""
    from slowfast_tpu.models.mvit import maskfeat_feature_size

    from .transform import MaskingGenerator

    h = maskfeat_feature_size(cfg)
    num = round(h * h * cfg.AUG.MASK_RATIO)
    gen = MaskingGenerator(
        (h, h),
        num,
        min_num_patches=max(num // 5, 1),
        max_num_patches=cfg.AUG.MAX_MASK_PATCHES_PER_BLOCK,
    )
    return gen().astype(np.float32)
