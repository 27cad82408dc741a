"""AVA annotation loading (reference slowfast/datasets/ava_helper.py:16-149)."""

import os
from collections import defaultdict

from slowfast_tpu.utils import logging as logging_utils
from slowfast_tpu.utils.io import pathmgr

logger = logging_utils.get_logger(__name__)

FPS = 30
AVA_VALID_FRAMES = range(902, 1799)


def load_image_lists(cfg, is_train):
    """Frame lists: ``original_video_id video_id frame_id path labels``.

    Returns (image_paths [video][frame], video_idx_to_name).
    """
    list_filenames = [
        os.path.join(cfg.AVA.FRAME_LIST_DIR, f)
        for f in (cfg.AVA.TRAIN_LISTS if is_train else cfg.AVA.TEST_LISTS)
    ]
    image_paths = defaultdict(list)
    video_name_to_idx = {}
    video_idx_to_name = []
    for list_filename in list_filenames:
        with pathmgr.open(list_filename, "r") as f:
            header = f.readline()
            for line in f:
                row = line.split()
                assert len(row) == 5
                video_name = row[0]
                if video_name not in video_name_to_idx:
                    idx = len(video_name_to_idx)
                    video_name_to_idx[video_name] = idx
                    video_idx_to_name.append(video_name)
                data_key = video_name_to_idx[video_name]
                image_paths[data_key].append(
                    os.path.join(cfg.AVA.FRAME_DIR, row[3])
                )
    image_paths = [image_paths[i] for i in range(len(image_paths))]
    logger.info("Finished loading image paths from: %s", ", ".join(list_filenames))
    return image_paths, video_idx_to_name


def load_boxes_and_labels(cfg, mode):
    """GT + predicted box csvs with score threshold
    (reference ava_helper.py:63-105)."""
    gt_lists = cfg.AVA.TRAIN_GT_BOX_LISTS if mode == "train" else []
    pred_lists = (
        cfg.AVA.TRAIN_PREDICT_BOX_LISTS
        if mode == "train"
        else cfg.AVA.TEST_PREDICT_BOX_LISTS
    )
    ann_filenames = [
        os.path.join(cfg.AVA.ANNOTATION_DIR, f) for f in gt_lists + pred_lists
    ]
    ann_is_gt_box = [True] * len(gt_lists) + [False] * len(pred_lists)

    detect_thresh = cfg.AVA.DETECTION_SCORE_THRESH
    all_boxes = {}
    count = 0
    unique_box_count = 0
    for filename, is_gt_box in zip(ann_filenames, ann_is_gt_box):
        with pathmgr.open(filename, "r") as f:
            for line in f:
                row = line.strip().split(",")
                if not is_gt_box:
                    score = float(row[7])
                    if score < detect_thresh:
                        continue
                video_name, frame_sec = row[0], int(row[1])
                if mode == "train" and frame_sec not in AVA_VALID_FRAMES:
                    continue
                box_key = ",".join(row[2:6])
                box = list(map(float, row[2:6]))
                label = -1 if row[6] == "" else int(row[6])
                if video_name not in all_boxes:
                    all_boxes[video_name] = {}
                    for sec in AVA_VALID_FRAMES:
                        all_boxes[video_name][sec] = {}
                if frame_sec not in all_boxes[video_name]:
                    all_boxes[video_name][frame_sec] = {}
                if box_key not in all_boxes[video_name][frame_sec]:
                    all_boxes[video_name][frame_sec][box_key] = [box, []]
                    unique_box_count += 1
                if label != -1:
                    all_boxes[video_name][frame_sec][box_key][1].append(label)
                count += 1

    for video_name in all_boxes:
        for frame_sec in list(all_boxes[video_name].keys()):
            all_boxes[video_name][frame_sec] = list(
                all_boxes[video_name][frame_sec].values()
            )
    logger.info(
        "Finished loading annotations: %d boxes (%d unique)", count, unique_box_count
    )
    return all_boxes


def get_keyframe_data(boxes_and_labels):
    """Keyframe indices + boxes per (video, sec)
    (reference ava_helper.py:107-149)."""

    def sec_to_frame(sec):
        return (sec - 900) * FPS

    keyframe_indices = []
    keyframe_boxes_and_labels = []
    count = 0
    for video_idx, video in enumerate(boxes_and_labels):
        sec_idx = 0
        keyframe_boxes_and_labels.append([])
        for sec in video.keys():
            if sec not in AVA_VALID_FRAMES:
                continue
            if len(video[sec]) > 0:
                keyframe_indices.append((video_idx, sec_idx, sec, sec_to_frame(sec)))
                keyframe_boxes_and_labels[video_idx].append(video[sec])
                sec_idx += 1
                count += 1
    logger.info("%d keyframes used.", count)
    return keyframe_indices, keyframe_boxes_and_labels


def get_num_boxes_used(keyframe_indices, keyframe_boxes_and_labels):
    count = 0
    for video_idx, sec_idx, _, _ in keyframe_indices:
        count += len(keyframe_boxes_and_labels[video_idx][sec_idx])
    return count
