"""Frame-based dataset host paths: SSv2, Charades, ImageNet.

These exercise the frame-list parsing + retry_load_images (the native
batch JPEG decoder with cv2 fallback) end to end on synthetic fixtures
(reference ssv2.py:22-318, charades.py:20-246, imagenet.py).
"""

import json
import os

import numpy as np
import pytest

from slowfast_tpu.config import get_cfg
from slowfast_tpu.config.defaults import assert_and_infer_cfg


def _write_frames(d, video, n):
    cv2 = pytest.importorskip("cv2")
    rs = np.random.RandomState(hash(video) % 2**31)
    rels = []
    os.makedirs(os.path.join(d, video), exist_ok=True)
    for i in range(n):
        rel = f"{video}/{video}_{i:06d}.jpg"
        img = (rs.rand(112, 144, 3) * 255).astype(np.uint8)
        cv2.imwrite(os.path.join(d, rel), img)
        rels.append(rel)
    return rels


@pytest.fixture(scope="module")
def frame_root(tmp_path_factory):
    return str(tmp_path_factory.mktemp("frames"))


def _base_cfg(root):
    cfg = get_cfg()
    cfg.DATA.PATH_TO_DATA_DIR = root
    cfg.DATA.PATH_PREFIX = root
    cfg.DATA.NUM_FRAMES = 4
    cfg.DATA.SAMPLING_RATE = 2
    cfg.DATA.TRAIN_CROP_SIZE = 64
    cfg.DATA.TRAIN_JITTER_SCALES = [70, 90]
    # Single-pathway arch: with the slowfast default, a 4-frame test clip
    # would pack an empty (T//alpha = 0) slow pathway.
    cfg.MODEL.ARCH = "c2d"
    cfg.NUM_GPUS = 1
    return cfg


def test_ssv2_dataset(frame_root):
    from slowfast_tpu.data.ssv2 import Ssv2

    d = frame_root
    with open(os.path.join(d, "something-something-v2-labels.json"), "w") as f:
        json.dump({"Doing thing A": "0", "Doing thing B": "1"}, f)
    vids = [("12345", "Doing thing A"), ("67890", "Doing [thing] B")]
    with open(os.path.join(d, "something-something-v2-train.json"), "w") as f:
        json.dump([{"id": v, "template": t} for v, t in vids], f)
    rows = ["original_vido_id video_id frame_id path labels"]
    for v, _ in vids:
        for i, rel in enumerate(_write_frames(d, v, 12)):
            rows.append(f"{v} {v} {i} {rel} \"\"")
    with open(os.path.join(d, "train.csv"), "w") as f:
        f.write("\n".join(rows) + "\n")

    cfg = _base_cfg(d)
    cfg.TRAIN.DATASET = "ssv2"
    cfg = assert_and_infer_cfg(cfg)
    ds = Ssv2(cfg, "train")
    assert len(ds) == 2
    frames, label, index, times, meta = ds[1]
    clip = frames[0] if isinstance(frames, list) else frames
    assert clip.shape[0] == 4 and clip.shape[1] == 64
    assert label == 1  # bracket-stripped template maps to class 1


def test_charades_dataset(frame_root):
    from slowfast_tpu.data.charades import Charades

    d = frame_root
    rows = ["original_vido_id video_id frame_id path labels"]
    for v, lab in [("AAAAA", "0,2"), ("BBBBB", "1")]:
        for i, rel in enumerate(_write_frames(d, v, 10)):
            rows.append(f'{v} {v} {i} {rel} "{lab}"')
    with open(os.path.join(d, "train.csv"), "w") as f:
        f.write("\n".join(rows) + "\n")

    cfg = _base_cfg(d)
    cfg.TRAIN.DATASET = "charades"
    cfg.MODEL.NUM_CLASSES = 4
    cfg = assert_and_infer_cfg(cfg)
    ds = Charades(cfg, "train")
    assert len(ds) == 2
    frames, label, index, times, meta = ds[0]
    clip = frames[0] if isinstance(frames, list) else frames
    assert clip.shape[0] == 4 and clip.shape[1] == 64
    # Multi-hot video-level label.
    label = np.asarray(label)
    assert label.shape == (4,)
    assert label[0] == 1 and label[2] == 1 and label[1] == 0


def test_imagenet_dataset(tmp_path):
    from slowfast_tpu.data.imagenet import Imagenet

    cv2 = pytest.importorskip("cv2")
    d = str(tmp_path)
    rs = np.random.RandomState(0)
    for cls in ("n01", "n02"):
        os.makedirs(os.path.join(d, "train", cls), exist_ok=True)
        for i in range(2):
            img = (rs.rand(80, 100, 3) * 255).astype(np.uint8)
            cv2.imwrite(os.path.join(d, "train", cls, f"{cls}_{i}.JPEG"), img)

    cfg = get_cfg()
    cfg.DATA.PATH_TO_DATA_DIR = d
    cfg.DATA.TRAIN_CROP_SIZE = 64
    cfg.TRAIN.DATASET = "imagenet"
    cfg.NUM_GPUS = 1
    cfg = assert_and_infer_cfg(cfg)
    ds = Imagenet(cfg, "train")
    assert len(ds) == 4
    item = ds[0]
    frames = item[0]
    clip = frames[0] if isinstance(frames, list) else frames
    assert clip.shape[-3:] == (64, 64, 3) or clip.shape[-2:] == (64, 3)


def test_ava_dataset(tmp_path):
    """AVA frame lists + GT box csv -> keyframe clip with boxes
    (reference ava_helper.py:14-105 + ava_dataset.py)."""
    from slowfast_tpu.data.ava_dataset import Ava

    cv2 = pytest.importorskip("cv2")
    d = str(tmp_path)
    video = "vid001"
    os.makedirs(os.path.join(d, "frames", video), exist_ok=True)
    rs = np.random.RandomState(1)
    # Keyframe for sec=902 is frame (902-900)*30 = 60; cover its window.
    rows = ["original_vido_id video_id frame_id path labels"]
    for i in range(120):
        rel = f"{video}/{video}_{i:06d}.jpg"
        cv2.imwrite(
            os.path.join(d, "frames", rel),
            (rs.rand(112, 144, 3) * 255).astype(np.uint8),
        )
        rows.append(f'{video} 0 {i} {rel} ""')
    os.makedirs(os.path.join(d, "lists"), exist_ok=True)
    with open(os.path.join(d, "lists", "train.csv"), "w") as f:
        f.write("\n".join(rows) + "\n")
    os.makedirs(os.path.join(d, "ann"), exist_ok=True)
    with open(os.path.join(d, "ann", "ava_train_v2.2.csv"), "w") as f:
        f.write(f"{video},902,0.1,0.1,0.6,0.7,5\n")
        f.write(f"{video},902,0.1,0.1,0.6,0.7,9\n")   # same box, 2nd label
        f.write(f"{video},902,0.3,0.2,0.9,0.9,12\n")

    cfg = get_cfg()
    cfg.DETECTION.ENABLE = True
    cfg.TRAIN.DATASET = "ava"
    cfg.AVA.FRAME_DIR = os.path.join(d, "frames")
    cfg.AVA.FRAME_LIST_DIR = os.path.join(d, "lists")
    cfg.AVA.ANNOTATION_DIR = os.path.join(d, "ann")
    cfg.DATA.NUM_FRAMES = 4
    cfg.DATA.SAMPLING_RATE = 2
    cfg.DATA.TRAIN_CROP_SIZE = 64
    cfg.DATA.TRAIN_JITTER_SCALES = [70, 90]
    cfg.MODEL.ARCH = "c2d"
    cfg.MODEL.NUM_CLASSES = 80
    cfg.NUM_GPUS = 1
    cfg = assert_and_infer_cfg(cfg)

    ds = Ava(cfg, "train")
    assert len(ds) == 1  # one keyframe with boxes
    frames, labels, idx, times, extra = ds[0]
    clip = frames[0] if isinstance(frames, list) else frames
    assert clip.shape[0] == 4 and clip.shape[1] == 64
    boxes = extra["boxes"]
    assert boxes.shape[1] == 4 and boxes.shape[0] == 2  # unique boxes
    # Multi-hot labels (AVA ids 1..80 map to index id-1, reference
    # ava_dataset.py:400-408): first box carries classes 5 and 9.
    labels = np.asarray(labels)
    assert labels.shape == (2, 80)
    assert labels[0, 4] == 1 and labels[0, 8] == 1 and labels[1, 11] == 1
