"""Spatial/color transforms on host (numpy/cv2), matching reference math.

Reference: slowfast/datasets/transform.py:48-1170 (torch) and
cv2_transform.py. These run in loader workers on uint8/float32 numpy
(T, H, W, C) clips; heavy per-pixel work stays vectorized.
"""

import math
import random

import numpy as np


def _interp(img, size_wh, interpolation="bilinear"):
    import cv2

    flag = {
        "bilinear": cv2.INTER_LINEAR,
        "bicubic": cv2.INTER_CUBIC,
        "nearest": cv2.INTER_NEAREST,
    }[interpolation]
    return cv2.resize(img, size_wh, interpolation=flag)


def sample_jitter_size(min_size, max_size, inverse_uniform_sampling=False):
    """Draw the short-side jitter size (reference transform.py:48-98)."""
    if inverse_uniform_sampling:
        return int(round(1.0 / random.uniform(1.0 / max_size, 1.0 / min_size)))
    return int(round(random.uniform(min_size, max_size)))


def random_short_side_scale_jitter(
    frames, min_size, max_size, boxes=None, inverse_uniform_sampling=False
):
    """Scale the short side to a jittered size (reference transform.py:48-98).

    frames: (T, H, W, C) float or uint8. With ``boxes`` (N, 4) the boxes are
    scaled isotropically by the resize factor and ``(frames, boxes)`` is
    returned (frames alone otherwise, for the box-free callers). The size
    draw uses np.random in the reference's call order so a seeded np.random
    stream reproduces the reference's sampling exactly.
    """
    if inverse_uniform_sampling:
        size = int(round(1.0 / np.random.uniform(1.0 / max_size, 1.0 / min_size)))
    else:
        size = int(round(np.random.uniform(min_size, max_size)))
    h, w = frames.shape[1], frames.shape[2]
    if (w <= h and w == size) or (h <= w and h == size):
        return frames if boxes is None else (frames, boxes)
    if w < h:
        new_w, new_h = size, int(math.floor(h / w * size))
        factor = float(new_h) / h
    else:
        new_w, new_h = int(math.floor(w / h * size)), size
        factor = float(new_w) / w
    out = np.stack([_interp(f, (new_w, new_h)) for f in frames])
    if boxes is None:
        return out
    return out, boxes * factor


def random_crop(frames, size, boxes=None):
    """(reference transform.py:120-149)"""
    h, w = frames.shape[1], frames.shape[2]
    if h == size and w == size:
        return frames if boxes is None else (frames, boxes)
    y = int(np.random.randint(0, h - size)) if h > size else 0
    x = int(np.random.randint(0, w - size)) if w > size else 0
    out = frames[:, y : y + size, x : x + size]
    if boxes is None:
        return out
    return out, crop_boxes(boxes, x, y)


def horizontal_flip(prob, frames, boxes=None):
    """(reference transform.py:152-184). Box flip: x -> width - x - 1."""
    if np.random.uniform() < prob:
        w = frames.shape[2]
        if boxes is not None:
            flipped = boxes.copy()
            flipped[:, [0, 2]] = w - boxes[:, [2, 0]] - 1
            boxes = flipped
        frames = frames[:, :, ::-1]
    return frames if boxes is None else (frames, boxes)


def uniform_crop(frames, size, spatial_idx):
    """3-position crop: 0=left/top 1=center 2=right/bottom
    (reference transform.py:187-243)."""
    assert spatial_idx in (0, 1, 2)
    h, w = frames.shape[1], frames.shape[2]
    y = int(math.ceil((h - size) / 2))
    x = int(math.ceil((w - size) / 2))
    if h > w:
        if spatial_idx == 0:
            y = 0
        elif spatial_idx == 2:
            y = h - size
    else:
        if spatial_idx == 0:
            x = 0
        elif spatial_idx == 2:
            x = w - size
    return frames[:, y : y + size, x : x + size]


def uniform_crop_with_boxes(frames, size, spatial_idx, boxes):
    h, w = frames.shape[1], frames.shape[2]
    cropped = uniform_crop(frames, size, spatial_idx)
    y = int(math.ceil((h - size) / 2))
    x = int(math.ceil((w - size) / 2))
    if h > w:
        y = 0 if spatial_idx == 0 else (h - size if spatial_idx == 2 else y)
    else:
        x = 0 if spatial_idx == 0 else (w - size if spatial_idx == 2 else x)
    return cropped, crop_boxes(boxes, x, y)


def crop_boxes(boxes, x_offset, y_offset):
    """(reference transform.py:101-117)"""
    boxes = boxes.copy()
    boxes[:, [0, 2]] -= x_offset
    boxes[:, [1, 3]] -= y_offset
    return boxes


def clip_boxes_to_image(boxes, height, width):
    boxes = boxes.copy()
    boxes[:, [0, 2]] = np.clip(boxes[:, [0, 2]], 0, width - 1)
    boxes[:, [1, 3]] = np.clip(boxes[:, [1, 3]], 0, height - 1)
    return boxes


def random_resized_crop(
    frames,
    target_height,
    target_width,
    scale=(0.08, 1.0),
    ratio=(3.0 / 4.0, 4.0 / 3.0),
    interpolation="bilinear",
):
    """Inception-style crop (reference transform.py:519-553)."""
    t, h, w = frames.shape[0], frames.shape[1], frames.shape[2]
    i, j, ch, cw = _sample_resized_crop(h, w, scale, ratio)
    crop = frames[:, i : i + ch, j : j + cw]
    return np.stack(
        [_interp(f, (target_width, target_height), interpolation) for f in crop]
    )


def random_resized_crop_with_shift(
    frames,
    target_height,
    target_width,
    scale=(0.08, 1.0),
    ratio=(3.0 / 4.0, 4.0 / 3.0),
    interpolation="bilinear",
):
    """Motion-shift crop: the window interpolates between two sampled crops
    across time (reference transform.py:554-598)."""
    t, h, w = frames.shape[0], frames.shape[1], frames.shape[2]
    i, j, ch, cw = _sample_resized_crop(h, w, scale, ratio)
    i_, j_, ch_, cw_ = _sample_resized_crop(h, w, scale, ratio)
    i_s = np.linspace(i, i_, t).astype(np.int64)
    j_s = np.linspace(j, j_, t).astype(np.int64)
    h_s = np.linspace(ch, ch_, t).astype(np.int64)
    w_s = np.linspace(cw, cw_, t).astype(np.int64)
    out = np.empty((t, target_height, target_width, frames.shape[3]), frames.dtype)
    for k in range(t):
        crop = frames[k, i_s[k] : i_s[k] + h_s[k], j_s[k] : j_s[k] + w_s[k]]
        out[k] = _interp(crop, (target_width, target_height), interpolation)
    return out


def _sample_resized_crop(height, width, scale, ratio):
    """timm/torchvision RandomResizedCrop window sampling."""
    area = height * width
    for _ in range(10):
        target_area = area * random.uniform(*scale)
        log_ratio = (math.log(ratio[0]), math.log(ratio[1]))
        aspect = math.exp(random.uniform(*log_ratio))
        w = int(round(math.sqrt(target_area * aspect)))
        h = int(round(math.sqrt(target_area / aspect)))
        if 0 < w <= width and 0 < h <= height:
            i = random.randint(0, height - h)
            j = random.randint(0, width - w)
            return i, j, h, w
    # center fallback
    in_ratio = width / height
    if in_ratio < ratio[0]:
        w = width
        h = int(round(w / ratio[0]))
    elif in_ratio > ratio[1]:
        h = height
        w = int(round(h * ratio[1]))
    else:
        w, h = width, height
    i = (height - h) // 2
    j = (width - w) // 2
    return i, j, h, w


# ---------------------------------------------------------------------------
# Color ops (reference transform.py:268-476); frames float (T,H,W,C) in [0,1].
# ---------------------------------------------------------------------------

def blend(a, b, alpha):
    return a * alpha + b * (1.0 - alpha)


def grayscale(frames):
    g = 0.299 * frames[..., 0] + 0.587 * frames[..., 1] + 0.114 * frames[..., 2]
    return np.repeat(g[..., None], 3, axis=-1)


def brightness_jitter(var, frames):
    alpha = 1.0 + np.random.uniform(-var, var)
    return blend(frames, np.zeros_like(frames), alpha)


def contrast_jitter(var, frames):
    alpha = 1.0 + np.random.uniform(-var, var)
    g = grayscale(frames)
    g[:] = g.mean(axis=(1, 2, 3), keepdims=True)
    return blend(frames, g, alpha)


def saturation_jitter(var, frames):
    alpha = 1.0 + np.random.uniform(-var, var)
    return blend(frames, grayscale(frames), alpha)


def color_jitter(frames, img_brightness=0, img_contrast=0, img_saturation=0):
    """(reference transform.py:312-345)"""
    jitter = []
    if img_brightness != 0:
        jitter.append("brightness")
    if img_contrast != 0:
        jitter.append("contrast")
    if img_saturation != 0:
        jitter.append("saturation")
    if jitter:
        order = np.random.permutation(len(jitter))
        for idx in order:
            if jitter[idx] == "brightness":
                frames = brightness_jitter(img_brightness, frames)
            elif jitter[idx] == "contrast":
                frames = contrast_jitter(img_contrast, frames)
            else:
                frames = saturation_jitter(img_saturation, frames)
    return frames


def lighting_jitter(frames, alphastd, eigval, eigvec):
    """PCA lighting (reference transform.py:392-428)."""
    if alphastd == 0:
        return frames
    alpha = np.random.normal(0, alphastd, size=(1, 3))
    eigval = np.asarray(eigval).reshape(1, 3)
    eigvec = np.asarray(eigvec)
    rgb = np.sum(eigvec * alpha * eigval, axis=1)
    return frames + rgb.reshape(1, 1, 1, 3).astype(frames.dtype)


def color_normalization(frames, mean, stddev):
    mean = np.asarray(mean, frames.dtype).reshape(1, 1, 1, -1)
    stddev = np.asarray(stddev, frames.dtype).reshape(1, 1, 1, -1)
    return (frames - mean) / stddev


# ---------------------------------------------------------------------------
# SSL augmentations (reference transform.py:1047-1180)
# ---------------------------------------------------------------------------

def _tv_brightness(frames, factor):
    """torchvision adjust_brightness: img * factor."""
    return np.clip(frames * factor, 0.0, 1.0)


def _tv_contrast(frames, factor):
    """torchvision adjust_contrast: blend with the mean of the grayscale."""
    mean = grayscale(frames)[..., 0].mean()
    return np.clip(frames * factor + mean * (1.0 - factor), 0.0, 1.0)


def _tv_saturation(frames, factor):
    """torchvision adjust_saturation: blend with per-pixel grayscale."""
    return np.clip(
        frames * factor + grayscale(frames) * (1.0 - factor), 0.0, 1.0
    )


def _tv_hue(frames, factor):
    """torchvision adjust_hue: rotate hue by ``factor`` (in turns)."""
    r, g, b = frames[..., 0], frames[..., 1], frames[..., 2]
    maxc = frames.max(axis=-1)
    minc = frames.min(axis=-1)
    v = maxc
    delta = maxc - minc
    s = np.where(maxc > 0, delta / np.maximum(maxc, 1e-12), 0.0)
    dz = np.maximum(delta, 1e-12)
    rc = (maxc - r) / dz
    gc = (maxc - g) / dz
    bc = (maxc - b) / dz
    h = np.where(
        maxc == r, bc - gc, np.where(maxc == g, 2.0 + rc - bc, 4.0 + gc - rc)
    )
    h = (h / 6.0) % 1.0
    h = np.where(delta == 0, 0.0, h)
    h = (h + factor) % 1.0
    # HSV -> RGB
    i = np.floor(h * 6.0)
    f = h * 6.0 - i
    p = v * (1.0 - s)
    q = v * (1.0 - s * f)
    t = v * (1.0 - s * (1.0 - f))
    i = i.astype(np.int32) % 6
    out = np.stack(
        [
            np.choose(i, [v, q, p, p, t, v]),
            np.choose(i, [t, v, v, q, p, p]),
            np.choose(i, [p, p, t, v, v, q]),
        ],
        axis=-1,
    )
    return out.astype(frames.dtype)


def _gaussian_blur_frames(frames, sigma):
    """Per-frame spatial Gaussian blur (reference GaussianBlur, PIL radius
    == sigma)."""
    from scipy.ndimage import gaussian_filter

    return gaussian_filter(
        frames, sigma=(0.0, sigma, sigma, 0.0), mode="nearest"
    ).astype(frames.dtype)


def color_jitter_video_ssl(
    frames,
    bri_con_sat=(0.4, 0.4, 0.4),
    hue=0.1,
    p_convert_gray=0.0,
    moco_v2_aug=False,
    gaussan_sigma_min=(0.0, 0.1),
    gaussan_sigma_max=(0.0, 2.0),
):
    """SSL color jitter over a THWC float [0,1] clip (reference
    transform.py:1073-1123): torchvision ColorJitter semantics applied to
    ALL frames with ONE shared random draw (the reference jitters the
    (C, T*H, W)-stacked image). moco_v2_aug adds the MoCo-v2 recipe:
    p=0.8 jitter, random grayscale, p=0.5 Gaussian blur."""

    def jitter(f):
        ops = []
        if bri_con_sat[0] > 0:
            fac = random.uniform(max(0.0, 1 - bri_con_sat[0]), 1 + bri_con_sat[0])
            ops.append(lambda x, fac=fac: _tv_brightness(x, fac))
        if bri_con_sat[1] > 0:
            fac = random.uniform(max(0.0, 1 - bri_con_sat[1]), 1 + bri_con_sat[1])
            ops.append(lambda x, fac=fac: _tv_contrast(x, fac))
        if bri_con_sat[2] > 0:
            fac = random.uniform(max(0.0, 1 - bri_con_sat[2]), 1 + bri_con_sat[2])
            ops.append(lambda x, fac=fac: _tv_saturation(x, fac))
        if hue > 0:
            fac = random.uniform(-hue, hue)
            ops.append(lambda x, fac=fac: _tv_hue(x, fac))
        random.shuffle(ops)
        for op in ops:
            f = op(f)
        return f

    frames = np.asarray(frames, np.float32)
    if moco_v2_aug:
        if random.random() < 0.8:
            frames = jitter(frames)
        if random.random() < p_convert_gray:
            frames = grayscale(frames)
        if random.random() < 0.5:
            sigma = random.uniform(0.1, 2.0)
            frames = _gaussian_blur_frames(frames, sigma)
    else:
        if random.random() < p_convert_gray:
            frames = grayscale(frames)
        frames = jitter(frames)
    return frames


class GaussianBlurVideo:
    """Spatio(-temporal) Gaussian blur of a THWC clip (reference
    transform.py:1160-1180; the channel axis is never blurred here)."""

    def __init__(self, sigma_min=(0.0, 0.1), sigma_max=(0.0, 2.0)):
        self.sigma_min = sigma_min
        self.sigma_max = sigma_max

    def __call__(self, frames):
        from scipy.ndimage import gaussian_filter

        sigma_s = random.uniform(self.sigma_min[1], self.sigma_max[1])
        sigma_t = random.uniform(self.sigma_min[0], self.sigma_max[0])
        return gaussian_filter(
            np.asarray(frames, np.float32),
            sigma=(sigma_t, sigma_s, sigma_s, 0.0),
            mode="nearest",
        )


def temporal_difference(frames, use_grayscale=False, absolute=False):
    """Frame differencing over a THWC clip (reference transform.py:1047-1071)."""
    frames = np.asarray(frames, np.float32)
    if use_grayscale:
        frames = grayscale(frames)
    t = frames.shape[0]
    out = np.zeros_like(frames)
    dt = frames[: t - 1] - frames[1:]
    if absolute:
        dt = np.abs(dt)
    out[: t - 1] = dt
    if t > 1:
        out[-1] = dt[-1]
    return out


def augment_raw_frames(frames, time_diff_prob=0.0, gaussian_prob=0.0):
    """Raw-frame (0..255) SSL augmentation (reference transform.py:1124-1144):
    optional video Gaussian blur, then temporal-difference conversion with
    probability ``time_diff_prob`` (output renormalized to 0..255).
    Returns (frames, time_diff_applied)."""
    frames = np.asarray(frames, np.float32)
    if gaussian_prob > 0.0 and random.random() < gaussian_prob:
        frames = GaussianBlurVideo()(frames)
    time_diff_out = False
    if time_diff_prob > 0.0 and random.random() < time_diff_prob:
        frames = temporal_difference(frames, use_grayscale=True, absolute=False)
        frames = (frames + 255.0) / 2.0
        time_diff_out = True
    return frames, time_diff_out


class MaskingGenerator:
    """Block masking for MaskFeat (reference transform.py:776-868)."""

    def __init__(
        self,
        mask_window_size,
        num_masking_patches,
        min_num_patches=4,
        max_num_patches=None,
        min_aspect=0.3,
        max_aspect=None,
    ):
        if isinstance(mask_window_size, int):
            mask_window_size = (mask_window_size,) * 2
        self.height, self.width = mask_window_size
        self.num_patches = self.height * self.width
        self.num_masking_patches = num_masking_patches
        self.min_num_patches = min_num_patches
        self.max_num_patches = (
            num_masking_patches if max_num_patches is None else max_num_patches
        )
        max_aspect = max_aspect or 1 / min_aspect
        self.log_aspect_ratio = (math.log(min_aspect), math.log(max_aspect))

    def _mask(self, mask, max_mask_patches):
        delta = 0
        for _ in range(10):
            target_area = random.uniform(self.min_num_patches, max_mask_patches)
            aspect_ratio = math.exp(random.uniform(*self.log_aspect_ratio))
            h = int(round(math.sqrt(target_area * aspect_ratio)))
            w = int(round(math.sqrt(target_area / aspect_ratio)))
            if w < self.width and h < self.height:
                top = random.randint(0, self.height - h)
                left = random.randint(0, self.width - w)
                num_masked = mask[top : top + h, left : left + w].sum()
                if 0 < h * w - num_masked <= max_mask_patches:
                    for i in range(top, top + h):
                        for j in range(left, left + w):
                            if mask[i, j] == 0:
                                mask[i, j] = 1
                                delta += 1
                if delta > 0:
                    break
        return delta

    def __call__(self):
        mask = np.zeros((self.height, self.width), np.int64)
        mask_count = 0
        while mask_count < self.num_masking_patches:
            max_mask_patches = self.num_masking_patches - mask_count
            max_mask_patches = min(max_mask_patches, self.max_num_patches)
            delta = self._mask(mask, max_mask_patches)
            if delta == 0:
                break
            mask_count += delta
        return mask


class MaskingGenerator3D:
    """Tube/3D block masking (reference transform.py:869-947)."""

    def __init__(self, mask_window_size, num_masking_patches, min_num_patches=4,
                 max_num_patches=None, min_aspect=0.3, max_aspect=None):
        self.temporal, self.height, self.width = mask_window_size
        self.num_masking_patches = num_masking_patches
        self.min_num_patches = min_num_patches
        self.max_num_patches = (
            num_masking_patches if max_num_patches is None else max_num_patches
        )
        max_aspect = max_aspect or 1 / min_aspect
        self.log_aspect_ratio = (math.log(min_aspect), math.log(max_aspect))

    def _mask(self, mask, max_mask_patches):
        delta = 0
        for _ in range(10):
            target_area = random.uniform(self.min_num_patches, max_mask_patches)
            aspect_ratio = math.exp(random.uniform(*self.log_aspect_ratio))
            h = int(round(math.sqrt(target_area * aspect_ratio)))
            w = int(round(math.sqrt(target_area / aspect_ratio)))
            t = random.randint(1, self.temporal)
            if w < self.width and h < self.height:
                top = random.randint(0, self.height - h)
                left = random.randint(0, self.width - w)
                t0 = random.randint(0, self.temporal - t)
                num_masked = mask[t0 : t0 + t, top : top + h, left : left + w].sum()
                if 0 < t * h * w - num_masked <= max_mask_patches:
                    mask[t0 : t0 + t, top : top + h, left : left + w] = 1
                    delta += t * h * w - num_masked
                if delta > 0:
                    break
        return delta

    def __call__(self):
        mask = np.zeros((self.temporal, self.height, self.width), np.int64)
        mask_count = 0
        while mask_count < self.num_masking_patches:
            max_mask_patches = min(
                self.num_masking_patches - mask_count, self.max_num_patches
            )
            delta = self._mask(mask, max_mask_patches)
            if delta == 0:
                break
            mask_count += delta
        return mask
