"""cv2-based joint image+box transforms for AVA.

Reference: slowfast/datasets/cv2_transform.py (771 LoC). Operates on lists
of HWC float32 arrays plus (N, 4) box arrays in pixel coords.
"""

import math
import random

import numpy as np


def clip_boxes_to_image(boxes, height, width):
    boxes = boxes.copy()
    boxes[:, [0, 2]] = np.clip(boxes[:, [0, 2]], 0, width - 1)
    boxes[:, [1, 3]] = np.clip(boxes[:, [1, 3]], 0, height - 1)
    return boxes


def scale(size, image):
    """Short-side scale to `size` (reference cv2_transform.scale)."""
    import cv2

    height, width = image.shape[0], image.shape[1]
    if (width <= height and width == size) or (height <= width and height == size):
        return image
    if width < height:
        new_width = size
        new_height = int(math.floor(height / width * size))
    else:
        new_height = size
        new_width = int(math.floor(width / height * size))
    return cv2.resize(
        image, (new_width, new_height), interpolation=cv2.INTER_LINEAR
    ).astype(np.float32)


def scale_boxes(size, boxes, height, width):
    """Scale boxes to match a short-side-`size` rescale."""
    if (width <= height and width == size) or (height <= width and height == size):
        return boxes
    if width < height:
        ratio = size / width
    else:
        ratio = size / height
    return boxes * ratio


def random_short_side_scale_jitter_list(images, min_size, max_size, boxes=None):
    size = int(round(np.random.uniform(min_size, max_size)))
    height, width = images[0].shape[0], images[0].shape[1]
    if boxes is not None:
        boxes = [scale_boxes(size, b, height, width) for b in boxes]
    return [scale(size, img) for img in images], boxes


def random_crop_list(images, size, boxes=None):
    height, width = images[0].shape[0], images[0].shape[1]
    if height == size and width == size:
        return images, boxes
    y_offset = np.random.randint(0, max(height - size, 0) + 1)
    x_offset = np.random.randint(0, max(width - size, 0) + 1)
    cropped = [
        img[y_offset : y_offset + size, x_offset : x_offset + size] for img in images
    ]
    if boxes is not None:
        boxes = [
            b - np.array([[x_offset, y_offset, x_offset, y_offset]], np.float32)
            for b in boxes
        ]
    return cropped, boxes


def spatial_shift_crop_list(size, images, spatial_shift_pos, boxes=None):
    """0=left/top 1=center 2=right/bottom crop (reference semantics)."""
    assert spatial_shift_pos in (0, 1, 2)
    height, width = images[0].shape[0], images[0].shape[1]
    y_offset = int(math.ceil((height - size) / 2))
    x_offset = int(math.ceil((width - size) / 2))
    if height > width:
        if spatial_shift_pos == 0:
            y_offset = 0
        elif spatial_shift_pos == 2:
            y_offset = height - size
    else:
        if spatial_shift_pos == 0:
            x_offset = 0
        elif spatial_shift_pos == 2:
            x_offset = width - size
    cropped = [
        img[y_offset : y_offset + size, x_offset : x_offset + size] for img in images
    ]
    if boxes is not None:
        boxes = [
            b - np.array([[x_offset, y_offset, x_offset, y_offset]], np.float32)
            for b in boxes
        ]
    return cropped, boxes


def horizontal_flip_list(prob, images, order="CHW", boxes=None):
    if np.random.uniform() < prob:
        width = images[0].shape[1]
        images = [np.ascontiguousarray(img[:, ::-1]) for img in images]
        if boxes is not None:
            boxes = [flip_boxes(b, width) for b in boxes]
    return images, boxes


def flip_boxes(boxes, im_width):
    boxes_flipped = boxes.copy()
    boxes_flipped[:, 0] = im_width - boxes[:, 2] - 1
    boxes_flipped[:, 2] = im_width - boxes[:, 0] - 1
    return boxes_flipped


def color_normalization(image, mean, stddev):
    mean = np.asarray(mean, np.float32).reshape(1, 1, -1)
    stddev = np.asarray(stddev, np.float32).reshape(1, 1, -1)
    return (image - mean) / stddev


def PCA_jitter(image, alphastd, eigval, eigvec):
    alpha = np.random.normal(0, alphastd, size=(1, 3))
    eigval = np.asarray(eigval).reshape(1, 3)
    eigvec = np.asarray(eigvec)
    rgb = np.sum(eigvec * alpha * eigval, axis=1)
    return image + rgb.reshape(1, 1, 3).astype(image.dtype)
