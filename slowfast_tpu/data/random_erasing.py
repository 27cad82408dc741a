"""Random erasing (reference slowfast/datasets/random_erasing.py, timm-derived).

Erases random rectangles with per-pixel noise ('pixel'), constant 0
('const'), or random grayscale ('rand'). Operates on float (T, H, W, C)
clips; the same region is erased across frames (cube erasing), matching the
reference's application after CTHW permute.
"""

import math
import random

import numpy as np


class RandomErasing:
    def __init__(
        self,
        probability=0.5,
        min_area=0.02,
        max_area=1 / 3,
        min_aspect=0.3,
        max_aspect=None,
        mode="const",
        min_count=1,
        max_count=None,
        num_splits=0,
        cube=True,
    ):
        self.probability = probability
        self.min_area = min_area
        self.max_area = max_area
        max_aspect = max_aspect or 1 / min_aspect
        self.log_aspect_ratio = (math.log(min_aspect), math.log(max_aspect))
        self.min_count = min_count
        self.max_count = max_count or min_count
        self.num_splits = num_splits
        self.cube = cube
        mode = mode.lower()
        self.rand_color = mode == "rand"
        self.per_pixel = mode == "pixel"
        assert mode in ("rand", "pixel", "const")

    def _fill(self, shape, dtype):
        if self.per_pixel:
            return np.random.normal(size=shape).astype(dtype)
        if self.rand_color:
            return np.random.normal(size=(1, 1, shape[-1])).astype(dtype) * np.ones(
                shape, dtype
            )
        return np.zeros(shape, dtype)

    def __call__(self, frames):
        """frames: (T, H, W, C) float ndarray."""
        if random.random() > self.probability:
            return frames
        t, h, w, c = frames.shape
        area = h * w
        count = (
            self.min_count
            if self.min_count == self.max_count
            else random.randint(self.min_count, self.max_count)
        )
        frames = frames.copy()
        for _ in range(count):
            for _ in range(10):
                target_area = random.uniform(self.min_area, self.max_area) * area / count
                aspect_ratio = math.exp(random.uniform(*self.log_aspect_ratio))
                eh = int(round(math.sqrt(target_area * aspect_ratio)))
                ew = int(round(math.sqrt(target_area / aspect_ratio)))
                if ew < w and eh < h:
                    top = random.randint(0, h - eh)
                    left = random.randint(0, w - ew)
                    if self.cube:
                        fill = self._fill((eh, ew, c), frames.dtype)
                        frames[:, top : top + eh, left : left + ew] = fill
                    else:
                        for ti in range(t):
                            frames[ti, top : top + eh, left : left + ew] = self._fill(
                                (eh, ew, c), frames.dtype
                            )
                    break
        return frames
