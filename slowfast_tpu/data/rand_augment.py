"""RandAugment for video clips (reference slowfast/datasets/rand_augment.py).

Implements the timm-style ``rand-mN-mstdS[-incX]`` policy grammar over PIL
ops, applied consistently across all frames of a clip. Operates on uint8
(T, H, W, C) numpy arrays (the reference round-trips through PIL the same
way, kinetics.py:506-512).
"""

import math
import random
import re

import numpy as np
from PIL import Image, ImageEnhance, ImageOps

_MAX_LEVEL = 10.0
_FILL = (128, 128, 128)


def _rotate(img, degrees):
    return img.rotate(degrees, fillcolor=_FILL)


def _shear_x(img, factor):
    return img.transform(img.size, Image.AFFINE, (1, factor, 0, 0, 1, 0), fillcolor=_FILL)


def _shear_y(img, factor):
    return img.transform(img.size, Image.AFFINE, (1, 0, 0, factor, 1, 0), fillcolor=_FILL)


def _translate_x(img, pixels):
    return img.transform(img.size, Image.AFFINE, (1, 0, pixels, 0, 1, 0), fillcolor=_FILL)


def _translate_y(img, pixels):
    return img.transform(img.size, Image.AFFINE, (1, 0, 0, 0, 1, pixels), fillcolor=_FILL)


OPS = {
    "AutoContrast": lambda img, _: ImageOps.autocontrast(img),
    "Equalize": lambda img, _: ImageOps.equalize(img),
    "Invert": lambda img, _: ImageOps.invert(img),
    "Rotate": _rotate,
    "Posterize": lambda img, bits: ImageOps.posterize(img, int(bits)),
    "PosterizeIncreasing": lambda img, bits: ImageOps.posterize(img, int(bits)),
    "Solarize": lambda img, thresh: ImageOps.solarize(img, int(thresh)),
    "SolarizeIncreasing": lambda img, thresh: ImageOps.solarize(img, int(thresh)),
    "SolarizeAdd": lambda img, add: _solarize_add(img, int(add)),
    "Color": lambda img, f: ImageEnhance.Color(img).enhance(f),
    "ColorIncreasing": lambda img, f: ImageEnhance.Color(img).enhance(f),
    "Contrast": lambda img, f: ImageEnhance.Contrast(img).enhance(f),
    "ContrastIncreasing": lambda img, f: ImageEnhance.Contrast(img).enhance(f),
    "Brightness": lambda img, f: ImageEnhance.Brightness(img).enhance(f),
    "BrightnessIncreasing": lambda img, f: ImageEnhance.Brightness(img).enhance(f),
    "Sharpness": lambda img, f: ImageEnhance.Sharpness(img).enhance(f),
    "SharpnessIncreasing": lambda img, f: ImageEnhance.Sharpness(img).enhance(f),
    "ShearX": _shear_x,
    "ShearY": _shear_y,
    "TranslateXRel": None,  # handled via level fn
    "TranslateYRel": None,
}


def _solarize_add(img, add, thresh=128):
    lut = [min(255, i + add) if i < thresh else i for i in range(256)]
    return img.point(lut * len(img.getbands()))


# timm's rand-increasing transform set
_RAND_INCREASING_TRANSFORMS = [
    "AutoContrast",
    "Equalize",
    "Invert",
    "Rotate",
    "PosterizeIncreasing",
    "SolarizeIncreasing",
    "SolarizeAdd",
    "ColorIncreasing",
    "ContrastIncreasing",
    "BrightnessIncreasing",
    "SharpnessIncreasing",
    "ShearX",
    "ShearY",
    "TranslateXRel",
    "TranslateYRel",
]

_RAND_TRANSFORMS = [
    "AutoContrast",
    "Equalize",
    "Invert",
    "Rotate",
    "Posterize",
    "Solarize",
    "SolarizeAdd",
    "Color",
    "Contrast",
    "Brightness",
    "Sharpness",
    "ShearX",
    "ShearY",
    "TranslateXRel",
    "TranslateYRel",
]


def _level_arg(name, level, hparams):
    m = level / _MAX_LEVEL
    if name == "Rotate":
        v = m * 30.0
        return random.choice([-v, v])
    if name in ("ShearX", "ShearY"):
        v = m * 0.3
        return random.choice([-v, v])
    if name in ("TranslateXRel", "TranslateYRel"):
        v = m * 0.45
        return random.choice([-v, v])
    if name == "Posterize":
        return max(1, int(4 - m * 4) + 4)  # 4..8 decreasing? timm: 4 - level*4
    if name == "PosterizeIncreasing":
        return max(1, 4 - int(m * 4) + 4 - 4)  # 4..0 + clamp -> use below
    if name == "Solarize":
        return int(256 - m * 256)
    if name == "SolarizeIncreasing":
        return int(256 - (256 - m * 256))
    if name == "SolarizeAdd":
        return int(m * 110)
    if name in (
        "Color",
        "Contrast",
        "Brightness",
        "Sharpness",
    ):
        return 1.0 + m * 0.9 * random.choice([-1, 1])
    if name in (
        "ColorIncreasing",
        "ContrastIncreasing",
        "BrightnessIncreasing",
        "SharpnessIncreasing",
    ):
        return 1.0 + m * 0.9 * random.choice([-1, 1])
    return None


class RandAugment:
    def __init__(self, num_layers=2, magnitude=9, mstd=0.5, increasing=True,
                 hparams=None):
        self.num_layers = num_layers
        self.magnitude = magnitude
        self.mstd = mstd
        self.transforms = (
            _RAND_INCREASING_TRANSFORMS if increasing else _RAND_TRANSFORMS
        )
        self.hparams = hparams or {}

    def _sample_level(self):
        if self.mstd > 0:
            level = random.gauss(self.magnitude, self.mstd)
        else:
            level = self.magnitude
        return min(_MAX_LEVEL, max(0, level))

    def __call__(self, frames):
        """frames: uint8 (T,H,W,C) ndarray. Ops are re-sampled per clip and
        applied to every frame (consistent augmentation across time)."""
        chosen = [random.choice(self.transforms) for _ in range(self.num_layers)]
        plans = []
        for name in chosen:
            level = self._sample_level()
            if name in ("TranslateXRel", "TranslateYRel"):
                v = (level / _MAX_LEVEL) * 0.45 * random.choice([-1, 1])
                plans.append((name, v))
            else:
                plans.append((name, _level_arg(name, level, self.hparams)))

        out = []
        for frame in frames:
            img = Image.fromarray(frame)
            for name, arg in plans:
                if name == "TranslateXRel":
                    img = _translate_x(img, arg * img.size[0])
                elif name == "TranslateYRel":
                    img = _translate_y(img, arg * img.size[1])
                else:
                    img = OPS[name](img, arg)
            out.append(np.asarray(img))
        return np.stack(out)


def rand_augment_transform(config_str, hparams):
    """Parse a timm policy string, e.g. 'rand-m9-mstd0.5-inc1'
    (reference rand_augment.py string grammar)."""
    magnitude = 9
    num_layers = 2
    mstd = 0.5
    increasing = False
    parts = config_str.split("-")
    assert parts[0] == "rand"
    for p in parts[1:]:
        m = re.match(r"([a-z]+)([0-9.]+)", p)
        if not m:
            continue
        key, val = m.group(1), m.group(2)
        if key == "m":
            magnitude = float(val)
        elif key == "n":
            num_layers = int(val)
        elif key == "mstd":
            mstd = float(val)
        elif key == "inc":
            increasing = bool(int(val))
    return RandAugment(num_layers, magnitude, mstd, increasing, hparams)
