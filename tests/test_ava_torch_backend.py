"""Golden parity for AVA.IMG_PROC_BACKEND="pytorch" preprocessing.

Drives my channels-last numpy `_images_and_boxes_preprocessing` and the
reference's tensor version (reference ava_dataset.py:237-337) on the same
raw BGR clip with identically-seeded np.random streams — both sides draw
(scale size, crop y, crop x, flip, [jitter order, alphas, pca alpha]) from
np.random in the same call order, so every random decision coincides and
outputs must match to float tolerance (cv2 float bilinear == F.interpolate
align_corners=False).
"""

import os
import types

import numpy as np
import pytest

REF = "/root/reference"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference repo not mounted"
)

MEAN = [0.45, 0.45, 0.45]
STD = [0.225, 0.225, 0.225]
PCA_EIGVAL = [0.225, 0.224, 0.229]
PCA_EIGVEC = [
    [-0.5675, 0.7192, 0.4009],
    [-0.5808, -0.0045, -0.8140],
    [-0.5836, -0.6948, 0.4203],
]


def _attrs(split, use_bgr=False, color_aug=False, pca_only=False):
    return dict(
        _split=split,
        _jitter_min_scale=80,
        _jitter_max_scale=100,
        _crop_size=64,
        _use_color_augmentation=color_aug,
        _pca_jitter_only=pca_only,
        _data_mean=MEAN,
        _data_std=STD,
        _use_bgr=use_bgr,
        _test_force_flip=(split != "train"),
        random_horizontal_flip=True,
        _pca_eigval=PCA_EIGVAL,
        _pca_eigvec=PCA_EIGVEC,
    )


def _ref_process(split, imgs_u8, boxes, **kw):
    from tests.ref_compat.loader import load_reference

    load_reference()
    import torch
    from slowfast.datasets.ava_dataset import Ava as RefAva

    self = types.SimpleNamespace(**_attrs(split, **kw))
    t = torch.as_tensor(np.stack(imgs_u8)).permute(0, 3, 1, 2)  # T C H W
    np.random.seed(42)
    out, out_boxes = RefAva._images_and_boxes_preprocessing(
        self, t, boxes.copy()
    )
    return out.numpy().transpose(0, 2, 3, 1), out_boxes  # -> T H W C


def _my_process(split, imgs_u8, boxes, **kw):
    from slowfast_tpu.data.ava_dataset import Ava

    self = Ava.__new__(Ava)
    for k, v in _attrs(split, **kw).items():
        setattr(self, k, v)
    from slowfast_tpu.config import get_cfg

    cfg = get_cfg()
    cfg.DATA.TRAIN_PCA_EIGVAL = PCA_EIGVAL
    cfg.DATA.TRAIN_PCA_EIGVEC = PCA_EIGVEC
    self.cfg = cfg
    np.random.seed(42)
    return self._images_and_boxes_preprocessing(np.stack(imgs_u8), boxes.copy())


def _clip_and_boxes(seed=0, t=3, h=96, w=128, n_boxes=3):
    rs = np.random.RandomState(seed)
    imgs = [rs.randint(0, 256, (h, w, 3), np.uint8) for _ in range(t)]
    # normalized [x1, y1, x2, y2] with x2 > x1, y2 > y1
    lo = rs.rand(n_boxes, 2) * 0.5  # (x1, y1)
    hi = lo + rs.rand(n_boxes, 2) * 0.45  # (x2, y2)
    boxes = np.concatenate([lo, hi], axis=1).astype(np.float32)
    return imgs, np.ascontiguousarray(boxes)


@pytest.mark.parametrize("split", ["train", "val", "test"])
def test_backend_parity_no_color_aug(split):
    imgs, boxes = _clip_and_boxes(seed={"train": 1, "val": 2, "test": 3}[split])
    ref_clip, ref_boxes = _ref_process(split, imgs, boxes)
    my_clip, my_boxes = _my_process(split, imgs, boxes)
    assert my_clip.shape == ref_clip.shape
    np.testing.assert_allclose(my_clip, ref_clip, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(my_boxes, ref_boxes, rtol=1e-5, atol=1e-5)


def test_backend_parity_train_color_aug():
    """Full train path incl. BGR-order color jitter + PCA lighting."""
    imgs, boxes = _clip_and_boxes(seed=5)
    ref_clip, ref_boxes = _ref_process(
        "train", imgs, boxes, color_aug=True, pca_only=False
    )
    my_clip, my_boxes = _my_process(
        "train", imgs, boxes, color_aug=True, pca_only=False
    )
    np.testing.assert_allclose(my_clip, ref_clip, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(my_boxes, ref_boxes, rtol=1e-5, atol=1e-5)


def test_backend_parity_use_bgr():
    """use_bgr=True skips the final channel reorder on both sides."""
    imgs, boxes = _clip_and_boxes(seed=9)
    ref_clip, _ = _ref_process("val", imgs, boxes, use_bgr=True)
    my_clip, _ = _my_process("val", imgs, boxes, use_bgr=True)
    np.testing.assert_allclose(my_clip, ref_clip, rtol=1e-4, atol=1e-4)


def test_test_split_keeps_aspect():
    """Test split scales the short side to crop_size without cropping
    (reference :291-302): output is non-square for a non-square input."""
    imgs, boxes = _clip_and_boxes(seed=3, h=96, w=128)
    my_clip, my_boxes = _my_process("test", imgs, boxes)
    assert my_clip.shape[1] == 64 and my_clip.shape[2] == int(128 / 96 * 64)
    # boxes still clipped to the (crop, crop) square as the reference does
    assert my_boxes.max() <= 64 - 1


def test_dataset_dispatches_backend(tmp_path, monkeypatch):
    """Ava.__getitem__ routes to the tensor path when configured."""
    from slowfast_tpu.config import get_cfg

    cfg = get_cfg()
    cfg.AVA.IMG_PROC_BACKEND = "pytorch"
    # construct without file IO
    from slowfast_tpu.data.ava_dataset import Ava

    ds = Ava.__new__(Ava)
    assert hasattr(ds, "_images_and_boxes_preprocessing")
    assert hasattr(ds, "_images_and_boxes_preprocessing_cv2")
