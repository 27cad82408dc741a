"""Host spatial-pipeline regression tests (data/utils.py spatial_sampling,
reference slowfast/datasets/utils.py:114-185).

Every dispatch branch must return a contiguous (T, crop, crop, C) ndarray —
a positional-argument slip against transform.random_short_side_scale_jitter
(whose signature grew a ``boxes`` parameter for the AVA backend) once made
the train branch return a (frames, 0.0) tuple and broke every
scale-jitter-trained dataset path.
"""

import numpy as np
import pytest

from slowfast_tpu.data import utils as data_utils


def _clip(t=4, h=128, w=96):
    rs = np.random.RandomState(0)
    return (rs.rand(t, h, w, 3) * 255).astype(np.uint8)


@pytest.mark.parametrize(
    "kwargs",
    [
        dict(spatial_idx=-1),  # train: scale jitter + random crop
        dict(spatial_idx=-1, inverse_uniform_sampling=True),
        dict(  # train: random resized crop (MViT recipes)
            spatial_idx=-1, scale=(0.5, 1.0), aspect_ratio=(0.75, 1.333)
        ),
        dict(  # train: rrc with motion shift (ssl recipes)
            spatial_idx=-1,
            scale=(0.5, 1.0),
            aspect_ratio=(0.75, 1.333),
            motion_shift=True,
        ),
        dict(spatial_idx=0),  # test: uniform crop left/top
        dict(spatial_idx=1),
        dict(spatial_idx=2),
    ],
)
def test_spatial_sampling_branches_return_cropped_ndarray(kwargs):
    np.random.seed(3)
    out = data_utils.spatial_sampling(
        _clip(), min_scale=100, max_scale=120, crop_size=64, **kwargs
    )
    assert isinstance(out, np.ndarray), type(out)
    assert out.shape == (4, 64, 64, 3)
    assert out.flags["C_CONTIGUOUS"]
