"""video_conv formulations must match XLA's direct 3D convolution."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from slowfast_tpu.ops.video_conv import (
    conv3d_folded,
    conv3d_taps,
    max_pool3d_fast,
    spatial_conv,
    temporal_conv_folded,
    temporal_conv_taps,
    video_conv,
)


def _ref_conv(x, w, stride, padding, groups=1, dilation=(1, 1, 1)):
    return jax.lax.conv_general_dilated(
        x,
        w,
        tuple(stride),
        [(p, p) for p in padding],
        rhs_dilation=tuple(dilation),
        dimension_numbers=("NTHWC", "THWIO", "NTHWC"),
        feature_group_count=groups,
    )


CASES = [
    # (shape, kernel, stride, padding, groups)
    ((2, 8, 10, 10, 3), (5, 7, 7, 3, 8), (1, 2, 2), (2, 3, 3), 1),   # fast stem
    ((2, 4, 10, 10, 3), (1, 7, 7, 3, 16), (1, 2, 2), (0, 3, 3), 1),  # slow stem
    ((2, 8, 6, 6, 8), (7, 1, 1, 8, 16), (8, 1, 1), (3, 0, 0), 1),    # fuse
    ((2, 8, 6, 6, 8), (3, 1, 1, 8, 8), (1, 1, 1), (1, 0, 0), 1),     # temporal smallC
    ((2, 4, 6, 6, 64), (3, 1, 1, 64, 32), (1, 1, 1), (1, 0, 0), 1),  # temporal bigC
    ((2, 4, 6, 6, 64), (1, 3, 3, 64, 32), (1, 2, 2), (0, 1, 1), 1),  # spatial
    ((2, 4, 6, 6, 16), (3, 3, 3, 1, 16), (1, 2, 2), (1, 1, 1), 16),  # x3d depthwise
    ((2, 4, 6, 6, 40), (1, 1, 1, 40, 24), (1, 1, 1), (0, 0, 0), 1),  # pointwise
    ((2, 6, 8, 8, 48), (3, 3, 3, 48, 16), (1, 1, 1), (1, 1, 1), 1),  # full 3D bigC
]


@pytest.mark.parametrize("case", CASES)
def test_video_conv_matches_lax(case):
    shape, kshape, stride, padding, groups = case
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, shape, jnp.float32)
    w = jax.random.normal(jax.random.PRNGKey(1), kshape, jnp.float32) * 0.1
    ref = _ref_conv(x, w, stride, padding, groups)
    got = jax.jit(
        lambda x, w: video_conv(x, w, stride, padding, groups)
    )(x, w)
    assert got.shape == ref.shape, (got.shape, ref.shape)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-4, atol=1e-4)


def test_max_pool_folded_matches():
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 9, 9, 8), jnp.float32)
    ref = jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 1, 3, 3, 1), (1, 1, 2, 2, 1),
        [(0, 0), (0, 0), (1, 1), (1, 1), (0, 0)],
    )
    got = max_pool3d_fast(x, (1, 3, 3), (1, 2, 2), (0, 1, 1))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref))


FOLDED_CASES = [
    ((2, 8, 6, 6, 8), (1, 3, 3, 8, 16), (1, 1, 1), (0, 1, 1)),   # spatial
    ((2, 8, 6, 6, 8), (1, 3, 3, 8, 16), (1, 2, 2), (0, 1, 1)),   # strided spatial
    ((2, 8, 6, 6, 8), (1, 1, 1, 8, 32), (1, 1, 1), (0, 0, 0)),   # pointwise
    ((2, 8, 6, 6, 8), (3, 1, 1, 8, 8), (1, 1, 1), (1, 0, 0)),    # temporal
    ((2, 8, 6, 6, 8), (7, 1, 1, 8, 16), (8, 1, 1), (3, 0, 0)),   # fuse
]


@pytest.mark.parametrize("case", FOLDED_CASES)
def test_folded_conv_matches_lax(case):
    from slowfast_tpu.ops.video_conv import fold_time, folded_conv, unfold_time

    shape, kshape, stride, padding = case
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, shape, jnp.float32)
    w = jax.random.normal(jax.random.PRNGKey(1), kshape, jnp.float32) * 0.1
    ref = _ref_conv(x, w, stride, padding)
    T = shape[1]
    xf = fold_time(x)
    yf, Tout = jax.jit(
        lambda xf, w: folded_conv(xf, w, T, stride, padding)
    )(xf, w)
    got = unfold_time(yf, Tout)
    assert got.shape == ref.shape, (got.shape, ref.shape)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-4, atol=1e-4)
