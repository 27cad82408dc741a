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


# ---------------------------------------------------------------------------
# Argmax-saving max-pool custom VJP
# ---------------------------------------------------------------------------

POOL_CASES = [
    # (H, W, kernel, stride, pad)
    ((12, 12), (3, 3), (2, 2), (1, 1)),   # stem pool
    ((9, 11), (3, 3), (2, 2), (1, 1)),    # odd extents
    ((8, 8), (2, 2), (2, 2), (0, 0)),     # non-overlapping
    ((8, 8), (3, 3), (1, 1), (1, 1)),     # stride 1
    ((10, 10), (2, 1), (2, 1), (0, 0)),   # temporal-style (kw=1)
    ((10, 10), (3, 2), (2, 3), (1, 0)),   # stride > kernel along W (gaps)
]


@pytest.mark.parametrize("case", POOL_CASES)
def test_max_pool_argmax_forward_matches_reduce_window(case):
    from slowfast_tpu.ops.video_conv import max_pool_2d_argmax

    (H, W), k, s, p = case
    x = jax.random.normal(jax.random.PRNGKey(3), (2, H, W, 5), jnp.float32)
    ref = jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1,) + k + (1,), (1,) + s + (1,),
        [(0, 0), (p[0], p[0]), (p[1], p[1]), (0, 0)],
    )
    got = jax.jit(lambda x: max_pool_2d_argmax(x, k, s, p))(x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref))


@pytest.mark.parametrize("case", POOL_CASES)
def test_max_pool_argmax_grad_matches_torch(case):
    """Backward must match torch MaxPool2d (first-argmax-wins) exactly,
    including tied windows (all-equal windows after ReLU zeros)."""
    torch = pytest.importorskip("torch")
    from slowfast_tpu.ops.video_conv import max_pool_2d_argmax

    (H, W), k, s, p = case
    rng = np.random.RandomState(7)
    x = rng.randn(2, H, W, 4).astype(np.float32)
    # Inject ties: zero out a block so whole windows tie at 0.
    x[:, : H // 2, : W // 2, :2] = 0.0
    dy_fn = lambda y: (y * np.arange(1, y.size + 1).reshape(y.shape)).sum()

    xt = torch.tensor(np.ascontiguousarray(x.transpose(0, 3, 1, 2)),
                      requires_grad=True)
    # torch has no -inf-padded pool; emulate with explicit pad.
    xp = torch.nn.functional.pad(
        xt, (p[1], p[1], p[0], p[0]), value=float("-inf")
    )
    yt = torch.nn.functional.max_pool2d(xp, k, s)
    wt = torch.tensor(
        np.arange(1, yt.numel() + 1, dtype=np.float32).reshape(yt.shape)
    )
    (yt * wt).sum().backward()
    ref_dx = xt.grad.numpy().transpose(0, 2, 3, 1)

    def loss(x):
        y = max_pool_2d_argmax(x, k, s, p)
        w = jnp.arange(1, y.size + 1, dtype=jnp.float32).reshape(
            np.asarray(yt.detach().numpy().transpose(0, 2, 3, 1)).shape
        )
        # torch's NCHW weight layout, transposed to NHWC to match.
        wn = np.arange(1, yt.numel() + 1, dtype=np.float32).reshape(
            yt.shape
        ).transpose(0, 2, 3, 1)
        return (y * jnp.asarray(wn)).sum()

    got_dx = jax.grad(loss)(jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got_dx), ref_dx, rtol=1e-5, atol=1e-5)


def test_max_pool3d_temporal_argmax_matches_reduce_window():
    x = jax.random.normal(jax.random.PRNGKey(5), (2, 8, 6, 6, 16), jnp.float32)
    ref = jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 2, 1, 1, 1), (1, 2, 1, 1, 1),
        [(0, 0)] * 5,
    )
    got = jax.jit(lambda x: max_pool3d_fast(x, (2, 1, 1), (2, 1, 1)))(x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref))


def test_max_pool3d_temporal_argmax_grad():
    """Gradient of the temporal argmax pool: every dy routes to exactly one
    input frame (the first max), total gradient mass preserved."""
    x = jax.random.normal(jax.random.PRNGKey(6), (2, 8, 4, 4, 8), jnp.float32)
    g = jax.grad(lambda x: max_pool3d_fast(x, (2, 1, 1), (2, 1, 1)).sum())(x)
    # Each (t-pair, h, w, c) position contributes its dy=1 to one frame.
    pair_sums = np.asarray(g).reshape(2, 4, 2, 4, 4, 8).sum(axis=2)
    np.testing.assert_allclose(pair_sums, np.ones_like(pair_sums))


def test_pointwise_hybrid_backward_matches_conv():
    """SF_POINTWISE_CONV=hybrid: forward IS the conv op (bit-exact) and
    the dot-formulated custom VJP matches the conv VJP for both dx and
    dW (fp32 reduction-order noise only)."""
    from slowfast_tpu.ops import video_conv as vc

    x = jax.random.normal(jax.random.PRNGKey(0), (2, 4, 8, 8, 24), jnp.float32)
    w = jax.random.normal(jax.random.PRNGKey(1), (1, 1, 1, 24, 54), jnp.float32) * 0.1

    def loss(impl, x, w):
        old = vc._POINTWISE_IMPL
        vc._POINTWISE_IMPL = impl
        try:
            y = vc.spatial_conv(x, w, (1, 1), (0, 0))
        finally:
            vc._POINTWISE_IMPL = old
        return (jnp.sin(y) * y).sum(), y

    (gx_h, gw_h), (_, y_h) = (
        jax.grad(lambda x, w: loss("hybrid", x, w)[0], argnums=(0, 1))(x, w),
        loss("hybrid", x, w),
    )
    (gx_c, gw_c), (_, y_c) = (
        jax.grad(lambda x, w: loss("conv", x, w)[0], argnums=(0, 1))(x, w),
        loss("conv", x, w),
    )
    np.testing.assert_array_equal(np.asarray(y_h), np.asarray(y_c))
    np.testing.assert_allclose(np.asarray(gx_h), np.asarray(gx_c), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gw_h), np.asarray(gw_c), rtol=1e-4, atol=1e-3)


def test_pointwise_hybrid_gates():
    """The hybrid custom-VJP path only engages for stride-1 thin-channel
    pointwise convs; strided and wide-channel cases stay on the default
    conv path (identical outputs either way)."""
    from slowfast_tpu.ops import video_conv as vc

    x = jax.random.normal(jax.random.PRNGKey(2), (1, 2, 6, 6, 16), jnp.float32)
    w = jax.random.normal(jax.random.PRNGKey(3), (1, 1, 1, 16, 130), jnp.float32) * 0.1
    old = vc._POINTWISE_IMPL
    vc._POINTWISE_IMPL = "hybrid"
    try:
        # Wide output channels (>128): falls back; grad still finite/correct
        # against the conv mode.
        g_wide = jax.grad(
            lambda w: vc.spatial_conv(x, w, (1, 1), (0, 0)).sum()
        )(w)
        # Strided: falls back.
        y_str = vc.spatial_conv(x, w[..., :32], (2, 2), (0, 0))
    finally:
        vc._POINTWISE_IMPL = old
    g_ref = jax.grad(
        lambda w: vc.spatial_conv(x, w, (1, 1), (0, 0)).sum()
    )(w)
    np.testing.assert_allclose(np.asarray(g_wide), np.asarray(g_ref), rtol=1e-5, atol=1e-5)
    assert y_str.shape == (1, 2, 3, 3, 32)
