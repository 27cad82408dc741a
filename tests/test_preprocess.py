"""On-device uint8 preprocessing (Pallas kernel) vs host reference math."""

import jax.numpy as jnp
import numpy as np

from slowfast_tpu.ops.preprocess import device_preprocess, normalize_clips

MEAN = [0.45, 0.45, 0.45]
STD = [0.225, 0.225, 0.225]


def _host_normalize(x, mean, std):
    x = x.astype(np.float32) / 255.0
    return (x - np.asarray(mean, np.float32)) / np.asarray(std, np.float32)


def test_normalize_matches_host():
    rng = np.random.RandomState(0)
    x = rng.randint(0, 256, (2, 8, 16, 20, 3), dtype=np.uint8)
    want = _host_normalize(x, MEAN, STD)
    for impl in ("xla", "pallas"):
        got = np.asarray(
            normalize_clips(x, MEAN, STD, out_dtype=jnp.float32, impl=impl)
        )
        np.testing.assert_allclose(got, want, atol=1e-5, err_msg=impl)


def test_normalize_bf16_close():
    rng = np.random.RandomState(1)
    x = rng.randint(0, 256, (1, 4, 8, 8, 3), dtype=np.uint8)
    got = np.asarray(normalize_clips(x, MEAN, STD)).astype(np.float32)
    want = _host_normalize(x, MEAN, STD)
    np.testing.assert_allclose(got, want, atol=2e-2)


def test_device_preprocess_pathways_and_flip():
    rng = np.random.RandomState(2)
    x = rng.randint(0, 256, (2, 8, 6, 10, 3), dtype=np.uint8)
    flips = np.array([1, 0])
    slow, fast = device_preprocess(
        x, MEAN, STD, flips=flips, alpha=4, out_dtype=jnp.float32
    )
    want = _host_normalize(x, MEAN, STD)
    want[0] = want[0][:, :, ::-1]
    np.testing.assert_allclose(np.asarray(fast), want, atol=1e-5)
    idx = np.linspace(0, 7, 2).astype(np.int64)
    np.testing.assert_allclose(np.asarray(slow), want[:, idx], atol=1e-5)


def test_device_preprocess_single_pathway():
    rng = np.random.RandomState(3)
    x = rng.randint(0, 256, (1, 4, 6, 6, 3), dtype=np.uint8)
    (out,) = device_preprocess(
        x, MEAN, STD, single_pathway=True, out_dtype=jnp.float32
    )
    np.testing.assert_allclose(
        np.asarray(out), _host_normalize(x, MEAN, STD), atol=1e-5
    )


def test_step_uint8_preprocess_matches_host_path():
    """_maybe_device_preprocess on a uint8 batch must equal the host
    tensor_normalize + pack_pathway_output pipeline."""
    import jax.numpy as jnp

    from slowfast_tpu.config import get_cfg
    from slowfast_tpu.data import utils as data_utils
    from slowfast_tpu.engine.steps import _maybe_device_preprocess

    cfg = get_cfg()
    cfg.MODEL.ARCH = "slowfast"
    cfg.SLOWFAST.ALPHA = 4
    cfg.TPU.COMPUTE_DTYPE = "float32"
    rs = np.random.RandomState(0)
    clip = rs.randint(0, 255, (2, 8, 16, 16, 3), np.uint8)

    got = _maybe_device_preprocess(cfg, [jnp.asarray(clip)])
    assert len(got) == 2
    for b in range(2):
        frames = data_utils.tensor_normalize(clip[b], cfg.DATA.MEAN, cfg.DATA.STD)
        want = data_utils.pack_pathway_output(cfg, frames.astype(np.float32))
        for g, w in zip(got, want):
            np.testing.assert_allclose(np.asarray(g[b]), w, rtol=1e-5, atol=1e-5)

    # Float pathway lists pass through untouched.
    f = [jnp.ones((2, 2, 16, 16, 3)), jnp.ones((2, 8, 16, 16, 3))]
    out = _maybe_device_preprocess(cfg, f)
    assert out is f
