import os

# Force CPU with 8 virtual devices BEFORE jax initializes, so sharding and
# collective tests run without TPUs (SURVEY.md §4 test strategy).
# The harness presets JAX_PLATFORMS=axon (one real TPU); tests always run
# on the virtual CPU mesh, so override unconditionally.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# The jaxtyping pytest plugin imports jax before this conftest runs, so the
# env var alone is too late — update the config directly (the backend is not
# initialized until first device use, which happens inside tests).
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402


@pytest.fixture
def tiny_cfg():
    """A small config for fast CPU tests."""
    from slowfast_tpu.config import get_cfg

    cfg = get_cfg()
    cfg.DATA.NUM_FRAMES = 4
    cfg.DATA.TRAIN_CROP_SIZE = 32
    cfg.DATA.TEST_CROP_SIZE = 32
    cfg.MODEL.NUM_CLASSES = 16
    cfg.RESNET.DEPTH = 18
    cfg.NUM_GPUS = 1
    cfg.TPU.COMPUTE_DTYPE = "float32"
    return cfg
