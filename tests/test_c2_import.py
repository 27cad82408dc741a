"""Caffe2 checkpoint import tests."""

import pickle
import tempfile

import jax
import numpy as np
import pytest

from slowfast_tpu.config import get_cfg
from slowfast_tpu.models import build_model
from slowfast_tpu.models.build import init_model
from slowfast_tpu.utils.c2_import import convert_c2_name, load_caffe2_checkpoint


@pytest.mark.parametrize(
    "src,want",
    [
        ("res4_1_branch2a_w", "s4.pathway0_res1.branch2.a.weight"),
        ("res4_1_branch2a_bn_s", "s4.pathway0_res1.branch2.a_bn.weight"),
        ("res4_1_branch2a_bn_rm", "s4.pathway0_res1.branch2.a_bn.running_mean"),
        ("res2_0_branch1_w", "s2.pathway0_res0.branch1.weight"),
        ("conv1_w", "s1.pathway0_stem.conv.weight"),
        ("res_conv1_bn_s", "s1.pathway0_stem.bn.weight"),
        ("t_conv1_w", "s1.pathway1_stem.conv.weight"),
        ("t_res4_1_branch2b_w", "s4.pathway1_res1.branch2.b.weight"),
        ("pred_b", "head.projection.bias"),
        ("t_pool1_subsample_w", "s1_fuse.conv_f2s.weight"),
        ("t_pool1_subsample_bn_riv", "s1_fuse.bn.running_var"),
        ("nonlocal_conv4_0_theta_w", "s4.pathway0_nonlocal0.conv_theta.weight"),
    ],
)
def test_c2_name_conversion(src, want):
    assert convert_c2_name(src) == want


def test_c2_checkpoint_roundtrip():
    """Synthesize a caffe2 blobs dict from a model's own params, import it,
    and verify every leaf round-trips."""
    cfg = get_cfg()
    cfg.MODEL.MODEL_NAME = "ResNet"
    cfg.MODEL.ARCH = "c2d"
    cfg.MODEL.NUM_CLASSES = 8
    cfg.RESNET.DEPTH = 18
    cfg.RESNET.NUM_BLOCK_TEMP_KERNEL = [[2], [2], [2], [2]]
    cfg.DATA.NUM_FRAMES = 4
    cfg.DATA.TRAIN_CROP_SIZE = 32
    cfg.DATA.INPUT_CHANNEL_NUM = [3]
    cfg.TPU.COMPUTE_DTYPE = "float32"
    model = build_model(cfg)
    variables = init_model(model, cfg, rng=jax.random.PRNGKey(0), train=False)

    # Build blobs: invert my flax names/layouts into caffe2 names/layouts.
    rng = np.random.RandomState(0)
    blobs = {}

    def put(c2name, arr):
        blobs[c2name] = arr

    flat = jax.tree_util.tree_flatten_with_path(variables["params"])[0]
    expected = {}
    for path, leaf in flat:
        keys = [str(getattr(p, "key")) for p in path]
        val = rng.randn(*leaf.shape).astype(np.float32)
        expected[tuple(keys)] = val
        # flax -> torch layout
        if keys[-1] == "kernel" and val.ndim == 5:
            tval = val.transpose(4, 3, 0, 1, 2)
        elif keys[-1] == "kernel" and val.ndim == 2:
            tval = val.T
        else:
            tval = val
        # flax path -> caffe2 name (only for the subset the rules cover)
        name = ".".join(keys)
        name = (
            name.replace("/", ".")
            .replace(".kernel", "_w")
            .replace(".scale", "_s")
            .replace(".bias", "_b")
        )
        c2 = _flax_to_c2(keys)
        if c2 is not None:
            put(c2, tval)

    with tempfile.NamedTemporaryFile(suffix=".pkl") as f:
        pickle.dump({"blobs": blobs}, open(f.name, "wb"))
        new_vars, missing, unexpected = load_caffe2_checkpoint(f.name, variables)
    assert not unexpected, unexpected[:5]

    # Every covered leaf must equal the synthesized value.
    flat_new = jax.tree_util.tree_flatten_with_path(new_vars["params"])[0]
    checked = 0
    for path, leaf in flat_new:
        keys = tuple(str(getattr(p, "key")) for p in path)
        if _flax_to_c2(list(keys)) is None:
            continue
        np.testing.assert_allclose(np.asarray(leaf), expected[keys], rtol=1e-6)
        checked += 1
    assert checked > 30


def _flax_to_c2(keys):
    """Inverse mapping for the common ResNet parameter names."""
    import re

    name = ".".join(keys)
    suffix = {"kernel": "w", "scale": "s", "bias": "b"}[keys[-1]]
    if name.startswith("s1.pathway0_stem.conv."):
        return f"conv1_{suffix}"
    if name.startswith("s1.pathway0_stem.bn."):
        return f"res_conv1_bn_{suffix}"
    m = re.match(r"s(\d)\.pathway0_res(\d)\.branch2\.([abc])\.kernel", name)
    if m:
        return f"res{m.group(1)}_{m.group(2)}_branch2{m.group(3)}_w"
    m = re.match(r"s(\d)\.pathway0_res(\d)\.branch2\.([abc])_bn\.(scale|bias)", name)
    if m:
        return f"res{m.group(1)}_{m.group(2)}_branch2{m.group(3)}_bn_{suffix}"
    m = re.match(r"s(\d)\.pathway0_res(\d)\.branch1\.kernel", name)
    if m:
        return f"res{m.group(1)}_{m.group(2)}_branch1_w"
    m = re.match(r"s(\d)\.pathway0_res(\d)\.branch1_bn\.(scale|bias)", name)
    if m:
        return f"res{m.group(1)}_{m.group(2)}_branch1_bn_{suffix}"
    if name == "head.projection.kernel":
        return "pred_w"
    if name == "head.projection.bias":
        return "pred_b"
    return None
