"""Caffe2 Model-Zoo checkpoint import.

Reference: slowfast/utils/c2_model_loading.py:9-120 +
slowfast/utils/checkpoint.py:216-280. Caffe2 checkpoints are pickled
``{'blobs': {name: ndarray}}`` dicts with layer names like
``res4_1_branch2a_w`` / ``t_conv1_w`` (fast pathway prefixed ``t_``);
the rule list below rewrites them to the module paths this framework
shares with the reference's pytorch models, after which the standard
torch-name importer applies (layout transposes, BN stat mapping,
inflation).
"""

import pickle
import re

import numpy as np

from . import logging as logging_utils

logger = logging_utils.get_logger(__name__)

# Sequentially-applied (pattern, replacement) rewrites. The rule content is
# the de-facto on-disk format spec of the zoo's caffe2 checkpoints
# (reference c2_model_loading.py:14-87) — it must match byte-for-byte to
# load those files, analogous to the config key set.
_C2_RULES = [
    (r"^nonlocal_conv([0-9]+)_([0-9]+)_(.*)", r"s\1.pathway0_nonlocal\2_\3"),
    (r"^(.*)_nonlocal([0-9]+)_(theta)(.*)", r"\1_nonlocal\2.conv_\3\4"),
    (r"^(.*)_nonlocal([0-9]+)_(g)(.*)", r"\1_nonlocal\2.conv_\3\4"),
    (r"^(.*)_nonlocal([0-9]+)_(phi)(.*)", r"\1_nonlocal\2.conv_\3\4"),
    (r"^(.*)_nonlocal([0-9]+)_(out)(.*)", r"\1_nonlocal\2.conv_\3\4"),
    (r"^(.*)_nonlocal([0-9]+)_(bn)_(.*)", r"\1_nonlocal\2.\3.\4"),
    (r"^t_pool1_subsample_bn_(.*)", r"s1_fuse.bn.\1"),
    (r"^t_pool1_subsample_(.*)", r"s1_fuse.conv_f2s.\1"),
    (
        r"^t_res([0-9]+)_([0-9]+)_branch2c_bn_subsample_bn_(.*)",
        r"s\1_fuse.bn.\3",
    ),
    (
        r"^t_res([0-9]+)_([0-9]+)_branch2c_bn_subsample_(.*)",
        r"s\1_fuse.conv_f2s.\3",
    ),
    (
        r"^res([0-9]+)_([0-9]+)_branch([0-9]+)([a-z])_(.*)",
        r"s\1.pathway0_res\2.branch\3.\4_\5",
    ),
    (r"^res_conv1_bn_(.*)", r"s1.pathway0_stem.bn.\1"),
    (r"^conv1_xy(.*)", r"s1.pathway0_stem.conv_xy\1"),
    (r"^conv1_(.*)", r"s1.pathway0_stem.conv.\1"),
    (
        r"^res([0-9]+)_([0-9]+)_branch([0-9]+)_(.*)",
        r"s\1.pathway0_res\2.branch\3_\4",
    ),
    (r"^res_conv1_(.*)", r"s1.pathway0_stem.conv.\1"),
    (
        r"^t_res([0-9]+)_([0-9]+)_branch([0-9]+)([a-z])_(.*)",
        r"s\1.pathway1_res\2.branch\3.\4_\5",
    ),
    (r"^t_res_conv1_bn_(.*)", r"s1.pathway1_stem.bn.\1"),
    (r"^t_conv1_(.*)", r"s1.pathway1_stem.conv.\1"),
    (
        r"^t_res([0-9]+)_([0-9]+)_branch([0-9]+)_(.*)",
        r"s\1.pathway1_res\2.branch\3_\4",
    ),
    (r"^t_res_conv1_(.*)", r"s1.pathway1_stem.conv.\1"),
    (r"pred_(.*)", r"head.projection.\1"),
    (r"(.*)b_bn_fc(.*)", r"\1se.fc\2"),
    (r"conv_5(.*)", r"head.conv_5\1"),
    (r"lin_5(.*)", r"head.lin_5\1"),
    (r"(.*)bn.b\Z", r"\1bn.bias"),
    (r"(.*)bn.s\Z", r"\1bn.weight"),
    (r"(.*)bn.rm\Z", r"\1bn.running_mean"),
    (r"(.*)bn.riv\Z", r"\1bn.running_var"),
    (r"(.*)[\._]b\Z", r"\1.bias"),
    (r"(.*)[\._]w\Z", r"\1.weight"),
]


def convert_c2_name(name: str) -> str:
    for pattern, repl in _C2_RULES:
        name = re.sub(pattern, repl, name)
    return name


def load_caffe2_checkpoint(path, variables, inflate=False):
    """Load a caffe2 pickle into flax variables.

    Returns (new_variables, missing, unexpected) like load_torch_checkpoint.
    """
    from .checkpoint import load_torch_checkpoint_dict

    with open(path, "rb") as f:
        blobs = pickle.load(f, encoding="latin1")
    if "blobs" in blobs:
        blobs = blobs["blobs"]

    state_dict = {}
    for name, val in blobs.items():
        if "momentum" in name or not isinstance(val, np.ndarray):
            continue
        torch_name = convert_c2_name(name)
        # Caffe2 BN params can carry trailing singleton dims
        # (reference checkpoint.py:245-262): squeeze 1-D-like tensors.
        if val.ndim > 1 and ("bn." in torch_name or torch_name.endswith(".bias")):
            if np.prod(val.shape) == max(val.shape):
                val = val.reshape(-1)
        state_dict[torch_name] = val
    logger.info("Converted %d caffe2 blobs", len(state_dict))
    return load_torch_checkpoint_dict(state_dict, variables, inflate=inflate)
