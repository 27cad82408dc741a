"""Numerical parity against the reference implementation.

Instantiates the reference torch models (CPU, stubbed deps), exports their
random-init weights through the torch-checkpoint importer into the flax
models, and compares eval-mode forward outputs on identical inputs.
"""

import os

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from slowfast_tpu.config import get_cfg  # noqa: E402
from slowfast_tpu.models import build_model  # noqa: E402
from slowfast_tpu.models.build import init_model  # noqa: E402
from slowfast_tpu.utils.checkpoint import load_torch_checkpoint  # noqa: E402

REF = "/root/reference"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference repo not mounted"
)


def _ref_model(cfg_overrides, yaml=None):
    from tests.ref_compat.loader import load_reference

    load_reference()
    import torch
    from slowfast.config.defaults import get_cfg as ref_get_cfg
    from slowfast.models import build as ref_build  # noqa: F401
    from slowfast.models.video_model_builder import MViT, ResNet, SlowFast, X3D

    rcfg = ref_get_cfg()
    if yaml:
        rcfg.merge_from_file(yaml)
    rcfg.merge_from_list(cfg_overrides)
    rcfg.NUM_GPUS = 0
    name = rcfg.MODEL.MODEL_NAME
    cls = {"ResNet": ResNet, "SlowFast": SlowFast, "MViT": MViT, "X3D": X3D}[name]
    torch.manual_seed(0)
    model = cls(rcfg)
    model.eval()
    return model, rcfg


def _my_cfg(overrides, yaml=None):
    cfg = get_cfg()
    if yaml:
        cfg.merge_from_file(yaml)
    cfg.merge_from_list(overrides)
    cfg.NUM_GPUS = 1
    cfg.TPU.COMPUTE_DTYPE = "float32"
    return cfg


def _compare(ref_model, cfg, inputs_np, bboxes=None, atol=2e-4):
    import torch

    # Reference forward: NCTHW input list.
    tins = [
        torch.from_numpy(np.ascontiguousarray(x.transpose(0, 4, 1, 2, 3)))
        for x in inputs_np
    ]
    with torch.no_grad():
        ref_out = ref_model(tins).numpy()

    # Export reference weights -> my model.
    import tempfile

    model = build_model(cfg)
    variables = init_model(model, cfg, rng=jax.random.PRNGKey(0), train=False)
    with tempfile.NamedTemporaryFile(suffix=".pyth") as f:
        torch.save({"model_state": ref_model.state_dict()}, f.name)
        new_vars, missing, unexpected = load_torch_checkpoint(f.name, variables)
    assert not missing, f"missing: {missing[:10]}"
    assert not unexpected, f"unexpected: {unexpected[:10]}"

    my_out = model.apply(
        {"params": new_vars["params"], "batch_stats": new_vars["batch_stats"]},
        [jnp.asarray(x) for x in inputs_np],
        train=False,
    )
    my_out = np.asarray(my_out)
    assert my_out.shape == ref_out.shape
    np.testing.assert_allclose(my_out, ref_out, rtol=1e-3, atol=atol)


def test_c2d_parity():
    overrides = [
        "MODEL.MODEL_NAME", "ResNet", "MODEL.ARCH", "c2d",
        "MODEL.NUM_CLASSES", "16", "RESNET.DEPTH", "18",
        "RESNET.NUM_BLOCK_TEMP_KERNEL", "[[2],[2],[2],[2]]",
        "DATA.NUM_FRAMES", "4", "DATA.TRAIN_CROP_SIZE", "32",
        "DATA.INPUT_CHANNEL_NUM", "[3]", "MODEL.DROPOUT_RATE", "0.0",
    ]
    ref_model, _ = _ref_model(overrides)
    cfg = _my_cfg(overrides)
    x = np.random.RandomState(0).randn(2, 4, 32, 32, 3).astype(np.float32)
    _compare(ref_model, cfg, [x])


def test_slowfast_parity():
    overrides = [
        "MODEL.MODEL_NAME", "SlowFast", "MODEL.ARCH", "slowfast",
        "MODEL.NUM_CLASSES", "16", "RESNET.DEPTH", "18",
        "RESNET.NUM_BLOCK_TEMP_KERNEL", "[[2,2],[2,2],[2,2],[2,2]]",
        "RESNET.SPATIAL_STRIDES", "[[1,1],[2,2],[2,2],[2,2]]",
        "RESNET.SPATIAL_DILATIONS", "[[1,1],[1,1],[1,1],[1,1]]",
        "NONLOCAL.LOCATION", "[[[],[]],[[],[]],[[],[]],[[],[]]]",
        "NONLOCAL.GROUP", "[[1,1],[1,1],[1,1],[1,1]]",
        "NONLOCAL.POOL", "[[[1,2,2],[1,2,2]],[[1,2,2],[1,2,2]],[[1,2,2],[1,2,2]],[[1,2,2],[1,2,2]]]",
        "SLOWFAST.ALPHA", "4", "SLOWFAST.BETA_INV", "8",
        "SLOWFAST.FUSION_KERNEL_SZ", "5",
        "DATA.NUM_FRAMES", "8", "DATA.TRAIN_CROP_SIZE", "32",
        "MODEL.DROPOUT_RATE", "0.0",
    ]
    ref_model, _ = _ref_model(overrides)
    cfg = _my_cfg(overrides)
    rng = np.random.RandomState(0)
    slow = rng.randn(2, 2, 32, 32, 3).astype(np.float32)
    fast = rng.randn(2, 8, 32, 32, 3).astype(np.float32)
    _compare(ref_model, cfg, [slow, fast])


def test_i3d_nln_parity():
    overrides = [
        "MODEL.MODEL_NAME", "ResNet", "MODEL.ARCH", "i3d",
        "MODEL.NUM_CLASSES", "16", "RESNET.DEPTH", "18",
        "RESNET.NUM_BLOCK_TEMP_KERNEL", "[[2],[2],[2],[2]]",
        "NONLOCAL.LOCATION", "[[[]],[[1]],[[]],[[]]]",
        "DATA.NUM_FRAMES", "8", "DATA.TRAIN_CROP_SIZE", "32",
        "DATA.INPUT_CHANNEL_NUM", "[3]", "MODEL.DROPOUT_RATE", "0.0",
        "NONLOCAL.INSTANTIATION", "softmax",
    ]
    ref_model, _ = _ref_model(overrides)
    cfg = _my_cfg(overrides)
    x = np.random.RandomState(0).randn(2, 8, 32, 32, 3).astype(np.float32)
    _compare(ref_model, cfg, [x])


def test_x3d_parity():
    overrides = [
        "MODEL.MODEL_NAME", "X3D", "MODEL.ARCH", "x3d",
        "MODEL.NUM_CLASSES", "16", "RESNET.DEPTH", "50",
        "RESNET.TRANS_FUNC", "x3d_transform",
        "X3D.WIDTH_FACTOR", "2.0", "X3D.DEPTH_FACTOR", "1.0",
        "X3D.BOTTLENECK_FACTOR", "2.25", "X3D.DIM_C5", "128",
        "DATA.NUM_FRAMES", "4", "DATA.TRAIN_CROP_SIZE", "32",
        "DATA.INPUT_CHANNEL_NUM", "[3]", "MODEL.DROPOUT_RATE", "0.0",
    ]
    ref_model, _ = _ref_model(overrides)
    cfg = _my_cfg(overrides)
    x = np.random.RandomState(0).randn(2, 4, 32, 32, 3).astype(np.float32)
    _compare(ref_model, cfg, [x])


def test_mvit_v2_parity():
    overrides = [
        "MODEL.MODEL_NAME", "MViT", "MODEL.ARCH", "mvit",
        "MODEL.NUM_CLASSES", "16",
        "MVIT.EMBED_DIM", "32", "MVIT.NUM_HEADS", "1", "MVIT.DEPTH", "4",
        "MVIT.PATCH_KERNEL", "[3,7,7]", "MVIT.PATCH_STRIDE", "[2,4,4]",
        "MVIT.PATCH_PADDING", "[1,3,3]",
        "MVIT.DIM_MUL", "[[1,2.0],[3,2.0]]", "MVIT.HEAD_MUL", "[[1,2.0],[3,2.0]]",
        "MVIT.POOL_Q_STRIDE", "[[1,1,2,2],[3,1,2,2]]",
        "MVIT.POOL_KVQ_KERNEL", "[3,3,3]",
        "MVIT.POOL_KV_STRIDE_ADAPTIVE", "[1,8,8]",
        "MVIT.MODE", "conv", "MVIT.CLS_EMBED_ON", "False",
        "MVIT.SEP_POS_EMBED", "False", "MVIT.USE_ABS_POS", "False",
        "MVIT.REL_POS_SPATIAL", "True", "MVIT.REL_POS_TEMPORAL", "True",
        "MVIT.RESIDUAL_POOLING", "True", "MVIT.DIM_MUL_IN_ATT", "True",
        "MVIT.USE_MEAN_POOLING", "True", "MVIT.DROPPATH_RATE", "0.0",
        "MVIT.ZERO_DECAY_POS_CLS", "False",
        "DATA.NUM_FRAMES", "8", "DATA.TRAIN_CROP_SIZE", "32",
        "DATA.TEST_CROP_SIZE", "32",
        "DATA.INPUT_CHANNEL_NUM", "[3]", "MODEL.DROPOUT_RATE", "0.0",
    ]
    ref_model, _ = _ref_model(overrides)
    cfg = _my_cfg(overrides)
    x = np.random.RandomState(0).randn(2, 8, 32, 32, 3).astype(np.float32)
    _compare(ref_model, cfg, [x], atol=5e-4)


def test_mvit_v1_parity():
    overrides = [
        "MODEL.MODEL_NAME", "MViT", "MODEL.ARCH", "mvit",
        "MODEL.NUM_CLASSES", "16",
        "MVIT.EMBED_DIM", "32", "MVIT.NUM_HEADS", "1", "MVIT.DEPTH", "3",
        "MVIT.PATCH_KERNEL", "[3,7,7]", "MVIT.PATCH_STRIDE", "[2,4,4]",
        "MVIT.PATCH_PADDING", "[1,3,3]",
        "MVIT.DIM_MUL", "[[1,2.0]]", "MVIT.HEAD_MUL", "[[1,2.0]]",
        "MVIT.POOL_Q_STRIDE", "[[1,1,2,2]]",
        "MVIT.POOL_KVQ_KERNEL", "[3,3,3]",
        "MVIT.POOL_KV_STRIDE_ADAPTIVE", "[1,4,4]",
        "MVIT.MODE", "conv", "MVIT.CLS_EMBED_ON", "True",
        "MVIT.SEP_POS_EMBED", "True", "MVIT.USE_ABS_POS", "True",
        "MVIT.DROPPATH_RATE", "0.0",
        "DATA.NUM_FRAMES", "8", "DATA.TRAIN_CROP_SIZE", "32",
        "DATA.TEST_CROP_SIZE", "32",
        "DATA.INPUT_CHANNEL_NUM", "[3]", "MODEL.DROPOUT_RATE", "0.0",
    ]
    ref_model, _ = _ref_model(overrides)
    cfg = _my_cfg(overrides)
    x = np.random.RandomState(0).randn(2, 8, 32, 32, 3).astype(np.float32)
    _compare(ref_model, cfg, [x], atol=5e-4)


def test_rev_mvit_parity():
    overrides = [
        "MODEL.MODEL_NAME", "MViT", "MODEL.ARCH", "mvit",
        "MODEL.NUM_CLASSES", "16",
        "MVIT.EMBED_DIM", "32", "MVIT.NUM_HEADS", "1", "MVIT.DEPTH", "4",
        "MVIT.PATCH_KERNEL", "[3,7,7]", "MVIT.PATCH_STRIDE", "[2,4,4]",
        "MVIT.PATCH_PADDING", "[1,3,3]",
        "MVIT.DIM_MUL", "[[1,2.0]]", "MVIT.HEAD_MUL", "[[1,2.0]]",
        "MVIT.POOL_Q_STRIDE", "[[1,1,2,2]]",
        "MVIT.POOL_KVQ_KERNEL", "[3,3,3]",
        "MVIT.POOL_KV_STRIDE_ADAPTIVE", "[1,4,4]",
        "MVIT.MODE", "conv", "MVIT.CLS_EMBED_ON", "False",
        "MVIT.SEP_POS_EMBED", "False", "MVIT.USE_ABS_POS", "False",
        "MVIT.RESIDUAL_POOLING", "True", "MVIT.DIM_MUL_IN_ATT", "True",
        "MVIT.USE_MEAN_POOLING", "True", "MVIT.DROPPATH_RATE", "0.0",
        "MVIT.ZERO_DECAY_POS_CLS", "False",
        "MVIT.REV.ENABLE", "True", "MVIT.REV.BUFFER_LAYERS", "[1]",
        "MVIT.REV.RESPATH_FUSE", "concat", "MVIT.REV.PRE_Q_FUSION", "avg",
        "MVIT.REV.RES_PATH", "conv",
        "DATA.NUM_FRAMES", "8", "DATA.TRAIN_CROP_SIZE", "32",
        "DATA.TEST_CROP_SIZE", "32",
        "DATA.INPUT_CHANNEL_NUM", "[3]", "MODEL.DROPOUT_RATE", "0.0",
    ]
    ref_model, _ = _ref_model(overrides)
    cfg = _my_cfg(overrides)
    x = np.random.RandomState(0).randn(2, 8, 32, 32, 3).astype(np.float32)
    _compare(ref_model, cfg, [x], atol=5e-4)


def test_contrastive_backbone_parity(monkeypatch):
    """ContrastiveModel (SimCLR) backbone+projector path: the reference's
    eval forward with index=None returns the l2-normalized projection
    (reference contrastive.py:692-701), which is exactly my
    ContrastiveModel.__call__ output."""
    from tests.ref_compat.loader import load_reference

    load_reference()
    import tempfile

    import torch
    from slowfast.models.contrastive import ContrastiveModel as RefCM
    from slowfast.config.defaults import get_cfg as ref_get_cfg

    # The reference constructor calls .cuda() on a softmax module
    # (contrastive.py:61) and on the simclr pos/neg masks; run it on CPU.
    monkeypatch.setattr(
        torch.nn.Module, "cuda", lambda self, *a, **k: self, raising=False
    )
    monkeypatch.setattr(
        torch.Tensor, "cuda", lambda self, *a, **k: self, raising=False
    )

    overrides = [
        "MODEL.MODEL_NAME", "ContrastiveModel", "MODEL.ARCH", "slow",
        "MODEL.LOSS_FUNC", "contrastive_loss", "MODEL.HEAD_ACT", "none",
        "MODEL.NUM_CLASSES", "16", "MODEL.DROPOUT_RATE", "0.0",
        "TASK", "ssl",
        "CONTRASTIVE.TYPE", "simclr", "CONTRASTIVE.DIM", "16",
        "CONTRASTIVE.MLP_DIM", "32", "CONTRASTIVE.NUM_MLP_LAYERS", "2",
        "CONTRASTIVE.BN_SYNC_MLP", "False", "CONTRASTIVE.BN_MLP", "True",
        "CONTRASTIVE.KNN_ON", "False",
        "RESNET.DEPTH", "18",
        "RESNET.NUM_BLOCK_TEMP_KERNEL", "[[2],[2],[2],[2]]",
        "DATA.NUM_FRAMES", "4", "DATA.TRAIN_CROP_SIZE", "32",
        "DATA.TEST_CROP_SIZE", "32", "DATA.INPUT_CHANNEL_NUM", "[3]",
    ]
    rcfg = ref_get_cfg()
    rcfg.merge_from_list(overrides)
    rcfg.NUM_GPUS = 1
    torch.manual_seed(0)
    ref_model = RefCM(rcfg)
    ref_model.eval()

    cfg = _my_cfg(overrides)
    model = build_model(cfg)
    variables = init_model(model, cfg, rng=jax.random.PRNGKey(0), train=False)

    with tempfile.NamedTemporaryFile(suffix=".pyth") as f:
        torch.save({"model_state": ref_model.state_dict()}, f.name)
        new_vars, missing, unexpected = load_torch_checkpoint(f.name, variables)
    assert not missing, f"missing: {missing[:10]}"
    assert not unexpected, f"unexpected: {unexpected[:10]}"

    x = np.random.RandomState(0).randn(2, 4, 32, 32, 3).astype(np.float32)
    t = torch.from_numpy(np.ascontiguousarray(x.transpose(0, 4, 1, 2, 3)))
    with torch.no_grad():
        ref_q = ref_model([t], index=None).numpy()

    my_q = np.asarray(
        model.apply(
            {"params": new_vars["params"], "batch_stats": new_vars["batch_stats"]},
            [jnp.asarray(x)],
            train=False,
        )
    )
    assert my_q.shape == ref_q.shape
    np.testing.assert_allclose(my_q, ref_q, rtol=1e-3, atol=2e-4)
