"""Static-shape AVA detection path: ROIAlign parity, padded-box collate,
loss invariance to padding.

The ROIAlign golden reference is an independent numpy port of the
detectron2 CPU/CUDA kernel algorithm (detectron2/layers/csrc/ROIAlign —
the op the reference consumes at slowfast/models/head_helper.py:88-94).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from slowfast_tpu.config import get_cfg
from slowfast_tpu.data.loader import _box_bucket, detection_collate
from slowfast_tpu.ops.roi_align import roi_align


# ---------------------------------------------------------------------------
# numpy reference (detectron2 ROIAlign semantics)
# ---------------------------------------------------------------------------

def _bilinear_np(f, y, x):
    H, W, C = f.shape
    if y < -1.0 or y > H or x < -1.0 or x > W:
        return np.zeros(C, np.float64)
    y = min(max(y, 0.0), H - 1.0)
    x = min(max(x, 0.0), W - 1.0)
    y0, x0 = int(np.floor(y)), int(np.floor(x))
    y1, x1 = min(y0 + 1, H - 1), min(x0 + 1, W - 1)
    ly, lx = y - y0, x - x0
    hy, hx = 1.0 - ly, 1.0 - lx
    return (
        f[y0, x0] * hy * hx
        + f[y0, x1] * hy * lx
        + f[y1, x0] * ly * hx
        + f[y1, x1] * ly * lx
    )


def roi_align_np(feats, rois, P, spatial_scale, sampling_ratio=0, aligned=True):
    feats = feats.astype(np.float64)
    R = rois.shape[0]
    C = feats.shape[-1]
    out = np.zeros((R, P, P, C), np.float64)
    offset = 0.5 if aligned else 0.0
    for r in range(R):
        b = int(rois[r, 0])
        x1 = rois[r, 1] * spatial_scale - offset
        y1 = rois[r, 2] * spatial_scale - offset
        x2 = rois[r, 3] * spatial_scale - offset
        y2 = rois[r, 4] * spatial_scale - offset
        rw, rh = x2 - x1, y2 - y1
        if not aligned:
            rw, rh = max(rw, 1.0), max(rh, 1.0)
        bh, bw = rh / P, rw / P
        gh = sampling_ratio if sampling_ratio > 0 else int(np.ceil(rh / P))
        gw = sampling_ratio if sampling_ratio > 0 else int(np.ceil(rw / P))
        gh, gw = max(gh, 1), max(gw, 1)
        for ph in range(P):
            for pw in range(P):
                acc = np.zeros(C, np.float64)
                for iy in range(gh):
                    y = y1 + ph * bh + (iy + 0.5) * bh / gh
                    for ix in range(gw):
                        x = x1 + pw * bw + (ix + 0.5) * bw / gw
                        acc += _bilinear_np(feats[b], y, x)
                out[r, ph, pw] = acc / (gh * gw)
    return out


def test_roi_align_matches_detectron2_golden():
    rs = np.random.RandomState(0)
    feats = rs.randn(2, 14, 14, 8).astype(np.float32)
    # AVA-realistic rois in 224x224 input coords (scale 1/16), incl. a
    # degenerate zero box (padding) and a partially out-of-range box.
    rois = np.array(
        [
            [0, 10.0, 20.0, 200.0, 210.0],
            [0, 0.0, 0.0, 224.0, 224.0],
            [1, 50.5, 60.25, 120.75, 180.0],
            [1, 0.0, 0.0, 0.0, 0.0],
            [0, -8.0, -8.0, 100.0, 90.0],
        ],
        np.float32,
    )
    got = np.asarray(
        roi_align(feats, rois, output_size=7, spatial_scale=1 / 16,
                  sampling_ratio=0, aligned=True)
    )
    want = roi_align_np(feats, rois, 7, 1 / 16, 0, aligned=True)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_roi_align_unaligned_and_fixed_sampling():
    rs = np.random.RandomState(1)
    feats = rs.randn(1, 10, 10, 4).astype(np.float32)
    rois = np.array([[0, 5.0, 5.0, 60.0, 40.0]], np.float32)
    got = np.asarray(
        roi_align(feats, rois, output_size=5, spatial_scale=1 / 8,
                  sampling_ratio=2, aligned=False)
    )
    want = roi_align_np(feats, rois, 5, 1 / 8, 2, aligned=False)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


# ---------------------------------------------------------------------------
# collate + loss
# ---------------------------------------------------------------------------

def _det_samples(box_counts, num_classes=4, s=16):
    rs = np.random.RandomState(2)
    samples = []
    for i, n in enumerate(box_counts):
        frames = [rs.rand(2, s, s, 3).astype(np.float32)]
        labels = rs.randint(0, 2, (n, num_classes)).astype(np.float32)
        meta = {
            "boxes": rs.rand(n, 4).astype(np.float32) * s,
            "ori_boxes": rs.rand(n, 4).astype(np.float32),
            "metadata": [[i, 900 + i]] * n,
        }
        samples.append((frames, labels, i, np.zeros(2), meta))
    return samples


def test_box_bucketing():
    assert _box_bucket(1) == 4
    assert _box_bucket(4) == 4
    assert _box_bucket(5) == 8
    assert _box_bucket(17) == 32
    assert _box_bucket(33) == 64  # beyond cap: rounded up to multiple


def test_detection_collate_static_shapes():
    inputs, labels, index, times, extra = detection_collate(
        _det_samples([2, 5, 1])
    )
    assert extra["boxes"].shape == (3, 8, 4)
    assert extra["box_mask"].shape == (3, 8)
    assert labels.shape == (3, 8, 4)
    assert extra["box_mask"].sum() == 8  # 2 + 5 + 1 real boxes
    # ragged meter-side arrays carry the batch index
    assert extra["ori_boxes"].shape == (8, 5)
    assert extra["metadata"].shape == (8, 2)
    # rows align: sample 1's boxes occupy ragged rows 2..6
    np.testing.assert_array_equal(extra["ori_boxes"][:2, 0], [0, 0])
    np.testing.assert_array_equal(extra["ori_boxes"][2:7, 0], [1] * 5)


def _tiny_det_cfg():
    cfg = get_cfg()
    cfg.MODEL.MODEL_NAME = "ResNet"
    cfg.MODEL.ARCH = "slow"
    cfg.MODEL.NUM_CLASSES = 4
    cfg.MODEL.LOSS_FUNC = "bce"
    cfg.MODEL.HEAD_ACT = "sigmoid"
    cfg.RESNET.DEPTH = 18
    cfg.RESNET.NUM_BLOCK_TEMP_KERNEL = [[1], [1], [1], [1]]
    cfg.DATA.NUM_FRAMES = 2
    cfg.DATA.TRAIN_CROP_SIZE = 32
    cfg.DATA.INPUT_CHANNEL_NUM = [3]
    cfg.DETECTION.ENABLE = True
    cfg.DETECTION.ALIGNED = True
    cfg.DETECTION.ROI_XFORM_RESOLUTION = 7
    cfg.DETECTION.SPATIAL_SCALE_FACTOR = 16
    cfg.MODEL.DROPOUT_RATE = 0.0  # dropout noise varies with padded shape
    cfg.TPU.COMPUTE_DTYPE = "float32"
    cfg.SOLVER.WARMUP_EPOCHS = 0.0
    return cfg


def test_detection_loss_invariant_to_padding():
    """The masked loss must not change when the same boxes are padded to a
    larger bucket — padded rows contribute nothing."""
    from slowfast_tpu.engine.steps import create_train_state, make_train_step
    from slowfast_tpu.models import build_model
    from slowfast_tpu.solver.optimizer import construct_optimizer

    cfg = _tiny_det_cfg()
    model = build_model(cfg)
    rng = jax.random.PRNGKey(0)
    from slowfast_tpu.models.build import init_model

    variables = init_model(model, cfg, rng=rng, train=True)
    tx, _ = construct_optimizer(variables["params"], cfg, 10)
    state = create_train_state(cfg, model, tx, rng=rng, variables=variables)
    step = make_train_step(cfg, model, tx, donate=False)

    rs = np.random.RandomState(3)
    B, n = 2, 3
    inputs = [jnp.asarray(rs.rand(B, 2, 32, 32, 3), jnp.float32)]
    raw_boxes = rs.rand(B, n, 4).astype(np.float32) * 32
    raw_labels = rs.randint(0, 2, (B, n, 4)).astype(np.float32)

    losses = []
    for pad in (4, 8):
        boxes = np.zeros((B, pad, 4), np.float32)
        mask = np.zeros((B, pad), np.float32)
        labels = np.zeros((B, pad, 4), np.float32)
        boxes[:, :n] = raw_boxes
        mask[:, :n] = 1.0
        labels[:, :n] = raw_labels
        batch = {
            "inputs": inputs,
            "labels": jnp.asarray(labels),
            "boxes": jnp.asarray(boxes),
            "box_mask": jnp.asarray(mask),
        }
        _, m = step(state, batch, rng)
        losses.append(float(m["loss"]))
    assert abs(losses[0] - losses[1]) < 1e-5, losses


def test_detection_step_on_2d_mesh():
    """Detection train step on a (data, spatial) mesh: H-sharded clips
    feed an ROIAlign head (GSPMD gathers the sharded features under the
    boxes); loss matches the unsharded step on the same batch."""
    from slowfast_tpu.engine.steps import create_train_state, make_train_step
    from slowfast_tpu.models import build_model
    from slowfast_tpu.models.build import init_model
    from slowfast_tpu.parallel.mesh import create_mesh, shard_batch
    from slowfast_tpu.solver.optimizer import construct_optimizer

    cfg = _tiny_det_cfg()
    model = build_model(cfg)
    rng = jax.random.PRNGKey(0)
    variables = init_model(model, cfg, rng=rng, train=True)
    tx, _ = construct_optimizer(variables["params"], cfg, 10)

    rs = np.random.RandomState(3)
    B, pad, n = 8, 4, 3
    boxes = np.zeros((B, pad, 4), np.float32)
    mask = np.zeros((B, pad), np.float32)
    labels = np.zeros((B, pad, 4), np.float32)
    boxes[:, :n] = rs.rand(B, n, 4).astype(np.float32) * 32
    mask[:, :n] = 1.0
    labels[:, :n] = rs.randint(0, 2, (B, n, 4)).astype(np.float32)
    raw = {
        "inputs": [jnp.asarray(rs.rand(B, 2, 32, 32, 3), jnp.float32)],
        "labels": jnp.asarray(labels),
        "boxes": jnp.asarray(boxes),
        "box_mask": jnp.asarray(mask),
    }

    losses = {}
    for sp in (1, 2):
        cfg.TPU.SPATIAL_PARTITIONS = sp
        mesh = create_mesh(cfg)
        state = create_train_state(cfg, model, tx, rng=rng, variables=variables)
        step = make_train_step(cfg, model, tx, mesh=mesh, donate=False)
        _, m = step(state, shard_batch(dict(raw), mesh), rng)
        losses[sp] = float(m["loss"])
    assert np.isfinite(losses[1]) and np.isfinite(losses[2])
    np.testing.assert_allclose(losses[1], losses[2], rtol=3e-3)


def test_e2e_detection_synthetic(tmp_path):
    """Full detection trainer loop on synthetic frames: padded-box loader ->
    jitted masked-loss step -> AVA val meter (mAP assets absent -> collects
    only). Proves the static-shape path end to end."""
    from slowfast_tpu.config.defaults import assert_and_infer_cfg
    from slowfast_tpu.engine.trainer import train

    cfg = _tiny_det_cfg()
    cfg.TRAIN.DATASET = "syntheticvideo"
    cfg.TEST.DATASET = "syntheticvideo"
    cfg.TRAIN.BATCH_SIZE = 8
    cfg.TEST.BATCH_SIZE = 8
    cfg.SOLVER.MAX_EPOCH = 1
    cfg.SOLVER.BASE_LR = 0.01
    cfg.DATA_LOADER.NUM_WORKERS = 2
    cfg.OUTPUT_DIR = str(tmp_path)
    cfg.NUM_GPUS = 1
    cfg = assert_and_infer_cfg(cfg)
    cfg.DATA.SYNTHETIC_SIZE = 16

    state = train(cfg)
    assert int(state.step) == 2  # 16 samples / batch 8
    assert np.isfinite(
        float(jax.tree_util.tree_leaves(state.params)[0].sum())
    )


def test_roi_align_matmul_matches_gather_impl():
    """The separable-matmul formulation and the gather formulation agree
    on values AND on the feature gradient (the gather path stays covered
    even though matmul is the default)."""
    from slowfast_tpu.ops import roi_align as ra

    rs = np.random.RandomState(7)
    feats = rs.randn(3, 9, 11, 6).astype(np.float32)
    rois = np.array(
        [
            [0, 10.0, 20.0, 120.0, 100.0],
            [2, 0.0, 0.0, 176.0, 144.0],
            [1, -8.0, 33.3, 61.7, 200.0],
            [1, 0.0, 0.0, 0.0, 0.0],
        ],
        np.float32,
    )

    def run(impl, f):
        return ra.roi_align(
            f, rois, output_size=5, spatial_scale=1 / 16,
            sampling_ratio=0, aligned=True, impl=impl,
        )

    fj = jnp.asarray(feats)
    y_m = run("matmul", fj)
    y_g = run("gather", fj)
    np.testing.assert_allclose(np.asarray(y_m), np.asarray(y_g), rtol=1e-5, atol=1e-5)

    g_m = jax.grad(lambda f: (run("matmul", f) ** 2).sum())(fj)
    g_g = jax.grad(lambda f: (run("gather", f) ** 2).sum())(fj)
    np.testing.assert_allclose(np.asarray(g_m), np.asarray(g_g), rtol=1e-4, atol=1e-4)
