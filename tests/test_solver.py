"""Solver tests: LR schedules against reference math, losses, partitioning."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from slowfast_tpu.config import get_cfg
from slowfast_tpu.solver import losses
from slowfast_tpu.solver.lr_policy import get_lr_at_epoch
from slowfast_tpu.solver.optimizer import (
    build_param_scales,
    construct_optimizer,
    make_lr_schedule,
)


def test_cosine_lr_matches_reference_math():
    cfg = get_cfg()
    cfg.SOLVER.LR_POLICY = "cosine"
    cfg.SOLVER.BASE_LR = 0.1
    cfg.SOLVER.COSINE_END_LR = 0.001
    cfg.SOLVER.MAX_EPOCH = 100
    cfg.SOLVER.WARMUP_EPOCHS = 5.0
    cfg.SOLVER.WARMUP_START_LR = 0.01
    sched = make_lr_schedule(cfg, steps_per_epoch=10)
    for epoch in [0.0, 2.5, 5.0, 50.0, 99.9]:
        expect = get_lr_at_epoch(cfg, epoch)
        got = float(sched(epoch * 10))
        assert abs(got - expect) < 1e-6, (epoch, got, expect)


def test_steps_lr():
    cfg = get_cfg()
    cfg.SOLVER.LR_POLICY = "steps_with_relative_lrs"
    cfg.SOLVER.STEPS = [0, 10, 20]
    cfg.SOLVER.LRS = [1.0, 0.1, 0.01]
    cfg.SOLVER.BASE_LR = 0.5
    cfg.SOLVER.MAX_EPOCH = 30
    cfg.SOLVER.WARMUP_EPOCHS = 0.0
    sched = make_lr_schedule(cfg, steps_per_epoch=1)
    assert abs(float(sched(5)) - 0.5) < 1e-6
    assert abs(float(sched(15)) - 0.05) < 1e-6
    assert abs(float(sched(25)) - 0.005) < 1e-6


def test_cross_entropy_matches_manual():
    logits = jnp.asarray([[2.0, 1.0, 0.1], [0.5, 2.5, 0.2]])
    labels = jnp.asarray([0, 1])
    got = float(losses.cross_entropy(logits, labels))
    p = jax.nn.log_softmax(logits)
    expect = -float((p[0, 0] + p[1, 1]) / 2)
    assert abs(got - expect) < 1e-6


def test_soft_ce_and_bce():
    logits = jnp.asarray([[2.0, 1.0], [0.5, 2.5]])
    soft = jnp.asarray([[0.9, 0.1], [0.2, 0.8]])
    v = float(losses.soft_cross_entropy(logits, soft))
    assert np.isfinite(v) and v > 0
    probs = jax.nn.sigmoid(logits)
    tgt = jnp.asarray([[1.0, 0.0], [0.0, 1.0]])
    assert abs(
        float(losses.bce(probs, tgt)) - float(losses.bce_logit(logits, tgt))
    ) < 1e-5


def test_param_partitioning_wd_and_layer_decay():
    cfg = get_cfg()
    cfg.SOLVER.ZERO_WD_1D_PARAM = True
    cfg.SOLVER.WEIGHT_DECAY = 0.05
    cfg.BN.WEIGHT_DECAY = 0.01
    cfg.SOLVER.LAYER_DECAY = 0.5
    cfg.MVIT.DEPTH = 2
    params = {
        "patch_embed": {"proj": {"kernel": jnp.ones((3, 3, 3, 3, 8)), "bias": jnp.ones(8)}},
        "blocks_0": {"attn": {"qkv": {"kernel": jnp.ones((8, 24)), "bias": jnp.ones(24)}}},
        "blocks_1": {"mlp": {"fc1": {"kernel": jnp.ones((8, 16))}}},
        "head": {"projection": {"kernel": jnp.ones((8, 4)), "bias": jnp.ones(4)}},
        "s1": {"pathway0_stem": {"bn": {"scale": jnp.ones(8), "bias": jnp.ones(8)}}},
    }
    wd, scale = build_param_scales(params, cfg)
    # BN params get BN.WEIGHT_DECAY
    assert wd["s1"]["pathway0_stem"]["bn"]["scale"] == 0.01
    # biases / 1-D get zero wd
    assert wd["blocks_0"]["attn"]["qkv"]["bias"] == 0.0
    # kernels get SOLVER.WEIGHT_DECAY
    assert wd["blocks_0"]["attn"]["qkv"]["kernel"] == 0.05
    # layer decay: patch_embed layer 0 -> 0.5^(3-0); blocks_1 -> 0.5^(3-2);
    # head -> 0.5^0 = 1
    assert abs(scale["patch_embed"]["proj"]["kernel"] - 0.5 ** 3) < 1e-9
    assert abs(scale["blocks_1"]["mlp"]["fc1"]["kernel"] - 0.5) < 1e-9
    assert scale["head"]["projection"]["kernel"] == 1.0


def test_sgd_matches_torch_semantics():
    """One SGD+momentum+wd step must equal torch.optim.SGD."""
    import torch

    cfg = get_cfg()
    cfg.SOLVER.OPTIMIZING_METHOD = "sgd"
    cfg.SOLVER.BASE_LR = 0.1
    cfg.SOLVER.LR_POLICY = "constant"
    cfg.SOLVER.MOMENTUM = 0.9
    cfg.SOLVER.NESTEROV = True
    cfg.SOLVER.WEIGHT_DECAY = 0.01
    cfg.SOLVER.WARMUP_EPOCHS = 0.0

    w0 = np.random.RandomState(0).randn(4, 4).astype(np.float32)
    g = np.random.RandomState(1).randn(4, 4).astype(np.float32)

    params = {"layer": {"kernel": jnp.asarray(w0)}}
    grads = {"layer": {"kernel": jnp.asarray(g)}}
    tx, lr_fn = construct_optimizer(params, cfg, steps_per_epoch=1)
    opt_state = tx.init(params)
    for step in range(3):
        updates, opt_state = tx.update(grads, opt_state, params)
        lr = lr_fn(step)
        params = jax.tree_util.tree_map(
            lambda p, u: p - lr * u, params, updates
        )

    tw = torch.nn.Parameter(torch.from_numpy(w0.copy()))
    opt = torch.optim.SGD(
        [tw], lr=0.1, momentum=0.9, nesterov=True, weight_decay=0.01
    )
    for _ in range(3):
        opt.zero_grad()
        tw.grad = torch.from_numpy(g.copy())
        opt.step()
    np.testing.assert_allclose(
        np.asarray(params["layer"]["kernel"]), tw.detach().numpy(), rtol=1e-5,
        atol=1e-6,
    )


def test_lars_matches_reference_semantics():
    """SGD+LARS must match the reference LARS wrapper (optimizer.py:262-359,
    trust=0.001, clip=False): the trust ratio scales the RAW gradient
    (+absorbed wd) BEFORE momentum; BN and 1-D params are exempt."""
    import torch

    cfg = get_cfg()
    cfg.SOLVER.OPTIMIZING_METHOD = "sgd"
    cfg.SOLVER.BASE_LR = 0.1
    cfg.SOLVER.LR_POLICY = "constant"
    cfg.SOLVER.MOMENTUM = 0.9
    cfg.SOLVER.NESTEROV = False
    cfg.SOLVER.WEIGHT_DECAY = 0.01
    cfg.SOLVER.ZERO_WD_1D_PARAM = False
    cfg.SOLVER.WARMUP_EPOCHS = 0.0
    cfg.SOLVER.LARS_ON = True

    rs = np.random.RandomState(0)
    w0 = rs.randn(4, 4).astype(np.float32)
    g = rs.randn(4, 4).astype(np.float32)
    b0 = rs.randn(4).astype(np.float32)
    gb = rs.randn(4).astype(np.float32)

    params = {"layer": {"kernel": jnp.asarray(w0), "bias": jnp.asarray(b0)}}
    grads = {"layer": {"kernel": jnp.asarray(g), "bias": jnp.asarray(gb)}}
    tx, lr_fn = construct_optimizer(params, cfg, steps_per_epoch=1)
    opt_state = tx.init(params)
    for step in range(3):
        updates, opt_state = tx.update(grads, opt_state, params)
        params = jax.tree_util.tree_map(
            lambda p, u: p - lr_fn(step) * u, params, updates
        )

    # Reference: LARS.step() adapts p.grad, then torch SGD runs with the
    # group's weight_decay zeroed during the step.
    tw = torch.nn.Parameter(torch.from_numpy(w0.copy()))
    tb = torch.nn.Parameter(torch.from_numpy(b0.copy()))
    opt = torch.optim.SGD(
        [{"params": [tw, tb], "weight_decay": 0.0}], lr=0.1, momentum=0.9
    )
    trust, wd, eps = 0.001, 0.01, 1e-8
    for _ in range(3):
        opt.zero_grad()
        tw.grad = torch.from_numpy(g.copy())
        tb.grad = torch.from_numpy(gb.copy())
        # LARS adaptation on the 2-D param only (ignore_1d_param).
        p_norm = tw.data.norm()
        g_norm = tw.grad.norm()
        adaptive_lr = trust * p_norm / (g_norm + p_norm * wd + eps)
        tw.grad.data += wd * tw.data
        tw.grad.data *= adaptive_lr
        opt.step()
    np.testing.assert_allclose(
        np.asarray(params["layer"]["kernel"]), tw.detach().numpy(),
        rtol=1e-5, atol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(params["layer"]["bias"]), tb.detach().numpy(),
        rtol=1e-5, atol=1e-6,
    )


def test_sgd_dampening_matches_torch():
    """SOLVER.DAMPENING: v = mu*v + (1 - tau)*g, exactly torch.optim.SGD's
    dampening semantics (nesterov off; torch forbids the combination)."""
    import torch

    cfg = get_cfg()
    cfg.SOLVER.OPTIMIZING_METHOD = "sgd"
    cfg.SOLVER.BASE_LR = 0.1
    cfg.SOLVER.LR_POLICY = "constant"
    cfg.SOLVER.MOMENTUM = 0.9
    cfg.SOLVER.NESTEROV = False
    cfg.SOLVER.DAMPENING = 0.5
    cfg.SOLVER.WEIGHT_DECAY = 0.01
    cfg.SOLVER.WARMUP_EPOCHS = 0.0

    w0 = np.random.RandomState(0).randn(4, 4).astype(np.float32)
    g = np.random.RandomState(1).randn(4, 4).astype(np.float32)
    params = {"layer": {"kernel": jnp.asarray(w0)}}
    grads = {"layer": {"kernel": jnp.asarray(g)}}
    tx, lr_fn = construct_optimizer(params, cfg, steps_per_epoch=1)
    opt_state = tx.init(params)
    for step in range(3):
        updates, opt_state = tx.update(grads, opt_state, params)
        params = jax.tree_util.tree_map(
            lambda p, u: p - lr_fn(step) * u, params, updates
        )

    tw = torch.nn.Parameter(torch.from_numpy(w0.copy()))
    opt = torch.optim.SGD(
        [tw], lr=0.1, momentum=0.9, dampening=0.5, weight_decay=0.01
    )
    for _ in range(3):
        opt.zero_grad()
        tw.grad = torch.from_numpy(g.copy())
        opt.step()
    np.testing.assert_allclose(
        np.asarray(params["layer"]["kernel"]), tw.detach().numpy(), rtol=1e-5,
        atol=1e-6,
    )
