"""Headline benchmark: SlowFast 4x16 R50 training throughput on one chip.

Measures end-to-end train-step throughput (forward + backward + SGD update,
bf16 compute) with synthetic on-device data at Kinetics shapes
(slow 4x224x224 + fast 32x224x224 per clip, 400 classes).

Baseline: the reference publishes no absolute throughput; BASELINE.json
targets >=2x A100 clips/sec/chip. An A100-80GB running the reference
(torch AMP, 8 workers) sustains roughly ~90 clips/s/GPU on SlowFast 4x16
R50 training (estimate from published 3rd-party SlowFast benchmarks);
vs_baseline is measured against that estimate.

Prints ONE json line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import sys
import time
import os

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

A100_BASELINE_CLIPS_PER_SEC = 90.0


def main():
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _flagship_cfg
    from slowfast_tpu.engine.steps import create_train_state, make_train_step
    from slowfast_tpu.models import build_model
    from slowfast_tpu.solver.optimizer import construct_optimizer

    cfg = _flagship_cfg()
    cfg.TPU.COMPUTE_DTYPE = "bfloat16"
    model = build_model(cfg)

    rng = jax.random.PRNGKey(0)
    init = jax.jit(
        lambda r: model.init(
            {"params": r, "dropout": jax.random.fold_in(r, 1)},
            _inputs(cfg, 2),
            train=True,
        )
    )
    print("bench: init...", file=sys.stderr, flush=True)
    variables = init(rng)
    jax.block_until_ready(variables["params"])
    print("bench: init done", file=sys.stderr, flush=True)
    tx, _ = construct_optimizer(variables["params"], cfg, steps_per_epoch=1000)
    state = create_train_state(cfg, model, tx, rng=rng, variables=variables)
    del variables
    step = make_train_step(cfg, model, tx, donate=True)

    B = int(os.environ.get("BENCH_BATCH", "16"))
    batch = {
        "inputs": _inputs(cfg, B, dtype=jnp.bfloat16, random=True),
        "labels": jax.random.randint(
            jax.random.PRNGKey(2), (B,), 0, cfg.MODEL.NUM_CLASSES
        ),
    }

    # Warmup (compile + 2 steps).
    print("bench: compiling train step...", file=sys.stderr, flush=True)
    t_c = time.time()
    state, m = step(state, batch, rng)
    _sync(m)
    print(f"bench: step compiled in {time.time()-t_c:.0f}s", file=sys.stderr, flush=True)
    for _ in range(2):
        state, m = step(state, batch, rng)
    _sync(m)

    # Timed: N sequential steps; the final scalar readback forces the chain.
    N = 20
    t0 = time.time()
    for _ in range(N):
        state, m = step(state, batch, rng)
    _sync(m)
    dt = time.time() - t0

    clips_per_sec = N * B / dt
    print(
        json.dumps(
            {
                "metric": "slowfast_4x16_r50_train_clips_per_sec_per_chip",
                "value": round(clips_per_sec, 2),
                "unit": "clips/s",
                "vs_baseline": round(clips_per_sec / A100_BASELINE_CLIPS_PER_SEC, 3),
            }
        )
    )


def _inputs(cfg, b, dtype=None, random=False):
    import jax
    import jax.numpy as jnp

    dtype = dtype or jnp.float32
    t, s, a = cfg.DATA.NUM_FRAMES, cfg.DATA.TRAIN_CROP_SIZE, cfg.SLOWFAST.ALPHA
    if random:
        k = jax.random.PRNGKey(1)
        return [
            jax.random.normal(k, (b, t // a, s, s, 3), dtype),
            jax.random.normal(jax.random.fold_in(k, 1), (b, t, s, s, 3), dtype),
        ]
    return [
        jnp.ones((b, t // a, s, s, 3), dtype),
        jnp.ones((b, t, s, s, 3), dtype),
    ]


def _sync(m):
    # block_until_ready is unreliable through the axon tunnel; a scalar
    # readback forces completion of the dependency chain.
    float(m["loss"])


if __name__ == "__main__":
    main()
