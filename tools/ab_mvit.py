"""A/B bench for MViTv2-S train-step variants on the attached TPU.

Usage: python tools/ab_mvit.py KEY=VALUE [KEY=VALUE ...]
Applies the config overrides to the MVITv2_S_16x4 recipe (mixup ON, the
recipe as users run it) and prints clips/s.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax

    from bench import _build, _sf_inputs, _sync
    from slowfast_tpu.config import get_cfg

    cfg = get_cfg()
    cfg.merge_from_file(
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     "configs/Kinetics/MVITv2_S_16x4.yaml")
    )
    cfg.NUM_GPUS = 1
    cfg.TPU.COMPUTE_DTYPE = "bfloat16"
    if len(sys.argv) > 1:
        cfg.merge_from_list(
            [t for kv in sys.argv[1:] for t in kv.split("=", 1)]
        )
    state, step, rng = _build(cfg)
    B = int(os.environ.get("BENCH_MVIT_BATCH", "16"))
    batch = {
        "inputs": _sf_inputs(cfg, B, random=True),
        "labels": jax.random.randint(
            jax.random.PRNGKey(2), (B,), 0, cfg.MODEL.NUM_CLASSES
        ),
    }
    t0 = time.time()
    for _ in range(3):
        state, m = step(state, batch, rng)
    _sync(m)
    print(f"compiled+warm in {time.time()-t0:.0f}s", file=sys.stderr, flush=True)
    t0 = time.time()
    n = 20
    for _ in range(n):
        state, m = step(state, batch, rng)
    _sync(m)
    dt = time.time() - t0
    print(f"RESULT {sys.argv[1:]} -> {n*B/dt:.2f} clips/s ({dt/n*1000:.1f} ms/step)")


if __name__ == "__main__":
    main()
