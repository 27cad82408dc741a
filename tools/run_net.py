"""CLI entry: dispatch train -> test -> visualize -> demo per config.

Reference: tools/run_net.py:15-47.
"""

import sys
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Honor an explicit JAX_PLATFORMS even when a sitecustomize hook has
# prepended its own platform (e.g. forcing the cpu backend for debugging:
# JAX_PLATFORMS=cpu with --xla_force_host_platform_device_count=N).
if os.environ.get("JAX_PLATFORMS"):
    import jax

    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

from slowfast_tpu.config import assert_and_infer_cfg
from slowfast_tpu.utils.parser import load_config, parse_args


def main():
    args = parse_args()
    for path_to_config in args.cfg_files or [None]:
        cfg = load_config(args, path_to_config)
        cfg = assert_and_infer_cfg(cfg)

        if cfg.TRAIN.ENABLE:
            from slowfast_tpu.engine.trainer import train

            train(cfg)

        if cfg.TEST.ENABLE:
            from slowfast_tpu.engine.tester import test

            if cfg.TEST.NUM_ENSEMBLE_VIEWS == -1:
                # Sweep the standard view counts (reference run_net.py:31-35).
                num_view_list = [1, 3, 5, 7, 10]
                for num_view in num_view_list:
                    cfg.TEST.NUM_ENSEMBLE_VIEWS = num_view
                    test(cfg)
            else:
                test(cfg)

        if cfg.TENSORBOARD.ENABLE and (
            cfg.TENSORBOARD.MODEL_VIS.ENABLE or cfg.TENSORBOARD.WRONG_PRED_VIS.ENABLE
        ):
            from slowfast_tpu.visualization.vis import visualize

            visualize(cfg)

        if cfg.DEMO.ENABLE:
            from slowfast_tpu.visualization.demo import demo

            demo(cfg)


if __name__ == "__main__":
    main()
