"""Standalone train CLI (reference tools/train_net.py)."""

import sys
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from slowfast_tpu.config import assert_and_infer_cfg
from slowfast_tpu.utils.parser import load_config, parse_args


def main():
    args = parse_args()
    for path_to_config in args.cfg_files or [None]:
        cfg = load_config(args, path_to_config)
        cfg = assert_and_infer_cfg(cfg)
        from slowfast_tpu.engine.trainer import train

        train(cfg)


if __name__ == "__main__":
    main()
