"""Argument parsing and config loading.

Mirrors the reference CLI contract (reference: slowfast/utils/parser.py:13-94):
``--cfg`` accepts one or more yaml files, ``--opts`` takes trailing
KEY VALUE pairs, and ``--shard_id/--num_shards/--init_method`` select the
multi-host topology.
"""

import argparse
import os
import sys

from slowfast_tpu.config import get_cfg


def parse_args():
    parser = argparse.ArgumentParser(
        description="Run a video understanding task on TPU (train/test/demo/vis)."
    )
    parser.add_argument(
        "--shard_id",
        help="Index of this host among NUM_SHARDS hosts.",
        default=0,
        type=int,
    )
    parser.add_argument(
        "--num_shards",
        help="Total number of hosts participating in the job.",
        default=1,
        type=int,
    )
    parser.add_argument(
        "--init_method",
        help="Coordinator address for multi-host init (jax.distributed).",
        default="tcp://localhost:9999",
        type=str,
    )
    parser.add_argument(
        "--cfg",
        dest="cfg_files",
        help="Path(s) to the config file(s).",
        default=None,
        nargs="+",
    )
    parser.add_argument(
        "--opts",
        help="Config overrides: --opts KEY VALUE [KEY VALUE ...] "
        "(reference parser.py:56-61; a bare positional REMAINDER would be "
        "swallowed by --cfg's nargs='+').",
        default=None,
        nargs=argparse.REMAINDER,
    )
    if len(sys.argv) == 1:
        parser.print_help()
    return parser.parse_args()


def load_config(args, path_to_config=None):
    """Build a config from defaults + yaml file + CLI overrides."""
    cfg = get_cfg()
    if path_to_config is not None:
        cfg.merge_from_file(path_to_config)
    if args.opts is not None:
        cfg.merge_from_list(args.opts)

    if hasattr(args, "num_shards") and hasattr(args, "shard_id"):
        cfg.NUM_SHARDS = args.num_shards
        cfg.SHARD_ID = args.shard_id
    if hasattr(args, "init_method"):
        cfg.INIT_METHOD = args.init_method

    # Create the output directory (and checkpoint dir) eagerly, as the
    # reference does, so that logging can start immediately.
    if cfg.OUTPUT_DIR:
        os.makedirs(os.path.join(cfg.OUTPUT_DIR, "checkpoints"), exist_ok=True)
    return cfg
