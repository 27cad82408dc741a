"""Logging utilities.

Behavior mirrors the reference (slowfast/utils/logging.py:19-106): only the
master process emits log lines; logs go to stdout and ``stdout.log`` in the
output dir; machine-readable stats are emitted as ``json_stats:`` lines.
"""

import builtins
import functools
import json
import logging
import os
import sys

from .io import pathmgr


def _suppress_print():
    def print_none(*objects, sep=" ", end="\n", file=sys.stdout, flush=False):
        pass

    builtins.print = print_none


@functools.lru_cache(maxsize=None)
def _cached_log_stream(filename):
    if "://" in filename:  # remote URI: route through pathmgr
        return pathmgr.open(filename, "a")
    return open(filename, "a", buffering=1)  # line-buffered local file


def setup_logging(output_dir=None, is_master=True):
    """Configure root logging. Non-master processes are silenced."""
    if not is_master:
        _suppress_print()
        logging.getLogger().addHandler(logging.NullHandler())
        return

    logger = logging.getLogger()
    logger.setLevel(logging.INFO)
    logger.propagate = False
    for h in list(logger.handlers):
        logger.removeHandler(h)

    plain_formatter = logging.Formatter(
        "[%(asctime)s][%(levelname)s] %(filename)s: %(lineno)3d: %(message)s",
        datefmt="%m/%d %H:%M:%S",
    )
    ch = logging.StreamHandler(stream=sys.stdout)
    ch.setLevel(logging.DEBUG)
    ch.setFormatter(plain_formatter)
    logger.addHandler(ch)

    if output_dir is not None:
        fh = logging.StreamHandler(_cached_log_stream(os.path.join(output_dir, "stdout.log")))
        fh.setLevel(logging.DEBUG)
        fh.setFormatter(plain_formatter)
        logger.addHandler(fh)


def get_logger(name):
    return logging.getLogger(name)


def log_json_stats(stats, output_dir=None):
    """Log a dict as a single ``json_stats:`` line (+ json_stats.log file)."""
    stats = {
        k: round(v, 5) if isinstance(v, float) else v for k, v in stats.items()
    }
    json_stats = json.dumps(stats, sort_keys=True)
    logger = get_logger(__name__)
    logger.info("json_stats: {:s}".format(json_stats))
    if output_dir is not None:
        with pathmgr.open(
            os.path.join(output_dir, "json_stats.log"), "a"
        ) as f:
            f.write("json_stats: {:s}\n".format(json_stats))
