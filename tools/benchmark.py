"""Data-loading benchmark (reference tools/benchmark.py + utils/benchmark.py:20-101).

Iterates the train loader without any model, logging clips/s and RAM.
"""

import sys
import os
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from slowfast_tpu.config import assert_and_infer_cfg
from slowfast_tpu.data import construct_loader, shuffle_dataset
from slowfast_tpu.utils import logging as logging_utils
from slowfast_tpu.utils.logging import log_json_stats
from slowfast_tpu.utils.parser import load_config, parse_args

logger = logging_utils.get_logger(__name__)


def benchmark_data_loading(cfg):
    logging_utils.setup_logging(cfg.OUTPUT_DIR)
    loader = construct_loader(cfg, "train")
    batch_size = cfg.TRAIN.BATCH_SIZE
    log_period = cfg.BENCHMARK.LOG_PERIOD
    for epoch in range(cfg.BENCHMARK.NUM_EPOCHS):
        if cfg.BENCHMARK.SHUFFLE:
            shuffle_dataset(loader, epoch)
        t0 = time.time()
        last = t0
        for cur_iter, batch in enumerate(loader):
            if (cur_iter + 1) % log_period == 0:
                now = time.time()
                ips = log_period * batch_size / (now - last)
                last = now
                log_json_stats(
                    {
                        "_type": "benchmark",
                        "epoch": epoch,
                        "iter": cur_iter + 1,
                        "clips_per_s": ips,
                    },
                    cfg.OUTPUT_DIR,
                )
        total = time.time() - t0
        logger.info(
            "Epoch %d: %.1f clips/s overall",
            epoch,
            (cur_iter + 1) * batch_size / total,
        )


def benchmark_jpeg_decode(num_frames=64, size=(360, 640), reps=5):
    """Native batch JPEG decoder vs per-image cv2 (the AVA/SSv2/Charades
    frame path through data.utils.retry_load_images). Prints both rates."""
    import tempfile

    import cv2

    from slowfast_tpu.data.utils import retry_load_images

    rs = np.random.RandomState(0)
    img = cv2.GaussianBlur(
        (rs.rand(*size, 3) * 255).astype(np.uint8), (7, 7), 3
    )
    d = tempfile.mkdtemp()
    paths = []
    for i in range(num_frames):
        p = os.path.join(d, f"f{i:03d}.jpg")
        cv2.imwrite(p, img)
        paths.append(p)

    imgs = retry_load_images(paths)  # warm: builds the native lib
    np.testing.assert_array_equal(np.asarray(imgs[0]), cv2.imread(paths[0]))
    t0 = time.time()
    for _ in range(reps):
        retry_load_images(paths)
    t_native = (time.time() - t0) / reps
    t0 = time.time()
    for _ in range(reps):
        [cv2.imread(p) for p in paths]
    t_cv2 = (time.time() - t0) / reps
    import json

    print(
        json.dumps(
            {
                "_type": "benchmark_jpeg_decode",
                "native_ms": round(t_native * 1000, 1),
                "cv2_ms": round(t_cv2 * 1000, 1),
                "speedup": round(t_cv2 / t_native, 2),
            }
        )
    )


def benchmark_video_decode(n_frames=300, size=(224, 320), reps=10):
    """Native FFmpeg windowed decode vs the cv2 frame-seek fallback on the
    Kinetics-style selective-decode pattern (random 64-frame window from a
    10s clip). Prints both rates + the multi-view single-pass rate."""
    import json
    import tempfile

    import cv2

    from slowfast_tpu.data import decoder
    from slowfast_tpu.native import video as native_video

    rs = np.random.RandomState(0)
    path = os.path.join(tempfile.mkdtemp(), "clip.mp4")
    wr = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), 30.0, size[::-1])
    frame = (rs.rand(*size, 3) * 255).astype(np.uint8)
    for i in range(n_frames):
        frame = np.roll(frame, 5, axis=1)
        wr.write(frame)
    wr.release()

    assert native_video.get_lib() is not None, "native decoder unavailable"
    decode_args = dict(clip_idx=-1, num_clips=1, target_fps=30)

    decoder.decode_native(path, 2, 32, **decode_args)  # warm
    t0 = time.time()
    for _ in range(reps):
        decoder.decode_native(path, 2, 32, **decode_args)
    t_native = (time.time() - t0) / reps

    t0 = time.time()
    for _ in range(reps):
        decoder.decode_native(path, 2, 32, n_views=2, **decode_args)
    t_native_2view = (time.time() - t0) / reps

    import unittest.mock as mock

    with mock.patch.object(decoder, "decode_native", lambda *a, **k: None):
        decoder.decode(path, 2, 32, **decode_args)
        t0 = time.time()
        for _ in range(reps):
            decoder.decode(path, 2, 32, **decode_args)
        t_cv2 = (time.time() - t0) / reps

    print(
        json.dumps(
            {
                "_type": "benchmark_video_decode",
                "native_ms": round(t_native * 1000, 1),
                "native_2view_single_pass_ms": round(t_native_2view * 1000, 1),
                "cv2_ms": round(t_cv2 * 1000, 1),
                "speedup": round(t_cv2 / t_native, 2),
            }
        )
    )


def benchmark_core_budget(target_rates=(182.0, 290.0), n_samples=48):
    """Per-core decode budget: single-worker host cost of one train clip.

    Measures the flagship Kinetics sample path (native FFmpeg selective
    decode at storage scale + full augmentation + uint8 crop emit) with
    ONE worker over a synthetic 340x256 mp4 corpus, then prints the
    host-core counts required to saturate the given device rates
    (clips/s). This is the capacity-planning number for real multi-core
    TPU hosts — the 1-CPU bench host can't saturate a chip, but the
    per-core rate scales linearly until NIC/HBM limits (cores decode
    independent files).
    """
    import json

    from slowfast_tpu.data.synth_media import make_video_corpus

    sys.path.insert(
        0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    from __graft_entry__ import _flagship_cfg

    cfg = _flagship_cfg()
    cfg.TRAIN.DATASET = "kinetics"
    cfg.DATA.PATH_TO_DATA_DIR = make_video_corpus(n_videos=16)
    cfg.DATA_LOADER.NUM_WORKERS = 1

    from slowfast_tpu.data.build import build_dataset

    ds = build_dataset("kinetics", cfg, "train")
    ds[0]  # warm: native lib build + first-file open
    t0 = time.time()
    cpu0 = time.process_time()
    for i in range(n_samples):
        ds[i % len(ds)]
    wall = time.time() - t0
    cpu = time.process_time() - cpu0
    per_core = n_samples / cpu  # CPU-seconds is the per-core budget
    print(
        json.dumps(
            {
                "_type": "benchmark_core_budget",
                "clips_per_core_sec": round(per_core, 2),
                "cpu_ms_per_clip": round(1000 * cpu / n_samples, 1),
                "wall_clips_per_sec_1worker": round(n_samples / wall, 2),
                "cores_needed": {
                    str(r): int(np.ceil(r / per_core)) for r in target_rates
                },
            }
        )
    )


def main():
    if "--jpeg" in sys.argv:
        benchmark_jpeg_decode()
        return
    if "--video-decode" in sys.argv:
        benchmark_video_decode()
        return
    if "--core-budget" in sys.argv:
        benchmark_core_budget()
        return
    args = parse_args()
    for path_to_config in args.cfg_files or [None]:
        cfg = load_config(args, path_to_config)
        cfg = assert_and_infer_cfg(cfg)
        benchmark_data_loading(cfg)


if __name__ == "__main__":
    main()
