"""Synthetic media corpus for loader/e2e benchmarks and tests.

Writes a small directory of real .mp4 files (cv2 mp4v, 340x256@30 — the
Kinetics short-side-256 storage shape) plus train/val/test csvs, so the
FULL decode + augmentation path runs without any dataset download. Used
by bench.py's e2e section and tools/benchmark.py's per-core decode
budget (reference tools/benchmark.py benchmarks real data only).
"""

import os
import tempfile

import numpy as np


def make_video_corpus(
    n_videos=32, frames=140, size=(340, 256), fps=30, root=None, seed=0
):
    """Create mp4s + split csvs; returns the corpus directory."""
    import cv2

    d = root or tempfile.mkdtemp(prefix="synth_corpus_")
    os.makedirs(d, exist_ok=True)
    rs = np.random.RandomState(seed)
    w, h = size
    with open(os.path.join(d, "train.csv"), "w") as f:
        for i in range(n_videos):
            path = os.path.join(d, f"v{i:03d}.mp4")
            if not os.path.exists(path):
                wr = cv2.VideoWriter(
                    path, cv2.VideoWriter_fourcc(*"mp4v"), fps, (w, h)
                )
                frame = (rs.rand(h, w, 3) * 255).astype(np.uint8)
                for _ in range(frames):
                    # cheap motion: roll the same frame
                    frame = np.roll(frame, 3, axis=1)
                    wr.write(frame)
                wr.release()
            f.write(f"{path} {i % 10}\n")
    for split in ("val", "test"):
        dst = os.path.join(d, f"{split}.csv")
        if not os.path.exists(dst):
            os.symlink(os.path.join(d, "train.csv"), dst)
    return d
