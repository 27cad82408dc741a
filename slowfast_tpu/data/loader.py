"""Input pipeline: sharded sampling, threaded decode workers, prefetch.

The reference wraps datasets in torch DataLoader with per-GPU worker
processes (slowfast/datasets/loader.py:86-171). The TPU-native pipeline is
host-side: a per-epoch seeded permutation sharded across hosts
(DistributedSampler semantics, reference datasets/utils.py:329-343), a
thread pool decoding/augmenting samples (cv2/numpy release the GIL), and a
bounded prefetch queue of collated global-batch numpy arrays that the
trainer device_puts with the batch sharded over the mesh ``data`` axis.
"""

import queue
import threading
from concurrent.futures import ThreadPoolExecutor

import jax
import numpy as np

from .build import build_dataset

# Import to register datasets.
from . import ava_dataset  # noqa: F401
from . import charades  # noqa: F401
from . import imagenet  # noqa: F401
from . import kinetics  # noqa: F401
from . import ssv2  # noqa: F401


_BOX_BUCKETS = (4, 8, 16, 32)


def _box_bucket(n):
    """Smallest static box-count bucket >= n (powers of two, capped).

    XLA compiles one program per distinct shape; bucketing the per-sample
    box count to a handful of sizes keeps the detection train step at a
    fixed small number of compilations instead of one per box count
    (reference keeps ragged (sum_boxes, 5) tensors, loader.py:48-83 —
    fine on GPU, pathological under jit)."""
    for b in _BOX_BUCKETS:
        if n <= b:
            return b
    return int(-(-n // _BOX_BUCKETS[-1]) * _BOX_BUCKETS[-1])


def detection_collate(samples):
    """Static-shape detection collate: boxes/labels padded per sample to a
    bucketed max with a validity mask.

    Preserves the reference's semantics (loader.py:48-83: every real box is
    one training row) via the mask; ragged host-side arrays (ori_boxes,
    metadata with batch index prepended) are kept for the AVA meter and
    never enter jit.
    """
    inputs = _stack_inputs([s[0] for s in samples])
    labels = [np.atleast_2d(np.asarray(s[1], np.float32)) for s in samples]
    index = np.asarray([s[2] for s in samples], np.int64)
    time_arr = np.stack([np.asarray(s[3]) for s in samples])
    metas = [s[4] for s in samples]

    B = len(samples)
    max_boxes = _box_bucket(max(m["boxes"].shape[0] for m in metas))
    num_classes = labels[0].shape[1]
    boxes = np.zeros((B, max_boxes, 4), np.float32)
    box_mask = np.zeros((B, max_boxes), np.float32)
    padded_labels = np.zeros((B, max_boxes, num_classes), np.float32)
    ori_boxes, metadata = [], []
    for i, meta in enumerate(metas):
        n = meta["boxes"].shape[0]
        boxes[i, :n] = meta["boxes"][:n]
        box_mask[i, :n] = 1.0
        padded_labels[i, :n] = labels[i][:n]
        for j in range(n):
            ori_boxes.append([i] + list(meta["ori_boxes"][j]))
            metadata.append(meta["metadata"][j] if "metadata" in meta else [0, 0])
    extra = {
        "boxes": boxes,
        "box_mask": box_mask,
        "ori_boxes": np.asarray(ori_boxes, np.float32),
        "metadata": np.asarray(metadata, np.float32),
    }
    return inputs, padded_labels, index, time_arr, extra


def _stack_inputs(inputs_list):
    num_pathways = len(inputs_list[0])
    out = []
    for p in range(num_pathways):
        x = np.stack([inp[p] for inp in inputs_list])
        # uint8 passes through untouched (4x smaller host->device transfer;
        # ops/preprocess.device_preprocess normalizes on-chip).
        if x.dtype != np.uint8:
            x = x.astype(np.float32)
        out.append(x)
    return out


def ssl_collate(samples):
    """Multi-view collate: sample[0] is [view1_pathways, view2_pathways, ...].

    Returns a tuple of per-view stacked pathway lists (>=2 views; extra
    views beyond the first two feed SwAV-style multi-crop objectives)."""
    n_views = len(samples[0][0])
    views = tuple(
        _stack_inputs([s[0][v] for s in samples]) for v in range(n_views)
    )
    labels = np.asarray([s[1] for s in samples])
    index = np.asarray([s[2] for s in samples], np.int64)
    time_arr = np.stack([np.asarray(s[3]) for s in samples])
    return views, labels, index, time_arr, {}


def multiple_samples_collate(samples):
    """Flatten repeated-augmentation samples into the batch axis
    (reference loader.py:20-45): each dataset item is a LIST of NUM_SAMPLE
    independently-augmented clips with replicated labels/indices."""
    flat = []
    for f_list, l_list, i_list, t_list, m_list in samples:
        for f, l, i, t, m in zip(f_list, l_list, i_list, t_list, m_list):
            flat.append((f, l, i, t, m))
    return default_collate(flat)


def default_collate(samples):
    inputs = _stack_inputs([s[0] for s in samples])
    labels = np.asarray([s[1] for s in samples])
    if labels.dtype == np.float64:
        labels = labels.astype(np.float32)
    index = np.asarray([s[2] for s in samples], np.int64)
    time_arr = np.stack([np.asarray(s[3]) for s in samples])
    meta = {}
    if samples[0][4] and "mask" in samples[0][4]:
        meta["mask"] = np.stack([s[4]["mask"] for s in samples])
    return inputs, labels, index, time_arr, meta


class ShardedLoader:
    """Iterable over collated global batches for this host's shard."""

    def __init__(self, dataset, batch_size, shuffle, drop_last, cfg, collate=None,
                 short_cycle=False):
        self.dataset = dataset
        self.global_batch = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.cfg = cfg
        self.epoch = 0
        self.num_workers = max(cfg.DATA_LOADER.NUM_WORKERS, 1)
        self.collate = collate or default_collate
        # Multi-host: each host loads 1/num_processes of every global batch.
        self.num_hosts = jax.process_count()
        self.host_id = jax.process_index()
        assert batch_size % self.num_hosts == 0
        self.host_batch = batch_size // self.num_hosts
        # Short-cycle multigrid: cycle batch shapes [B*f0^-2, B*f1^-2, B]
        # (reference datasets/multigrid_helper.py:19-85). Each compiled
        # (B, S) bucket is one jit cache entry.
        self.short_cycle = short_cycle
        if short_cycle:
            bs_factor = [
                int(
                    round(
                        (
                            float(cfg.DATA.TRAIN_CROP_SIZE)
                            / (f * cfg.MULTIGRID.DEFAULT_S)
                        )
                        ** 2
                    )
                )
                for f in cfg.MULTIGRID.SHORT_CYCLE_FACTORS
            ]
            self.cycle_batches = [
                batch_size * bs_factor[0],
                batch_size * bs_factor[1],
                batch_size,
            ]

    def set_epoch(self, epoch):
        """Per-epoch reshuffle (reference loader.shuffle_dataset :174-207)."""
        self.epoch = epoch

    def __len__(self):
        n = len(self.dataset)
        if self.drop_last:
            return n // self.global_batch
        return (n + self.global_batch - 1) // self.global_batch

    def _indices(self):
        n = len(self.dataset)
        if self.shuffle:
            rng = np.random.RandomState(self.cfg.RNG_SEED + self.epoch)
            order = rng.permutation(n)
        else:
            order = np.arange(n)
        if self.short_cycle:
            pos = 0
            cycle = 0
            while True:
                bsz = self.cycle_batches[cycle % 3]
                batch = order[pos : pos + bsz]
                if len(batch) < bsz:
                    return
                local = batch[self.host_id :: self.num_hosts][: bsz // self.num_hosts]
                yield [(int(i), cycle % 3) for i in local]
                pos += bsz
                cycle += 1
        num_batches = len(self)
        for b in range(num_batches):
            batch = order[b * self.global_batch : (b + 1) * self.global_batch]
            if len(batch) < self.global_batch and self.drop_last:
                return
            # This host's slice of the global batch.
            yield batch[self.host_id :: self.num_hosts][: self.host_batch]

    def __iter__(self):
        prefetch = max(self.cfg.TPU.PREFETCH, 1)
        q = queue.Queue(maxsize=prefetch)
        stop = object()

        def produce():
            # Per-sample work queue: samples are submitted to the pool
            # individually across a window of upcoming batches, so decode
            # parallelism is bounded by the worker count, not the batch
            # size, and one slow video stalls only its own batch's collate
            # while workers keep decoding subsequent batches (the
            # DataLoader-worker semantics of reference loader.py:86-171).
            from collections import deque

            window = deque()  # per-batch future lists, oldest first
            ahead = prefetch + 1
            with ThreadPoolExecutor(self.num_workers) as pool:
                try:
                    it = self._indices()
                    exhausted = False
                    while True:
                        while not exhausted and len(window) < ahead:
                            idx_batch = next(it, None)
                            if idx_batch is None:
                                exhausted = True
                                break
                            window.append(
                                [
                                    pool.submit(self.dataset.__getitem__, i)
                                    for i in idx_batch
                                ]
                            )
                        if not window:
                            break
                        samples = [f.result() for f in window.popleft()]
                        q.put(self.collate(samples))
                except Exception as e:  # surface worker errors to consumer
                    q.put(e)
                finally:
                    q.put(stop)

        t = threading.Thread(target=produce, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is stop:
                break
            if isinstance(item, Exception):
                raise item
            yield item


def construct_loader(cfg, split):
    """Build the loader for a split (reference loader.py:86-171)."""
    assert split in ["train", "val", "test"]
    short_cycle = False
    if split == "train":
        dataset_name = cfg.TRAIN.DATASET
        batch_size = cfg.TRAIN.BATCH_SIZE
        shuffle, drop_last = True, True
        short_cycle = cfg.MULTIGRID.SHORT_CYCLE
    elif split == "val":
        dataset_name = cfg.TRAIN.DATASET
        batch_size = cfg.TRAIN.BATCH_SIZE
        shuffle, drop_last = False, False
    else:
        dataset_name = cfg.TEST.DATASET
        batch_size = cfg.TEST.BATCH_SIZE
        shuffle, drop_last = False, False

    dataset = build_dataset(dataset_name, cfg, split)
    if cfg.DETECTION.ENABLE:
        collate = detection_collate
    elif cfg.MODEL.MODEL_NAME == "ContrastiveModel" and split == "train":
        collate = ssl_collate
    elif (
        split == "train"
        and cfg.AUG.ENABLE
        and cfg.AUG.NUM_SAMPLE > 1
    ):
        collate = multiple_samples_collate
    else:
        collate = default_collate
    return ShardedLoader(
        dataset, batch_size, shuffle, drop_last, cfg, collate,
        short_cycle=short_cycle,
    )


def shuffle_dataset(loader, cur_epoch):
    loader.set_epoch(cur_epoch)
