"""TensorBoard logging (reference slowfast/visualization/tensorboard_vis.py).

Scalars, confusion matrices (full / subset / per-parent-category),
per-class prediction histograms, video summaries, and weight/activation
visualization. Uses torch.utils.tensorboard (available in the image); all
tensors are converted to numpy/torch on the host.
"""

import json
import os

import numpy as np

from slowfast_tpu.utils import logging as logging_utils

logger = logging_utils.get_logger(__name__)


def _load_classes(path, num_classes):
    """Class-name json: {name: id} or [names] — the shared parser in
    video_visualizer (reference utils.get_class_names)."""
    if not path:
        return None
    try:
        from .video_visualizer import _load_class_names

        return _load_class_names(path, num_classes)
    except Exception as e:
        logger.warning("Failed to load class names %s: %s", path, e)
        return None


def _load_subset(path, class_names):
    """Subset file: one class name per line -> list of ids."""
    if not path or not class_names:
        return None
    try:
        with open(path) as f:
            wanted = [l.strip() for l in f if l.strip()]
    except Exception as e:
        logger.warning("Failed to load class subset %s: %s", path, e)
        return None
    name_to_id = {n: i for i, n in enumerate(class_names)}
    return [name_to_id[n] for n in wanted if n in name_to_id]


class TensorboardWriter:
    def __init__(self, cfg):
        self.cfg = cfg
        if cfg.TENSORBOARD.LOG_DIR == "":
            log_dir = os.path.join(
                cfg.OUTPUT_DIR, "runs-{}".format(cfg.TRAIN.DATASET)
            )
        else:
            log_dir = os.path.join(cfg.OUTPUT_DIR, cfg.TENSORBOARD.LOG_DIR)
        from torch.utils.tensorboard import SummaryWriter

        self.writer = SummaryWriter(log_dir=log_dir)
        # Class names / parent categories / plot subsets
        # (reference tensorboard_vis.py:31-85).
        self.class_names = _load_classes(
            cfg.TENSORBOARD.CLASS_NAMES_PATH, cfg.MODEL.NUM_CLASSES
        )
        self.parent_map = None
        if cfg.TENSORBOARD.CATEGORIES_PATH:
            try:
                with open(cfg.TENSORBOARD.CATEGORIES_PATH) as f:
                    self.parent_map = json.load(f)  # {parent: [class names]}
            except Exception as e:
                logger.warning("Failed to load categories: %s", e)
        self.cm_subset = _load_subset(
            cfg.TENSORBOARD.CONFUSION_MATRIX.SUBSET_PATH, self.class_names
        )
        self.hist_subset = _load_subset(
            cfg.TENSORBOARD.HISTOGRAM.SUBSET_PATH, self.class_names
        )
        logger.info(
            "To see logged results in Tensorboard, please launch using the command "
            "`tensorboard --port=<port-number> --logdir %s`",
            log_dir,
        )

    def add_scalars(self, data_dict, global_step=None):
        for key, item in data_dict.items():
            if isinstance(item, (int, float)):
                self.writer.add_scalar(key, item, global_step)

    def plot_eval(self, preds, labels, global_step=None):
        """Confusion matrices + per-class histograms
        (reference tensorboard_vis.py:97-166)."""
        cfg = self.cfg
        preds = np.asarray(preds)
        labels = np.asarray(labels)
        num_classes = cfg.MODEL.NUM_CLASSES
        cmtx = None
        if cfg.TENSORBOARD.CONFUSION_MATRIX.ENABLE:
            cmtx = get_confusion_matrix(preds, labels, num_classes)
            fig = plot_confusion_matrix(
                cmtx, num_classes, class_names=self.class_names,
                figsize=cfg.TENSORBOARD.CONFUSION_MATRIX.FIGSIZE,
            )
            self.writer.add_figure(
                "Confusion Matrix", fig, global_step=global_step
            )
            if self.cm_subset:
                sub = cmtx[np.ix_(self.cm_subset, self.cm_subset)]
                names = [self.class_names[i] for i in self.cm_subset]
                fig = plot_confusion_matrix(
                    sub, len(self.cm_subset), class_names=names,
                    figsize=cfg.TENSORBOARD.CONFUSION_MATRIX.FIGSIZE,
                )
                self.writer.add_figure(
                    "Confusion Matrix Subset", fig, global_step=global_step
                )
            if self.parent_map and self.class_names:
                name_to_id = {n: i for i, n in enumerate(self.class_names)}
                for parent, children in self.parent_map.items():
                    ids = [name_to_id[c] for c in children if c in name_to_id]
                    if not ids:
                        continue
                    sub = cmtx[np.ix_(ids, ids)]
                    fig = plot_confusion_matrix(
                        sub, len(ids),
                        class_names=[self.class_names[i] for i in ids],
                        figsize=cfg.TENSORBOARD.CONFUSION_MATRIX.FIGSIZE,
                    )
                    self.writer.add_figure(
                        "Confusion Matrices/{}".format(parent), fig,
                        global_step=global_step,
                    )
        if cfg.TENSORBOARD.HISTOGRAM.ENABLE:
            if cmtx is None:
                cmtx = get_confusion_matrix(preds, labels, num_classes)
            ids = self.hist_subset or range(num_classes)
            topk = cfg.TENSORBOARD.HISTOGRAM.TOPK
            for i in ids:
                name = (
                    self.class_names[i] if self.class_names else str(i)
                )
                fig = plot_topk_histogram(
                    name, cmtx[i], topk, self.class_names,
                    figsize=cfg.TENSORBOARD.HISTOGRAM.FIGSIZE,
                )
                self.writer.add_figure(
                    "Hist/{}".format(name), fig, global_step=global_step
                )

    def add_video(self, vid, tag="Video Input", global_step=None, fps=4):
        import torch

        # (B, T, H, W, C) uint8 -> torch (B, T, C, H, W)
        v = torch.from_numpy(np.ascontiguousarray(vid)).permute(0, 1, 4, 2, 3)
        self.writer.add_video(tag, v, global_step=global_step, fps=fps)

    def plot_weights_and_activations(
        self, params=None, activations=None, global_step=None, tag="Model/"
    ):
        """Weight histograms + activation heatmaps
        (reference tensorboard_vis.py:179-222 + add_ndim_array :326-397).

        params: a (possibly nested) dict of numpy/jax arrays (e.g. a flax
        params tree); every leaf gets a histogram. activations: dict of
        named arrays; 2D+ slices are rendered as heatmaps.
        """
        import torch

        for name, leaf in _iter_leaves(params or {}):
            arr = np.asarray(leaf, np.float32)
            self.writer.add_histogram(
                tag + "weights/" + name, torch.from_numpy(arr),
                global_step=global_step,
            )
        for name, act in (activations or {}).items():
            arr = np.asarray(act, np.float32)
            self.add_ndim_array(
                arr, tag + "activations/" + name, global_step=global_step
            )

    def add_ndim_array(self, array, name, global_step=None):
        """Render an N-D array: 1D -> histogram, 2D+ -> heatmap of the
        last-2-dims slice (reference add_ndim_array :326-397)."""
        import torch

        arr = np.asarray(array, np.float32)
        if arr.ndim <= 1:
            self.writer.add_histogram(
                name, torch.from_numpy(arr), global_step=global_step
            )
            return
        while arr.ndim > 2:
            arr = arr[0]
        heatmap = add_heatmap(arr)
        self.writer.add_image(name, heatmap, global_step=global_step)

    def flush(self):
        self.writer.flush()

    def close(self):
        self.writer.flush()
        self.writer.close()


def _iter_leaves(tree, prefix=""):
    if isinstance(tree, dict):
        for k, v in tree.items():
            yield from _iter_leaves(v, prefix + str(k) + "/")
    else:
        yield prefix.rstrip("/"), tree


def get_confusion_matrix(preds, labels, num_classes):
    """(reference visualization/utils.py:16-40)"""
    pred_cls = np.argmax(preds, axis=-1)
    cmtx = np.zeros((num_classes, num_classes), np.int64)
    for t, p in zip(labels.astype(int), pred_cls.astype(int)):
        cmtx[t, p] += 1
    return cmtx


def plot_confusion_matrix(cmtx, num_classes, class_names=None, figsize=None):
    """(reference visualization/utils.py:43-157)"""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    if class_names is None or len(class_names) != num_classes:
        class_names = [str(i) for i in range(num_classes)]
    fig = plt.figure(figsize=figsize)
    plt.imshow(cmtx, interpolation="nearest", cmap=plt.cm.Blues)
    plt.title("Confusion matrix")
    plt.colorbar()
    if num_classes <= 32:
        marks = np.arange(num_classes)
        plt.xticks(marks, class_names, rotation=45, fontsize=6)
        plt.yticks(marks, class_names, fontsize=6)
    plt.ylabel("True label")
    plt.xlabel("Predicted label")
    plt.tight_layout()
    return fig


def plot_topk_histogram(class_name, row, k, class_names=None, figsize=None):
    """Histogram of the top-k predicted classes for one true class
    (reference visualization/utils.py plot_hist + tensorboard_vis :276-324)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    row = np.asarray(row, np.float64)
    k = min(k, len(row))
    top = np.argsort(-row)[:k]
    names = [
        class_names[i] if class_names and i < len(class_names) else str(i)
        for i in top
    ]
    fig = plt.figure(figsize=figsize)
    plt.bar(range(k), row[top])
    plt.xticks(range(k), names, rotation=45, fontsize=6)
    plt.title("Top-{} predictions for: {}".format(k, class_name))
    plt.tight_layout()
    return fig


def add_heatmap(arr2d):
    """2D array -> (3, H, W) float CHW viridis heatmap
    (reference add_heatmap :399-417)."""
    import matplotlib

    matplotlib.use("Agg")
    arr = np.asarray(arr2d, np.float64)
    lo, hi = arr.min(), arr.max()
    arr = (arr - lo) / (hi - lo) if hi > lo else np.zeros_like(arr)
    rgba = matplotlib.colormaps["viridis"](arr)
    return np.transpose(rgba[:, :, :3], (2, 0, 1)).astype(np.float32)
