"""Training/validation/test meters (reference slowfast/utils/meters.py).

Host-side bookkeeping: windowed scalar stats, per-iteration json logging,
epoch summaries, multi-view test-time prediction ensembling, and the
loss-explosion guard. Device work stays in the jitted step; meters consume
already-reduced host scalars.
"""

import datetime
import time
from collections import defaultdict, deque

import numpy as np

from . import logging as logging_utils
from .logging import log_json_stats

logger = logging_utils.get_logger(__name__)


def gather_ragged_across_hosts(x):
    """Gather per-host ragged row blocks onto every host.

    The TPU-native form of the reference's all_gather_unaligned
    (slowfast/utils/distributed.py:21-66): each host contributes a
    different number of rows (AVA predictions/boxes), so lengths are
    allgathered first, blocks padded to the max, gathered, and unpadded.
    No-op on a single host.
    """
    import jax

    if jax.process_count() == 1:
        return x
    from jax.experimental import multihost_utils as mhu

    x = np.asarray(x)
    counts = np.asarray(
        mhu.process_allgather(np.asarray([x.shape[0]], np.int32))
    ).reshape(-1)
    m = int(counts.max())
    pad = np.zeros((m - x.shape[0],) + x.shape[1:], x.dtype)
    gathered = np.asarray(mhu.process_allgather(np.concatenate([x, pad], 0)))
    return np.concatenate(
        [gathered[i, : counts[i]] for i in range(len(counts))], axis=0
    )


def gpu_mem_usage():
    """Device memory in GB (best effort)."""
    try:
        import jax

        stats = jax.local_devices()[0].memory_stats()
        return stats.get("bytes_in_use", 0) / 1024 ** 3
    except Exception:
        return 0.0


class Timer:
    def __init__(self):
        self.reset()

    def reset(self):
        self._start = time.time()
        self._paused_at = None
        self._total_paused = 0.0

    def pause(self):
        if self._paused_at is None:
            self._paused_at = time.time()

    def resume(self):
        if self._paused_at is not None:
            self._total_paused += time.time() - self._paused_at
            self._paused_at = None

    def seconds(self):
        end = self._paused_at if self._paused_at is not None else time.time()
        return end - self._start - self._total_paused


class ScalarMeter:
    """Windowed scalar tracker (reference meters.py:409-462)."""

    def __init__(self, window_size):
        self.deque = deque(maxlen=window_size)
        self.total = 0.0
        self.count = 0

    def reset(self):
        self.deque.clear()
        self.total = 0.0
        self.count = 0

    def add_value(self, value):
        self.deque.append(value)
        self.count += 1
        self.total += value

    def get_win_median(self):
        return float(np.median(self.deque)) if self.deque else 0.0

    def get_win_avg(self):
        return float(np.mean(self.deque)) if self.deque else 0.0

    def get_global_avg(self):
        return self.total / max(self.count, 1)


class TrainMeter:
    """Per-iteration/epoch training stats (reference meters.py:499-678)."""

    def __init__(self, epoch_iters, cfg):
        self._cfg = cfg
        self.epoch_iters = epoch_iters
        self.MAX_EPOCH = cfg.SOLVER.MAX_EPOCH * epoch_iters
        self.iter_timer = Timer()
        self.data_timer = Timer()
        self.net_timer = Timer()
        self.loss = ScalarMeter(cfg.LOG_PERIOD)
        self.loss_total = 0.0
        self.lr = None
        self.mb_top1_err = ScalarMeter(cfg.LOG_PERIOD)
        self.mb_top5_err = ScalarMeter(cfg.LOG_PERIOD)
        self.num_top1_mis = 0
        self.num_top5_mis = 0
        self.num_samples = 0
        self.output_dir = cfg.OUTPUT_DIR
        self.multi_loss = None

    def reset(self):
        self.loss.reset()
        self.loss_total = 0.0
        self.lr = None
        self.mb_top1_err.reset()
        self.mb_top5_err.reset()
        self.num_top1_mis = 0
        self.num_top5_mis = 0
        self.num_samples = 0

    def iter_tic(self):
        self.iter_timer.reset()
        self.data_timer.reset()

    def iter_toc(self):
        self.iter_timer.pause()
        self.net_timer.pause()

    def data_toc(self):
        self.data_timer.pause()
        self.net_timer.reset()

    def update_stats(self, top1_err, top5_err, loss, lr, mb_size):
        self.loss.add_value(loss)
        self.lr = lr
        self.loss_total += loss * mb_size
        self.num_samples += mb_size
        if top1_err is not None:
            self.mb_top1_err.add_value(top1_err)
            self.mb_top5_err.add_value(top5_err)
            self.num_top1_mis += top1_err * mb_size
            self.num_top5_mis += top5_err * mb_size
        # Loss-explosion guard (reference meters.py:594-606).
        kill = self._cfg.TRAIN.KILL_LOSS_EXPLOSION_FACTOR
        if kill > 0.0 and len(self.loss.deque) > 5:
            prev = list(self.loss.deque)[-6:-1]
            if loss > kill * float(np.mean(prev)):
                raise RuntimeError(
                    f"ERROR: Got Loss explosion of {loss} {datetime.datetime.now()}"
                )

    def log_iter_stats(self, cur_epoch, cur_iter):
        if (cur_iter + 1) % self._cfg.LOG_PERIOD != 0:
            return
        eta_sec = self.iter_timer.seconds() * (
            self.MAX_EPOCH - (cur_epoch * self.epoch_iters + cur_iter + 1)
        )
        stats = {
            "_type": "train_iter",
            "epoch": f"{cur_epoch + 1}/{self._cfg.SOLVER.MAX_EPOCH}",
            "iter": f"{cur_iter + 1}/{self.epoch_iters}",
            "dt": self.iter_timer.seconds(),
            "dt_data": self.data_timer.seconds(),
            "dt_net": self.net_timer.seconds(),
            "eta": str(datetime.timedelta(seconds=int(eta_sec))),
            "loss": self.loss.get_win_median(),
            "lr": self.lr,
            "gpu_mem": f"{gpu_mem_usage():.2f}G",
        }
        if self.mb_top1_err.count > 0:
            stats["top1_err"] = self.mb_top1_err.get_win_median()
            stats["top5_err"] = self.mb_top5_err.get_win_median()
        log_json_stats(stats, self.output_dir)

    def log_epoch_stats(self, cur_epoch):
        stats = {
            "_type": "train_epoch",
            "epoch": f"{cur_epoch + 1}/{self._cfg.SOLVER.MAX_EPOCH}",
            "dt": self.iter_timer.seconds(),
            "loss": self.loss_total / max(self.num_samples, 1),
            "lr": self.lr,
            "gpu_mem": f"{gpu_mem_usage():.2f}G",
        }
        if self.num_samples > 0 and self.num_top1_mis > 0:
            stats["top1_err"] = self.num_top1_mis / self.num_samples
            stats["top5_err"] = self.num_top5_mis / self.num_samples
        log_json_stats(stats, self.output_dir)


class ValMeter:
    """Validation stats + min-error tracking (reference meters.py:679-822)."""

    def __init__(self, max_iter, cfg):
        self._cfg = cfg
        self.max_iter = max_iter
        self.iter_timer = Timer()
        self.mb_top1_err = ScalarMeter(cfg.LOG_PERIOD)
        self.mb_top5_err = ScalarMeter(cfg.LOG_PERIOD)
        self.min_top1_err = 100.0
        self.min_top5_err = 100.0
        self.num_top1_mis = 0
        self.num_top5_mis = 0
        self.num_samples = 0
        self.all_preds = []
        self.all_labels = []
        self.output_dir = cfg.OUTPUT_DIR

    def reset(self):
        self.iter_timer.reset()
        self.mb_top1_err.reset()
        self.mb_top5_err.reset()
        self.num_top1_mis = 0
        self.num_top5_mis = 0
        self.num_samples = 0
        self.all_preds = []
        self.all_labels = []

    def iter_tic(self):
        self.iter_timer.reset()

    def iter_toc(self):
        self.iter_timer.pause()

    def update_stats(self, top1_err, top5_err, mb_size):
        self.mb_top1_err.add_value(top1_err)
        self.mb_top5_err.add_value(top5_err)
        self.num_top1_mis += top1_err * mb_size
        self.num_top5_mis += top5_err * mb_size
        self.num_samples += mb_size

    def update_predictions(self, preds, labels):
        self.all_preds.append(preds)
        self.all_labels.append(labels)

    def log_iter_stats(self, cur_epoch, cur_iter):
        if (cur_iter + 1) % self._cfg.LOG_PERIOD != 0:
            return
        stats = {
            "_type": "val_iter",
            "epoch": f"{cur_epoch + 1}/{self._cfg.SOLVER.MAX_EPOCH}",
            "iter": f"{cur_iter + 1}/{self.max_iter}",
            "time_diff": self.iter_timer.seconds(),
            "top1_err": self.mb_top1_err.get_win_median(),
            "top5_err": self.mb_top5_err.get_win_median(),
        }
        log_json_stats(stats, self.output_dir)

    def log_epoch_stats(self, cur_epoch):
        stats = {
            "_type": "val_epoch",
            "epoch": f"{cur_epoch + 1}/{self._cfg.SOLVER.MAX_EPOCH}",
            "time_diff": self.iter_timer.seconds(),
            "gpu_mem": f"{gpu_mem_usage():.2f}G",
        }
        if self._cfg.DATA.MULTI_LABEL:
            stats["map"] = get_map(
                np.concatenate(self.all_preds), np.concatenate(self.all_labels)
            )
        else:
            top1_err = self.num_top1_mis / max(self.num_samples, 1)
            top5_err = self.num_top5_mis / max(self.num_samples, 1)
            self.min_top1_err = min(self.min_top1_err, top1_err)
            self.min_top5_err = min(self.min_top5_err, top5_err)
            stats["top1_err"] = top1_err
            stats["top5_err"] = top5_err
            stats["min_top1_err"] = self.min_top1_err
            stats["min_top5_err"] = self.min_top5_err
        log_json_stats(stats, self.output_dir)
        return stats


class TestMeter:
    """Multi-view test-time ensembling (reference meters.py:239-407).

    Accumulates per-clip predictions into per-video scores keyed by
    clip_id // num_clips, with sum or max ensembling, then finalizes
    top-1/top-5 (or mAP for multi-label).
    """

    def __init__(
        self,
        num_videos,
        num_clips,
        num_cls,
        overall_iters,
        multi_label=False,
        ensemble_method="sum",
        output_dir=None,
    ):
        assert ensemble_method in ("sum", "max")
        self.iter_timer = Timer()
        self.num_clips = num_clips
        self.overall_iters = overall_iters
        self.multi_label = multi_label
        self.ensemble_method = ensemble_method
        self.video_preds = np.zeros((num_videos, num_cls), np.float64)
        if multi_label:
            self.video_preds -= 1e10
        self.video_labels = np.zeros(
            (num_videos, num_cls) if multi_label else (num_videos,), np.int64
        )
        self.clip_count = np.zeros((num_videos,), np.int64)
        self.topk_accs = []
        self.stats = {}
        self.output_dir = output_dir

    def reset(self):
        self.clip_count[:] = 0
        self.video_preds[:] = 0.0
        if self.multi_label:
            self.video_preds -= 1e10
        self.video_labels[:] = 0

    def update_stats(self, preds, labels, clip_ids):
        preds = np.asarray(preds)
        labels = np.asarray(labels)
        clip_ids = np.asarray(clip_ids)
        for ind in range(preds.shape[0]):
            vid_id = int(clip_ids[ind]) // self.num_clips
            if self.video_labels[vid_id].sum() > 0:
                assert np.array_equal(
                    self.video_labels[vid_id], labels[ind]
                ) or np.array_equal(self.video_labels[vid_id], labels[ind]), (
                    "Label consistency check failed"
                )
            self.video_labels[vid_id] = labels[ind]
            if self.ensemble_method == "sum":
                self.video_preds[vid_id] += preds[ind]
            else:
                self.video_preds[vid_id] = np.maximum(
                    self.video_preds[vid_id], preds[ind]
                )
            self.clip_count[vid_id] += 1

    def iter_tic(self):
        self.iter_timer.reset()

    def iter_toc(self):
        self.iter_timer.pause()

    def log_iter_stats(self, cur_iter):
        stats = {
            "_type": "test_iter",
            "cur_iter": f"{cur_iter + 1}",
            "time_diff": self.iter_timer.seconds(),
        }
        log_json_stats(stats, self.output_dir)

    def finalize_metrics(self, ks=(1, 5)):
        if not np.all(self.clip_count == self.num_clips):
            mismatch = np.argwhere(self.clip_count != self.num_clips).flatten()
            logger.warning(
                "clip count %s ~= num clips %s",
                ", ".join(f"{i}: {self.clip_count[i]}" for i in mismatch[:10]),
                self.num_clips,
            )
        self.stats = {"_type": "test_final"}
        if self.multi_label:
            self.stats["map"] = get_map(self.video_preds, self.video_labels)
        else:
            num_topks_correct = _topks_correct_np(
                self.video_preds, self.video_labels, ks
            )
            topks = [x / self.video_preds.shape[0] * 100.0 for x in num_topks_correct]
            for k, topk in zip(ks, topks):
                self.stats[f"top{k}_acc"] = f"{topk:.2f}"
        log_json_stats(self.stats, self.output_dir)
        return self.stats


def _topks_correct_np(preds, labels, ks):
    top_max_k = max(ks)
    idx = np.argsort(-preds, axis=1)[:, :top_max_k]
    correct = idx == labels[:, None]
    return [correct[:, :k].sum() for k in ks]


def get_map(preds, labels):
    """Multi-label mAP via sklearn (reference meters.py:823-849)."""
    from sklearn.metrics import average_precision_score

    logger.info("Getting mAP for %d examples", preds.shape[0])
    preds = preds[:, ~(np.all(labels == 0, axis=0))]
    labels = labels[:, ~(np.all(labels == 0, axis=0))]
    try:
        aps = average_precision_score(labels, preds, average=None)
    except ValueError:
        logger.exception(
            "Average precision requires a sufficient number of samples; returning -1"
        )
        return -1.0
    return float(np.mean(aps))


class EpochTimer:
    """Epoch duration tracking (reference meters.py:850+)."""

    def __init__(self):
        self.timer = Timer()
        self.epoch_times = []

    def reset(self):
        self.timer.reset()
        self.epoch_times = []

    def epoch_tic(self):
        self.timer.reset()

    def epoch_toc(self):
        self.timer.pause()
        self.epoch_times.append(self.timer.seconds())

    def last_epoch_time(self):
        return self.epoch_times[-1]

    def avg_epoch_time(self):
        return float(np.mean(self.epoch_times))

    def median_epoch_time(self):
        return float(np.median(self.epoch_times))


class AVAMeter:
    """Detection meter collecting all preds/boxes/metadata for AVA mAP
    (reference meters.py:46-238)."""

    def __init__(self, overall_iters, cfg, mode):
        self.cfg = cfg
        self.lr = None
        self.loss = ScalarMeter(cfg.LOG_PERIOD)
        self.mode = mode
        self.iter_timer = Timer()
        self.all_preds = []
        self.all_ori_boxes = []
        self.all_metadata = []
        self.overall_iters = overall_iters
        self.excluded_keys = None
        self.categories = None
        self.class_whitelist = None
        self.video_idx_to_name = None
        self.groundtruth = None
        self.full_map = 0.0
        self.output_dir = cfg.OUTPUT_DIR
        self._load_eval_assets()

    def _load_eval_assets(self):
        import os

        from . import ava_eval

        cfg = self.cfg
        if self.mode == "train":
            return
        label_map = os.path.join(cfg.AVA.ANNOTATION_DIR, cfg.AVA.LABEL_MAP_FILE)
        exclusions = os.path.join(cfg.AVA.ANNOTATION_DIR, cfg.AVA.EXCLUSION_FILE)
        gt_file = os.path.join(cfg.AVA.ANNOTATION_DIR, cfg.AVA.GROUNDTRUTH_FILE)
        if not os.path.exists(label_map):
            return
        self.categories, self.class_whitelist = ava_eval.read_label_map(label_map)
        self.excluded_keys = ava_eval.read_exclusions(
            exclusions if os.path.exists(exclusions) else None
        ) if os.path.exists(exclusions) else set()
        if os.path.exists(gt_file):
            full = ava_eval.read_csv(gt_file, self.class_whitelist)
            # Val-during-training scores against the sec%4==0 mini GT
            # (reference meters.py:28-43, ava_eval_helper.py:133-165);
            # final test (and FULL_TEST_ON_VAL) uses the full GT.
            if self.mode == "test" or (
                self.mode == "val" and cfg.AVA.FULL_TEST_ON_VAL
            ):
                self.groundtruth = full
            else:
                self.groundtruth = ava_eval.get_ava_mini_groundtruth(full)

    def set_video_idx_to_name(self, names):
        self.video_idx_to_name = names

    def iter_tic(self):
        self.iter_timer.reset()

    def iter_toc(self):
        self.iter_timer.pause()

    def data_toc(self):
        # Timer-triplet parity with TrainMeter: the train driver calls
        # data_toc after batch staging; AVAMeter tracks only iter time.
        pass

    def reset(self):
        self.loss.reset()
        self.all_preds = []
        self.all_ori_boxes = []
        self.all_metadata = []

    def update_stats(self, preds, ori_boxes, metadata, loss=None, lr=None):
        if self.mode in ("val", "test"):
            self.all_preds.append(np.asarray(preds))
            self.all_ori_boxes.append(np.asarray(ori_boxes))
            self.all_metadata.append(np.asarray(metadata))
        if loss is not None:
            self.loss.add_value(loss)
        if lr is not None:
            self.lr = lr

    def log_iter_stats(self, cur_epoch, cur_iter):
        if (cur_iter + 1) % self.cfg.LOG_PERIOD != 0:
            return
        stats = {
            "_type": f"{self.mode}_iter",
            "cur_epoch": (cur_epoch + 1) if cur_epoch is not None else None,
            "cur_iter": cur_iter + 1,
            "time_diff": self.iter_timer.seconds(),
            "mode": self.mode,
        }
        if self.mode == "train":
            stats["loss"] = self.loss.get_win_median()
            stats["lr"] = self.lr
        log_json_stats(stats, self.output_dir)

    def finalize_metrics(self, log=True):
        from . import ava_eval

        # Multi-host eval: every host evaluated a disjoint shard of the
        # videos; gather everyone's (ragged) predictions before scoring.
        all_preds = gather_ragged_across_hosts(
            np.concatenate(self.all_preds, axis=0)
        )
        all_boxes = gather_ragged_across_hosts(
            np.concatenate(self.all_ori_boxes, axis=0)
        )
        all_meta = gather_ragged_across_hosts(
            np.concatenate(self.all_metadata, axis=0)
        )
        if self.groundtruth is None:
            # No AVA annotation assets (synthetic/integration runs):
            # predictions were collected but there is nothing to score.
            logger.info(
                "AVA groundtruth unavailable; skipping mAP (collected %d boxes)",
                all_preds.shape[0],
            )
            self.full_map = 0.0
            return self.full_map
        self.full_map = ava_eval.evaluate_ava(
            all_preds,
            all_boxes,
            all_meta,
            self.excluded_keys or set(),
            self.class_whitelist or set(range(1, all_preds.shape[1] + 1)),
            self.categories or [],
            groundtruth=self.groundtruth,
            video_idx_to_name=self.video_idx_to_name,
        )
        if log:
            log_json_stats({"mode": self.mode, "map": self.full_map}, self.output_dir)
        return self.full_map

    def log_epoch_stats(self, cur_epoch):
        if self.mode in ("val", "test"):
            self.finalize_metrics(log=False)
            stats = {
                "_type": f"{self.mode}_epoch",
                "cur_epoch": cur_epoch + 1,
                "mode": self.mode,
                "map": self.full_map,
            }
            log_json_stats(stats, self.output_dir)
            return stats
        # Train-mode epoch summary (reference meters.py train branch).
        stats = {
            "_type": "train_epoch",
            "cur_epoch": cur_epoch + 1,
            "mode": self.mode,
            "loss": self.loss.get_win_median() if self.loss.deque else None,
            "lr": self.lr,
        }
        log_json_stats(stats, self.output_dir)
        return stats
