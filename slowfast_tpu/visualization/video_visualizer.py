"""Frame annotation: top-k / thresholded label drawing, box overlay.

Reference: slowfast/visualization/video_visualizer.py:43-669 (which draws
through detectron2's Visualizer). Implemented directly on cv2 primitives:
per-class colormap colors, per-box prediction labels with filled text
backgrounds, ground-truth boxes, and keyframe-centered annotation ranges.
"""

import numpy as np

from slowfast_tpu.utils import logging as logging_utils

logger = logging_utils.get_logger(__name__)


def _load_class_names(path, num_classes):
    if path:
        import json

        with open(path) as f:
            mapping = json.load(f)
        # json may be {name: id} or [names]
        if isinstance(mapping, dict):
            names = [None] * num_classes
            for name, idx in mapping.items():
                if int(idx) < num_classes:
                    names[int(idx)] = name
            return [n or str(i) for i, n in enumerate(names)]
        return list(mapping)
    return [str(i) for i in range(num_classes)]


class VideoVisualizer:
    def __init__(
        self,
        num_classes,
        class_names_path="",
        top_k=1,
        colormap="rainbow",
        thres=0.7,
        lower_thres=0.3,
        common_class_names=None,
        mode="top-k",
    ):
        assert mode in ("top-k", "thres")
        self.num_classes = num_classes
        self.class_names = _load_class_names(class_names_path, num_classes)
        self.top_k = top_k
        self.thres = thres
        self.lower_thres = lower_thres
        self.common_class_names = set(common_class_names or [])
        self.mode = mode
        # Deterministic per-class colors from a matplotlib colormap
        # (reference _get_color :392-399: color_map(id / num_classes)).
        try:
            import matplotlib

            matplotlib.use("Agg")
            cmap = matplotlib.colormaps[colormap]
            self._colors = [
                tuple(int(c * 255) for c in cmap(i / max(num_classes, 1))[:3])
                for i in range(num_classes)
            ]
        except Exception:
            rs = np.random.RandomState(0)
            self._colors = [
                tuple(int(v) for v in rs.randint(64, 255, 3))
                for _ in range(num_classes)
            ]

    def _get_color(self, class_id):
        return self._colors[int(class_id) % len(self._colors)]

    def _pred_labels(self, preds):
        """[(class_id, name, score)] under top-k or thres mode
        (reference draw_one_frame :419-470)."""
        preds = np.asarray(preds).reshape(-1)
        if self.mode == "top-k":
            idx = np.argsort(-preds)[: self.top_k]
            return [
                (int(i), self.class_names[i], float(preds[i])) for i in idx
            ]
        out = []
        for i, p in enumerate(preds):
            name = self.class_names[i]
            t = (
                self.lower_thres
                if name in self.common_class_names
                else self.thres
            )
            if p >= t:
                out.append((int(i), name, float(p)))
        return out

    def _draw_text(self, img, text, org, color, alpha=0.7, font_scale=0.5):
        """Text with a filled background box (ImgVisualizer.draw_text
        semantics, reference :59-106)."""
        import cv2

        (tw, th), baseline = cv2.getTextSize(
            text, cv2.FONT_HERSHEY_SIMPLEX, font_scale, 1
        )
        x, y = int(org[0]), int(org[1])
        x = max(0, min(x, img.shape[1] - tw - 2))
        y = max(th + 2, min(y, img.shape[0] - 2))
        overlay = img.copy()
        cv2.rectangle(
            overlay, (x, y - th - baseline), (x + tw + 2, y + 2), color, -1
        )
        cv2.addWeighted(overlay, alpha, img, 1 - alpha, 0, dst=img)
        cv2.putText(
            img, text, (x + 1, y - baseline // 2),
            cv2.FONT_HERSHEY_SIMPLEX, font_scale, (0, 0, 0), 1,
            cv2.LINE_AA,
        )

    def draw_one_frame(
        self, frame, preds, bboxes=None, alpha=0.7, text_alpha=0.7,
        ground_truth=False,
    ):
        """Annotate one HWC uint8 frame (reference draw_one_frame :400-507).

        preds: (num_classes,) for clip-level, or (N, num_classes) matching
        N boxes for detection. ground_truth draws label text prefixed
        "[GT]" with a fixed color.
        """
        import cv2

        img = np.ascontiguousarray(frame)
        if bboxes is not None and len(np.asarray(bboxes).reshape(-1)) > 0:
            boxes = np.asarray(bboxes).reshape(-1, 4)
            preds_arr = np.asarray(preds)
            per_box = preds_arr.ndim == 2 and preds_arr.shape[0] == len(boxes)
            for bi, box in enumerate(boxes):
                x1, y1, x2, y2 = [int(v) for v in box]
                labels = self._pred_labels(
                    preds_arr[bi] if per_box else preds_arr
                )
                box_color = (
                    (80, 255, 80)
                    if ground_truth
                    else self._get_color(labels[0][0] if labels else 0)
                )
                cv2.rectangle(img, (x1, y1), (x2, y2), box_color, 2)
                # Stack labels downward from the box top-left corner
                # (reference draw_multiple_text :107-181).
                for li, (cid, name, score) in enumerate(labels):
                    prefix = "[GT] " if ground_truth else ""
                    self._draw_text(
                        img, f"{prefix}{name}: {score:.2f}",
                        (x1, y1 + 16 * (li + 1)),
                        self._get_color(cid), alpha=text_alpha,
                    )
        else:
            labels = self._pred_labels(preds)
            for li, (cid, name, score) in enumerate(labels):
                self._draw_text(
                    img, f"{name}: {score:.2f}", (10, 25 + 18 * li),
                    self._get_color(cid), alpha=text_alpha,
                )
        return img

    def draw_clip_range(
        self, frames, preds, bboxes=None, text_alpha=0.7, keyframe_idx=None,
        draw_range=None, repeat_frame=1,
    ):
        """Annotate frames in [draw_range] (keyframe-centered when given),
        leaving the rest untouched (reference draw_clip_range :508-561)."""
        frames = list(frames)
        n = len(frames)
        if draw_range is None:
            if keyframe_idx is not None:
                half = max(n // 4, 1)
                draw_range = (
                    max(keyframe_idx - half, 0),
                    min(keyframe_idx + half, n - 1),
                )
            else:
                draw_range = (0, n - 1)
        lo, hi = int(draw_range[0]), int(draw_range[1])
        out = []
        for i, frame in enumerate(frames):
            if lo <= i <= hi:
                out.append(
                    self.draw_one_frame(
                        frame, preds, bboxes=bboxes, text_alpha=text_alpha
                    )
                )
            else:
                out.append(np.ascontiguousarray(frame))
        if repeat_frame > 1:
            out = [f for f in out for _ in range(repeat_frame)]
        return out
