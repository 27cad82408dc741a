"""Frame annotation: top-k / thresholded label drawing, box overlay.

Reference: slowfast/visualization/video_visualizer.py:43-669 (which draws
through detectron2's Visualizer). Implemented directly on cv2 primitives.
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

    def _pred_labels(self, preds):
        preds = np.asarray(preds).reshape(-1)
        if self.mode == "top-k":
            idx = np.argsort(-preds)[: self.top_k]
            return [(self.class_names[i], float(preds[i])) for i in idx]
        out = []
        for i, p in enumerate(preds):
            name = self.class_names[i]
            t = self.lower_thres if name in self.common_class_names else self.thres
            if p >= t:
                out.append((name, float(p)))
        return out

    def draw_clip_range(self, frames, preds, bboxes=None, text_alpha=0.7):
        """Annotate a list of HWC uint8 frames with prediction labels
        (keyframe-centered annotation, reference :347+)."""
        import cv2

        labels = self._pred_labels(preds)
        text = ", ".join(f"{n}: {s:.2f}" for n, s in labels)
        out = []
        for frame in frames:
            img = np.ascontiguousarray(frame)
            if bboxes is not None:
                for box in np.asarray(bboxes).reshape(-1, 4):
                    x1, y1, x2, y2 = [int(v) for v in box]
                    cv2.rectangle(img, (x1, y1), (x2, y2), (0, 255, 0), 2)
            cv2.putText(
                img, text, (10, 25), cv2.FONT_HERSHEY_SIMPLEX, 0.7,
                (255, 255, 255), 2,
            )
            out.append(img)
        return out
