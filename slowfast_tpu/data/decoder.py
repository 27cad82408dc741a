"""Video decoding and temporal sampling.

Reference: slowfast/datasets/decoder.py:17-616. Two decode backends:

- native (default): the first-party C++/FFmpeg decode service
  (``native/video_decode.cc``) with exact PTS-window seek (keyframe seek +
  decode-forward + drop, the reference's PyAV semantics at
  decoder.py:186-225), in-memory bytes decode, and multi-clip single-pass
  sweep (decoder.py:228-370).
- cv2 fallback: frame-position seek (codec-dependent accuracy) used when
  FFmpeg dev libraries are unavailable.

The temporal-sampling math (clip placement, linspace frame selection,
TARGET_FPS normalization) reproduces the reference exactly.
"""

import math
import random

import numpy as np

from slowfast_tpu.utils import logging as logging_utils

logger = logging_utils.get_logger(__name__)

# First native-decode failure is logged once per process (the path retries
# via cv2, so repeated per-clip warnings would flood the log).
_native_error_logged = False


def temporal_sampling(frames, start_idx, end_idx, num_samples):
    """Evenly sample num_samples frame indices in [start, end] and gather.

    Reference decoder.py:17-34 (torch.linspace + index_select semantics).
    frames: (T, H, W, C) ndarray.
    """
    index = np.linspace(start_idx, end_idx, num_samples)
    index = np.clip(index, 0, frames.shape[0] - 1).astype(np.int64)
    return frames[index]


def get_start_end_idx(video_size, clip_size, clip_idx, num_clips, use_offset=False):
    """Clip placement (reference decoder.py:37-76).

    clip_idx == -1: uniform-random start; else the clip_idx-th of num_clips
    uniformly spaced clips (with the use_offset centering variant).
    """
    delta = max(video_size - clip_size, 0)
    if clip_idx == -1:
        start_idx = random.uniform(0, delta)
    else:
        if use_offset:
            if num_clips == 1:
                start_idx = math.floor(delta / 2)
            else:
                start_idx = clip_idx * math.floor(delta / max(num_clips - 1, 1))
        else:
            start_idx = delta * clip_idx / num_clips
    end_idx = start_idx + clip_size - 1
    return start_idx, end_idx, start_idx / delta if delta != 0 else 0.0


def get_multiple_start_end_idx(
    video_size, clip_sizes, clip_idx, num_clips, min_delta=0, max_delta=math.inf
):
    """Sample start/ends for multiple clips with pairwise delta constraints
    (reference decoder.py:79-183, simplified retry-sampling)."""
    se_inds = np.empty((0, 2))
    dt = np.empty((0,))
    for retry in range(100):
        se_inds = []
        for i, clip_size in enumerate(clip_sizes):
            s, e, _ = get_start_end_idx(video_size, clip_size, clip_idx, num_clips)
            se_inds.append([s, e])
        se_inds = np.array(se_inds)
        if len(clip_sizes) == 1:
            return se_inds
        order = np.argsort(se_inds[:, 0])
        dt = se_inds[order][1:, 0] - se_inds[order][:-1, 1]
        if ((dt >= min_delta) & (dt <= max_delta)).all():
            break
    return se_inds


def get_video_fps_and_frames(path):
    """Probe a video with cv2 (container open, reference video_container.py)."""
    import cv2

    cap = cv2.VideoCapture(path)
    if not cap.isOpened():
        return None, 0, 0
    fps = cap.get(cv2.CAP_PROP_FPS) or 30.0
    n = int(cap.get(cv2.CAP_PROP_FRAME_COUNT))
    return cap, fps, n


def _sample_positions(frame_idx, start_idx, end_idx, num_frames):
    """Positions of linspace-sampled frames within a decoded window.

    frame_idx: (N,) stream indices of the kept frames. Maps each linspace
    target (in the stream frame-index domain) to the nearest kept frame
    at-or-after it, reproducing the reference's relative-index sampling
    (decoder.py:17-34) while tolerating dropped frames.
    """
    targets = np.linspace(start_idx, end_idx, num_frames)
    targets = np.clip(targets, frame_idx[0], frame_idx[-1])
    pos = np.searchsorted(frame_idx, np.floor(targets).astype(np.int64))
    return np.clip(pos, 0, len(frame_idx) - 1)


def decode_native(
    source,
    sampling_rate,
    num_frames,
    clip_idx=-1,
    num_clips=10,
    target_fps=30,
    max_spatial_scale=0,
    use_offset=False,
    n_views=1,
    min_delta=-math.inf,
    max_delta=math.inf,
    crop_size=0,
    crop_fx=0.5,
    crop_fy=0.5,
):
    """Exact PTS-window decode via the native FFmpeg service.

    source may be a filesystem path or in-memory video bytes. n_views > 1
    samples that many independent random temporal windows (SSL multi-view)
    and decodes them all in ONE packet sweep — the reference's multi-clip
    single-pass decode (decoder.py:228-370).

    Returns (list-of-(T,H,W,C)-uint8 if n_views>1 else single array, fps,
    decode_all_video, time_frac) or None; time_frac is the clip's
    normalized [0, 1] start position (list per view when n_views > 1) —
    the reference's returned time index (decoder.py:452-616), consumed by
    the time-indexed SSL memory bank (contrastive.py:362-372).
    """
    from slowfast_tpu.native import video as native_video

    probed = native_video.probe(source)
    if probed is None:
        return None
    fps, total, _, _ = probed
    if total <= 0:
        return None

    clip_size = sampling_rate * num_frames / target_fps * fps
    windows = []
    fracs = []
    if n_views > 1 and clip_idx == -1 and (
        min_delta > -math.inf or max_delta < math.inf
    ):
        # Pairwise temporal-gap constraints between SSL views
        # (CONTRASTIVE.DELTA_CLIPS_MIN/MAX; reference kinetics.py:337 ->
        # get_multiple_start_end_idx retry sampling).
        se = get_multiple_start_end_idx(
            total, [clip_size] * n_views, clip_idx, num_clips,
            min_delta=min_delta, max_delta=max_delta,
        )
        span = max(total - clip_size, 0)
        for s, e in se:
            windows.append((s, e))
            fracs.append(s / span if span != 0 else 0.0)
    else:
        for _ in range(max(n_views, 1)):
            s, e, frac = get_start_end_idx(
                total, clip_size, clip_idx, num_clips, use_offset=use_offset
            )
            windows.append((s, e))
            fracs.append(frac)

    # Temporal-selection push-down: the at-or-after-floor(target) emission
    # rule in C picks EXACTLY the frames _sample_positions would select, so
    # the sws_scale + memcpy of dropped in-window frames is never paid
    # (sampling_rate-2 recipes decode 2x the frames they keep).
    # Targets are clamped to the last decodable frame (total - 1): for
    # videos shorter than the clip span, end_idx exceeds the stream, and an
    # unclamped target would never be emitted by the at-or-after rule —
    # collapsing the clip tail onto an earlier frame instead of duplicating
    # the final frame like the legacy full-window path (reference
    # decoder.py:17-34 clips indices to the decoded length). The C side
    # additionally emits the last decoded in-window frame at EOF/window
    # close when targets are still pending (container nb_frames can
    # overestimate the decodable count).
    wanted = np.unique(
        np.concatenate(
            [
                np.floor(
                    np.clip(np.linspace(s, e, num_frames), 0, total - 1)
                ).astype(np.int64)
                for s, e in windows
            ]
        )
    )
    crop = None
    if crop_size > 0 and max_spatial_scale > 0:
        # Fused decode-time crop (train path): output is (crop, crop).
        crop = (crop_size, crop_size, crop_fx, crop_fy)
    view = native_video.decode_windows_view(
        source, windows, short_side=max_spatial_scale, wanted=wanted,
        crop=crop,
    )
    if view is None:
        return None
    # Zero-copy consume: only the linspace-sampled frames are copied out of
    # the C-owned buffer (fancy indexing), never the whole decode window.
    with view:
        data, frame_idx, fps = view.data, view.frame_idx, view.fps
        clips = []
        for s, e in windows:
            lo = int(math.floor(s))
            hi = int(math.ceil(e))
            win_pos = np.nonzero((frame_idx >= lo) & (frame_idx <= hi))[0]
            if win_pos.size == 0:
                return None
            pos = _sample_positions(frame_idx[win_pos], s, e, num_frames)
            clips.append(data[win_pos[pos]])
    if n_views <= 1:
        return clips[0], fps, False, fracs[0]
    return clips, fps, False, fracs


def decode(
    path,
    sampling_rate,
    num_frames,
    clip_idx=-1,
    num_clips=10,
    target_fps=30,
    max_spatial_scale=0,
    use_offset=False,
    backend="native",
    crop_size=0,
    crop_fx=0.5,
    crop_fy=0.5,
):
    """Decode a clip from a video file (reference decoder.py:452-616).

    Selective decode: seeks to the sampled PTS window and decodes only the
    frames covering [start, end], with optional decode-time short-side
    resize (DATA.DECODING_SHORT_SIZE behavior).

    ``backend`` maps DATA.DECODING_BACKEND: "cv2" forces the cv2 path
    (debug / A-B switch); anything else ("native", and the reference names
    "pyav"/"torchvision" which alias the native FFmpeg service here) tries
    native first with cv2 fallback.

    Returns (frames uint8 (T,H,W,C), fps, decode_all_video, time_frac)
    or None; time_frac is the clip's normalized [0, 1] start position.
    """
    import cv2

    global _native_error_logged
    if backend != "cv2":
        try:
            result = decode_native(
                path,
                sampling_rate,
                num_frames,
                clip_idx=clip_idx,
                num_clips=num_clips,
                target_fps=target_fps,
                max_spatial_scale=max_spatial_scale,
                use_offset=use_offset,
                crop_size=crop_size,
                crop_fx=crop_fx,
                crop_fy=crop_fy,
            )
            if result is not None:
                return result
        except Exception as e:
            if not _native_error_logged:
                _native_error_logged = True
                logger.warning(
                    "native decode failed (falling back to cv2; logged "
                    "once per process): %r", e,
                )

    cap, fps, total = get_video_fps_and_frames(path)
    if cap is None or total <= 0:
        if cap is not None:
            cap.release()
        return None

    clip_size = sampling_rate * num_frames / target_fps * fps
    start_idx, end_idx, time_frac = get_start_end_idx(
        total, clip_size, clip_idx, num_clips, use_offset=use_offset
    )
    start_f = max(int(math.floor(start_idx)), 0)
    end_f = min(int(math.ceil(end_idx)), total - 1)

    if start_f > 0:
        cap.set(cv2.CAP_PROP_POS_FRAMES, start_f)
    frames = []
    for _ in range(end_f - start_f + 1):
        ok, frame = cap.read()
        if not ok:
            break
        if max_spatial_scale > 0:
            h, w = frame.shape[:2]
            short = min(h, w)
            if short > max_spatial_scale:
                scale = max_spatial_scale / short
                frame = cv2.resize(
                    frame,
                    (int(round(w * scale)), int(round(h * scale))),
                    interpolation=cv2.INTER_LINEAR,
                )
        frames.append(frame[:, :, ::-1])  # BGR -> RGB
    cap.release()
    if not frames:
        return None
    frames = np.stack(frames)

    # Frame indices relative to the decoded window.
    index = np.linspace(start_idx - start_f, end_idx - start_f, num_frames)
    index = np.clip(index, 0, frames.shape[0] - 1).astype(np.int64)
    return frames[index], fps, False, time_frac
