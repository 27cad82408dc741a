def _probe_video_from_memory(*a, **k): raise RuntimeError('stub')
def _read_video_from_memory(*a, **k): raise RuntimeError('stub')
