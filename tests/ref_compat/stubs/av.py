def open(*a, **k): raise RuntimeError('stub')
