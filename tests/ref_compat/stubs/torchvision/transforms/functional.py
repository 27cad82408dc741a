def to_tensor(x): raise RuntimeError('stub')
