def make_grid(*a, **k): return None
