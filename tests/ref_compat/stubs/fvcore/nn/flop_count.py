def flop_count(*a, **k): return {}, {}
