def activation_count(*a, **k): return {}, {}
