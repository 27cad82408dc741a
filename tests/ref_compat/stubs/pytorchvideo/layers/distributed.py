def init_distributed_training(*a, **k): pass
def get_local_rank(): return 0
def get_local_size(): return 1
def get_local_process_group(): return None
def cat_all_gather(x): return x
def get_world_size(): return 1
def get_rank(): return 0
def all_gather(x): return [x]
def all_reduce(x, *a, **k): return x
