import sys
sys.path.insert(0, '/root/repo')
from slowfast_tpu.config.cfg_node import CfgNode as _Mine

class CfgNode(_Mine):
    def __init__(self, *a, **k):
        k.pop('new_allowed', None)
        super().__init__(*a, new_allowed=True)
