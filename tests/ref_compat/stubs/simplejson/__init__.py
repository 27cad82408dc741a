from json import *
import json as _j
def dumps(*a, **k):
    k.pop('use_decimal', None)
    return _j.dumps(*a, **k)
