import time
class Timer:
    def __init__(self): self.reset()
    def reset(self): self._t=time.time(); self._p=0.0; self._paused=None
    def pause(self): self._paused=time.time()
    def seconds(self): return (self._paused or time.time())-self._t
