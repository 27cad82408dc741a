class Registry:
    def __init__(self, name): self._name=name; self._m={}
    def register(self, obj=None):
        if obj is None:
            def d(c): self._m[c.__name__]=c; return c
            return d
        self._m[obj.__name__]=obj; return obj
    def get(self, n): return self._m[n]
