class Compose:
    def __init__(self, t): self.t=t
    def __call__(self, x):
        for f in self.t: x=f(x)
        return x
class Lambda:
    def __init__(self, f): self.f=f
    def __call__(self, x): return self.f(x)
