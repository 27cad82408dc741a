class _PM:
    @staticmethod
    def open(p, *a, **k): return open(p, *a, **k)
    @staticmethod
    def exists(p):
        import os; return os.path.exists(p)
    @staticmethod
    def mkdirs(p):
        import os; os.makedirs(p, exist_ok=True)
    @staticmethod
    def ls(p):
        import os; return os.listdir(p)
    @staticmethod
    def rm(p):
        import os; os.remove(p)
class PathManagerFactory:
    @staticmethod
    def get(key=None): return _PM()
class g_pathmgr(_PM): pass
