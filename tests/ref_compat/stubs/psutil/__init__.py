import types
def virtual_memory():
    t = types.SimpleNamespace(); t.total=0; t.available=0; return t
class Process:
    def memory_info(self):
        import types; return types.SimpleNamespace(rss=0)
