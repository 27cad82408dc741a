# Minimal torchvision shim for loading the reference under the parity
# harness. Marked so other tests can tell it apart from the real package
# (pytest.importorskip would otherwise succeed on this stub).
__graft_stub__ = True
