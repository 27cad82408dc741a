"""Load the reference torch implementation with stubbed heavy deps.

Used only by parity tests: instantiates reference models on CPU so we can
compare parameter inventories and (weight-converted) forward outputs
against the TPU implementation. The stubs replace fvcore/pytorchvideo/
detectron2/av/torchvision with minimal shims.
"""

import os
import sys
import types

_STUBS = os.path.join(os.path.dirname(__file__), "stubs")
_REF = "/root/reference"


def load_reference():
    """Make `import slowfast` resolve to the reference with stubs. Returns
    the reference slowfast package or None if unavailable."""
    if not os.path.isdir(_REF):
        return None
    for p in (_STUBS, _REF):
        if p not in sys.path:
            sys.path.insert(0, p)
    for name in ["fairscale", "fairscale.nn", "fairscale.nn.checkpoint"]:
        sys.modules.setdefault(name, types.ModuleType(name))
    sys.modules["fairscale.nn.checkpoint"].checkpoint_wrapper = lambda m: m
    import slowfast  # noqa

    return slowfast
