from .build import MODEL_REGISTRY, build_model, dummy_inputs, init_model  # noqa
from .video_models import ResNet, SlowFast, X3D  # noqa

MODEL_REGISTRY.register(SlowFast)
MODEL_REGISTRY.register(ResNet)
MODEL_REGISTRY.register(X3D)


def _register_late():
    """Register models that import heavier deps lazily."""
    from .contrastive import ContrastiveModel  # noqa
    from .masked import MaskMViT  # noqa
    from .mvit import MViT  # noqa

    if "MViT" not in MODEL_REGISTRY:
        MODEL_REGISTRY.register(MViT)
    if "ContrastiveModel" not in MODEL_REGISTRY:
        MODEL_REGISTRY.register(ContrastiveModel)
    if "MaskMViT" not in MODEL_REGISTRY:
        MODEL_REGISTRY.register(MaskMViT)


try:
    _register_late()
except ImportError:
    pass
