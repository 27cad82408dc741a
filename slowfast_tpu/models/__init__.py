from .build import MODEL_REGISTRY, build_model, dummy_inputs, init_model  # noqa
from .video_models import ResNet, SlowFast, X3D  # noqa

MODEL_REGISTRY.register(SlowFast)
MODEL_REGISTRY.register(ResNet)
MODEL_REGISTRY.register(X3D)
# Reference pytorchvideo-backed builder names map to the native models
# (reference ptv_model_builder.py:50-755; CSN/R(2+1)D are native transform
# functions here, selected by MODEL.ARCH + RESNET.TRANS_FUNC).
MODEL_REGISTRY.register(ResNet, name="PTVResNet")
MODEL_REGISTRY.register(SlowFast, name="PTVSlowFast")
MODEL_REGISTRY.register(X3D, name="PTVX3D")
MODEL_REGISTRY.register(ResNet, name="PTVCSN")
MODEL_REGISTRY.register(ResNet, name="PTVR2plus1D")
# Model-zoo C2D variant without the post-s2 temporal max-pool. The reference
# ships its config + Caffe2 weights (configs/Kinetics/c2/C2D_NOPOOL_8x8_R50.yaml,
# MODEL_ZOO.md row 1) but registers no class for the name; here it is the
# ResNet with pool1 forced to identity (video_models.py).
MODEL_REGISTRY.register(ResNet, name="ResNet_nopool")


def _register_late():
    """Register models that import heavier deps lazily."""
    from .contrastive import ContrastiveModel  # noqa
    from .masked import MaskMViT  # noqa
    from .mvit import MViT  # noqa

    if "MViT" not in MODEL_REGISTRY:
        MODEL_REGISTRY.register(MViT)
        MODEL_REGISTRY.register(MViT, name="PTVMViT")
    if "ContrastiveModel" not in MODEL_REGISTRY:
        MODEL_REGISTRY.register(ContrastiveModel)
    if "MaskMViT" not in MODEL_REGISTRY:
        MODEL_REGISTRY.register(MaskMViT)


try:
    _register_late()
except ImportError:
    pass
