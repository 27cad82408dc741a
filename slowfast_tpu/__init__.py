"""slowfast_tpu: a TPU-native video understanding framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
facebookresearch/SlowFast (PySlowFast): video classification
(SlowFast/C2D/I3D/X3D/MViT/MViTv2/Rev-MViT), AVA action detection,
self-supervised pretraining (contrastive + masked), multigrid training,
and the surrounding config/data/solver/eval/visualization machinery.
"""

__version__ = "0.1.0"
