"""Dataset registry (reference slowfast/datasets/build.py:6-31)."""

from slowfast_tpu.utils.registry import Registry

DATASET_REGISTRY = Registry("DATASET")


def build_dataset(dataset_name, cfg, split):
    name = dataset_name.capitalize()
    return DATASET_REGISTRY.get(name)(cfg, split)
