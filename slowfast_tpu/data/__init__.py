from .build import DATASET_REGISTRY, build_dataset  # noqa
from .loader import construct_loader, shuffle_dataset  # noqa
