"""Data pipeline: triplet dataset, synchronized augmentations, prefetch loader."""

from vfi_tpu.data.dataset import TripletDataset, IMAGENET_MEAN, IMAGENET_STD
from vfi_tpu.data.augment import AugmentConfig, augment_triplet
from vfi_tpu.data.loader import DataLoader

__all__ = [
    "TripletDataset",
    "AugmentConfig",
    "augment_triplet",
    "DataLoader",
    "IMAGENET_MEAN",
    "IMAGENET_STD",
]
