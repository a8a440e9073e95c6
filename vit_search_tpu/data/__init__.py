"""Input pipeline: datasets, transforms, samplers, loaders, device mixing."""

from . import datasets, erasing, loader, mixup, samplers, subset, transforms
from .datasets import (CIFAR100Dataset, ImageFolderDataset, INatDataset,
                       SyntheticDataset, build_dataset)
from .erasing import random_erasing
from .loader import DataLoader, PaddedEvalLoader, normalize_images
from .samplers import RepeatedAugmentSampler, ShardedSampler
from .subset import build_subsets, convert_reference_pickle, select_holdout
from .transforms import (EvalTransform, IMAGENET_MEAN, IMAGENET_STD,
                         RandAugment, TrainTransform)

__all__ = [
    "CIFAR100Dataset",
    "DataLoader",
    "PaddedEvalLoader",
    "EvalTransform",
    "IMAGENET_MEAN",
    "IMAGENET_STD",
    "ImageFolderDataset",
    "INatDataset",
    "RandAugment",
    "RepeatedAugmentSampler",
    "ShardedSampler",
    "SyntheticDataset",
    "TrainTransform",
    "build_dataset",
    "build_subsets",
    "convert_reference_pickle",
    "datasets",
    "erasing",
    "loader",
    "mixup",
    "normalize_images",
    "random_erasing",
    "samplers",
    "select_holdout",
    "subset",
    "transforms",
]
