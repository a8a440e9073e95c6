"""Input pipeline: datasets, transforms, samplers, loaders, device mixing."""

from . import mixup

__all__ = ["mixup"]
