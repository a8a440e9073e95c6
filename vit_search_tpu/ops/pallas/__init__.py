"""Pallas TPU kernels for the hot masked ops (opt-in compute paths)."""

from .masked_ln import masked_layer_norm_pallas, supported as masked_ln_supported

__all__ = ["masked_layer_norm_pallas", "masked_ln_supported"]
