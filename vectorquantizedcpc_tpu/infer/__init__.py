"""Inference layer: unit-discovery export (encode), voice conversion, and
the continuous-batching decode server."""

from .encode import encode_dataset, load_encoder_checkpoint
from .convert import convert
from .serving import ContinuousBatcher

__all__ = [
    "encode_dataset",
    "load_encoder_checkpoint",
    "convert",
    "ContinuousBatcher",
]
