"""Inference layer: unit-discovery export (encode) and voice conversion."""

from .encode import encode_dataset, load_encoder_checkpoint
from .convert import convert

__all__ = ["encode_dataset", "load_encoder_checkpoint", "convert"]
