"""Evaluation metrics.

The reference defers acoustic-unit evaluation to the external ZeroSpeech
ABX toolkit (reference README.md:89-102: dump latents with encode.py, then
run bootphon/zerospeech2020). This package provides a self-contained
machine-ABX implementation over the same ``encode`` latent dumps so unit
quality can be tracked without the external toolkit.
"""

from .abx import abx_error_rate, batched_dtw, load_feature_dir

__all__ = ["abx_error_rate", "batched_dtw", "load_feature_dir"]
