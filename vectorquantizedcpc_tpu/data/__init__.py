"""Data layer: corpora, offline preprocessing, datasets, device loaders.

Supplies the contracts the reference snapshot left missing (SURVEY.md §0.1,
§2.4): the ``speechcorpusy``-style corpus presets, ``CPCMelSpkDataset``,
``MulawMelSpkDataset``, and loader plumbing — re-designed for JAX: host-side
numpy batch assembly with background prefetch into device memory, fixed
shapes throughout.
"""

from .corpus import Corpus, Utterance, ZR19Corpus, JVSCorpus, SyntheticCorpus, get_corpus
from .preprocess import preprocess_corpus
from .datasets import CPCMelSpkDataset, MulawMelSpkDataset
from .loader import PrefetchLoader

__all__ = [
    "Corpus",
    "Utterance",
    "ZR19Corpus",
    "JVSCorpus",
    "SyntheticCorpus",
    "get_corpus",
    "preprocess_corpus",
    "CPCMelSpkDataset",
    "MulawMelSpkDataset",
    "PrefetchLoader",
]
