from .dataset import BatchLoader, Example, TextMelDataset, collate
from .metadata import (basename_of, prepare_librispeech_metadata,
                       prepare_ljspeech_metadata, read_metadata)
from .preprocess import preprocess_corpus

__all__ = [
    "BatchLoader", "Example", "TextMelDataset", "collate", "basename_of",
    "prepare_librispeech_metadata", "prepare_ljspeech_metadata",
    "read_metadata", "preprocess_corpus",
]
