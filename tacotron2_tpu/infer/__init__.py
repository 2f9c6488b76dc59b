from .longform import split_sentences, synthesize_longform
from .sharded import ShardedSynthesizer
from .synthesize import (load_model, next_output_path, print_mel_stats,
                         synthesize, synthesize_mels)

__all__ = ["load_model", "next_output_path", "print_mel_stats", "synthesize",
           "synthesize_mels", "split_sentences", "synthesize_longform",
           "ShardedSynthesizer"]
