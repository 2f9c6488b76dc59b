from .synthesize import (load_model, next_output_path, print_mel_stats,
                         synthesize, synthesize_mels)

__all__ = ["load_model", "next_output_path", "print_mel_stats", "synthesize",
           "synthesize_mels"]
