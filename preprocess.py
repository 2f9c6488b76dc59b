#!/usr/bin/env python
"""One-time corpus preprocessing: wav -> cached log-mels, text -> token IDs.

CLI contract mirrors the reference (reference: preprocess.py:63-68), but
the mel extraction runs as device-batched XLA programs instead of a
sequential librosa loop:

    python preprocess.py metadata.csv processed/
"""

import argparse

from tacotron2_tpu.utils.cache import enable_persistent_cache
from tacotron2_tpu.data import preprocess_corpus

if __name__ == "__main__":
    parser = argparse.ArgumentParser(
        description="Pre-process dataset for Tacotron 2 training.")
    parser.add_argument("metadata", type=str,
                        help="Path to the original metadata file.")
    parser.add_argument("output_dir", type=str,
                        help="Directory to save the processed data.")
    parser.add_argument("--batch_size", type=int, default=64,
                        help="Device batch size for mel extraction "
                             "(bigger batches = fewer device round-trips; "
                             "64 is latency-friendly through a tunneled "
                             "chip and fine locally).")
    args = parser.parse_args()

    enable_persistent_cache()
    preprocess_corpus(args.metadata, args.output_dir,
                      batch_size=args.batch_size)
