#!/usr/bin/env python
"""Prepare LibriSpeech metadata (reference contract: prepare_metadata.py:65-70).

    python prepare_metadata.py /data/LibriSpeech [--output metadata.csv]
"""

import argparse

from tacotron2_tpu.data import prepare_librispeech_metadata

if __name__ == "__main__":
    parser = argparse.ArgumentParser(
        description="Prepare LibriSpeech metadata.")
    parser.add_argument("librispeech_path", type=str,
                        help="Root of the LibriSpeech dataset.")
    parser.add_argument("--output", type=str, default="metadata.csv")
    args = parser.parse_args()

    prepare_librispeech_metadata(args.librispeech_path, args.output)
