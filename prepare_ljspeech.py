#!/usr/bin/env python
"""Prepare LJSpeech metadata (reference contract: prepare_ljspeech.py:63-69).

    python prepare_ljspeech.py /data/LJSpeech-1.1 metadata.csv [--debug]
"""

import argparse

from tacotron2_tpu.data import prepare_ljspeech_metadata

if __name__ == "__main__":
    parser = argparse.ArgumentParser(description="Prepare LJSpeech metadata.")
    parser.add_argument("dataset_path", type=str,
                        help="Root of the LJSpeech dataset directory.")
    parser.add_argument("output_path", type=str,
                        help="Path for the clean metadata CSV.")
    parser.add_argument("--debug", action="store_true",
                        help="Verbose validations.")
    args = parser.parse_args()

    prepare_ljspeech_metadata(args.dataset_path, args.output_path,
                              debug=args.debug)
