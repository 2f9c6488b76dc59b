#!/usr/bin/env python
"""Synthesize speech from text.

CLI contract mirrors the reference (reference: inference.py:114-128):

    python inference.py "Hello world." --checkpoint ckpt_dir \
        [--output_dir generated_audio] [--vocoder hifigan|griffinlim]
"""

import argparse

from tacotron2_tpu.infer import synthesize

if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("text", type=str, help="Text to synthesize.")
    parser.add_argument("--checkpoint", type=str, required=True,
                        help="Path to a trained model checkpoint.")
    parser.add_argument("--output_dir", type=str, default="generated_audio")
    parser.add_argument("--vocoder", type=str, default="hifigan",
                        choices=["hifigan", "griffinlim"])
    parser.add_argument("--griffinlim_iters", type=int, default=60)
    args = parser.parse_args()

    synthesize(text=args.text, checkpoint_path=args.checkpoint,
               output_dir=args.output_dir, vocoder=args.vocoder,
               griffinlim_iters=args.griffinlim_iters)
