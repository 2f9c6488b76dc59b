#!/usr/bin/env python
"""Synthesize speech from text.

CLI contract mirrors the reference (reference: inference.py:114-128), plus
a long-form mode for paragraph input (the reference's input.txt workload):

    python inference.py "Hello world." --checkpoint ckpt_dir \
        [--output_dir generated_audio] [--vocoder hifigan|griffinlim]
    python inference.py --input_file input.txt --longform --checkpoint ...
"""

import argparse
import dataclasses

import numpy as np


def _make_cfg(args):
    from tacotron2_tpu.config import Config
    cfg = Config()
    if args.n_speakers > 1:
        cfg = dataclasses.replace(
            cfg, model=dataclasses.replace(cfg.model,
                                           n_speakers=args.n_speakers))
    return cfg


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("text", type=str, nargs="?", default=None,
                        help="Text to synthesize.")
    parser.add_argument("--input_file", type=str, default=None,
                        help="Read the text from a file (e.g. a paragraph).")
    parser.add_argument("--longform", action="store_true",
                        help="Sentence-chunked streaming decode for "
                             "paragraphs longer than the decoder cap.")
    parser.add_argument("--batch_file", type=str, default=None,
                        help="File with one text per line: synthesize the "
                             "whole batch in one decode (per-line WAVs).")
    parser.add_argument("--checkpoint", type=str, required=True,
                        help="Path to a trained model checkpoint.")
    parser.add_argument("--output_dir", type=str, default="generated_audio")
    parser.add_argument("--vocoder", type=str, default="hifigan",
                        choices=["hifigan", "griffinlim"])
    parser.add_argument("--griffinlim_iters", type=int, default=60)
    parser.add_argument("--speaker_id", type=int, default=None,
                        help="Speaker index for multi-speaker checkpoints.")
    parser.add_argument("--n_speakers", type=int, default=1,
                        help="Speaker-table size of the checkpoint "
                             "(must match training).")
    args = parser.parse_args()

    from tacotron2_tpu.utils.cache import enable_persistent_cache
    enable_persistent_cache()

    if args.batch_file:
        from tacotron2_tpu.dsp import save_wav
        from tacotron2_tpu.infer import (load_model, next_output_path,
                                         synthesize_mels)
        from tacotron2_tpu.infer.vocode import try_load_hifigan, vocode_mels
        with open(args.batch_file, "r", encoding="utf-8") as f:
            texts = [line.strip() for line in f if line.strip()]
        if not texts:
            parser.error("--batch_file is empty")
        cfg = _make_cfg(args)
        params, model_state = load_model(args.checkpoint, cfg)
        vocode = try_load_hifigan() if args.vocoder == "hifigan" else None
        print(f"Batch synthesis: {len(texts)} texts in one decode")
        mels, _ = synthesize_mels(params, model_state, texts, cfg,
                                  speaker_id=args.speaker_id)
        # One vocoder dispatch per length bucket (not one per line),
        # chunked so WAVs are written incrementally: a crash partway
        # through vocoding keeps every already-finished chunk on disk.
        chunk = 16
        for s in range(0, len(mels), chunk):
            part = list(mels[s:s + chunk])
            wavs = vocode_mels(part, cfg.audio, vocoder=vocode,
                               griffinlim_iters=args.griffinlim_iters)
            for mel, wav in zip(part, wavs):
                out_path = next_output_path(args.output_dir)
                save_wav(out_path, wav, cfg.audio.sampling_rate)
                print(f"  -> {out_path} ({mel.shape[0]} frames)")
        return

    if args.input_file:
        with open(args.input_file, "r", encoding="utf-8") as f:
            text = f.read().strip()
    elif args.text:
        text = args.text
    else:
        parser.error("provide TEXT, --input_file, or --batch_file")

    if args.longform:
        from tacotron2_tpu.dsp import save_wav
        from tacotron2_tpu.infer import (load_model, next_output_path,
                                         synthesize_longform)
        cfg = _make_cfg(args)
        params, model_state = load_model(args.checkpoint, cfg)
        # HiFi-GAN rides the fused one-dispatch program as raw params
        # (longform.py) — not as an external vocoder callable, which
        # would force the legacy modular path.
        from tacotron2_tpu.infer.vocode import try_load_hifigan_params
        hp = (try_load_hifigan_params() if args.vocoder == "hifigan"
              else None)
        wav, mels = synthesize_longform(
            params, model_state, text, cfg, hifigan_params=hp,
            griffinlim_iters=args.griffinlim_iters,
            speaker_id=args.speaker_id)
        out_path = next_output_path(args.output_dir)
        save_wav(out_path, np.asarray(wav), cfg.audio.sampling_rate)
        print(f"\nAudio ({len(mels)} sentences, "
              f"{len(wav) / cfg.audio.sampling_rate:.1f}s) saved to: "
              f"{out_path}")
    else:
        from tacotron2_tpu.infer import synthesize
        synthesize(text=text, checkpoint_path=args.checkpoint,
                   output_dir=args.output_dir, vocoder=args.vocoder,
                   griffinlim_iters=args.griffinlim_iters,
                   cfg=_make_cfg(args), speaker_id=args.speaker_id)


if __name__ == "__main__":
    import sys
    try:
        main()
    except (FileNotFoundError, RuntimeError, ValueError) as e:
        sys.exit(f"error: {e}")
