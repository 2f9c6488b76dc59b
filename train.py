#!/usr/bin/env python
"""Train the TPU-native Tacotron 2.

CLI contract mirrors the reference trainer (reference: train.py:616-642):

    python train.py processed/metadata.csv checkpoints/run1 \
        --epochs 100 --batch_size 16 --lr 1e-3 [--debug] \
        [--val_metadata V.csv] [--resume CKPT] [--postnet_freeze_steps N] \
        [--accum_steps N]
"""

import argparse

from tacotron2_tpu.utils.cache import enable_persistent_cache
from tacotron2_tpu.train import train

if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("metadata", type=str,
                        help="Path to the processed metadata CSV.")
    parser.add_argument("checkpoint_dir", type=str,
                        help="Directory to save checkpoints.")
    parser.add_argument("--epochs", type=int, default=100)
    parser.add_argument("--batch_size", type=int, default=16)
    parser.add_argument("--lr", type=float, default=1e-3)
    parser.add_argument("--debug", action="store_true",
                        help="Debug mode: overfit on a single batch.")
    parser.add_argument("--val_metadata", type=str, default=None)
    parser.add_argument("--resume", type=str, default=None)
    parser.add_argument("--postnet_freeze_steps", type=int, default=None)
    parser.add_argument("--accum_steps", type=int, default=1)
    parser.add_argument("--precision", type=str, default=None,
                        choices=["bf16", "bfloat16", "fp32", "float32"],
                        help="Training compute precision (default: the "
                             "config's bfloat16 mixed-precision policy — "
                             "fp32 master weights, bf16 matmuls; the TPU "
                             "counterpart of the reference's CUDA AMP).")
    parser.add_argument("--remat", type=str, default=None,
                        choices=["off", "full", "dots"],
                        help="Decoder-step rematerialization for the "
                             "backward pass: 'full' recomputes the whole "
                             "step, 'dots' keeps matmul outputs and "
                             "recomputes elementwise ops. Use when large "
                             "--batch_size overflows HBM (default: config).")
    parser.add_argument("--keep_epoch_ckpts", type=int, default=None,
                        help="Keep only the newest N per-epoch checkpoints "
                             "(default 5; 0 keeps all, like the reference "
                             "- ~300 MB each).")
    parser.add_argument("--tp", type=int, default=1,
                        help="Tensor-parallel width: shard the decoder's "
                             "wide matmuls over a 'model' mesh axis of "
                             "this many chips (must divide the device "
                             "count; remaining chips form the 'data' "
                             "axis). Default 1 = data parallelism only.")
    args = parser.parse_args()

    enable_persistent_cache()
    train(metadata_path=args.metadata, checkpoint_dir=args.checkpoint_dir,
          epochs=args.epochs, batch_size=args.batch_size,
          learning_rate=args.lr, debug_overfit=args.debug,
          val_metadata=args.val_metadata, resume=args.resume,
          postnet_freeze_steps_override=args.postnet_freeze_steps,
          accum_steps=args.accum_steps, precision=args.precision,
          remat=args.remat, tensor_parallel=args.tp,
          keep_epoch_ckpts=args.keep_epoch_ckpts)
