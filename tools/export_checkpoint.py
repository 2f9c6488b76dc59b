#!/usr/bin/env python
"""Export a training checkpoint as a compact params-only artifact.

Strips the optimizer state / counters (2/3 of the bytes) and optionally
casts the weights to bfloat16 (half the rest): a 300 MB full training
checkpoint becomes a ~57 MB inference artifact — small enough to commit
as trained-model evidence — that ``infer.load_model`` /
``load_any_checkpoint`` restore transparently (restore_params_only casts
back to the template dtype).  Counterpart of the reference's bare
state_dict debug export (reference: train.py:465).

    python tools/export_checkpoint.py runs/ckpt/best_model out_dir \
        [--dtype bfloat16|float32]
"""

from __future__ import annotations

import argparse
import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])  # repo root


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("checkpoint")
    ap.add_argument("out")
    ap.add_argument("--dtype", default="bfloat16",
                    choices=["bfloat16", "float32"])
    ap.add_argument("--n_speakers", type=int, default=1)
    args = ap.parse_args()

    import dataclasses
    import os

    import ml_dtypes
    import numpy as np

    import jax

    # The axon sitecustomize forces jax_platforms at import time; honor
    # the caller's env (JAX_PLATFORMS=cpu exports without touching the
    # TPU — the artifact is host numpy either way).
    env_platforms = os.environ.get("JAX_PLATFORMS")
    if env_platforms:
        jax.config.update("jax_platforms", env_platforms)

    from tacotron2_tpu.config import Config
    from tacotron2_tpu.infer import load_model
    from tacotron2_tpu.train.checkpoint import save_params_only

    cfg = Config()
    if args.n_speakers > 1:
        cfg = dataclasses.replace(cfg, model=dataclasses.replace(
            cfg.model, n_speakers=args.n_speakers))
    params, model_state = load_model(args.checkpoint, cfg)
    dt = (ml_dtypes.bfloat16 if args.dtype == "bfloat16"
          else np.float32)

    def cast(x):
        # HOST numpy leaves: the artifact carries no device shardings, so
        # it restores on any backend (CPU tests, TPU serving)
        x = np.asarray(x)
        return x.astype(dt) if np.issubdtype(x.dtype, np.floating) else x

    params = jax.tree_util.tree_map(cast, params)
    model_state = jax.tree_util.tree_map(lambda x: np.asarray(x),
                                         model_state)
    # BN running stats stay fp32 (they are statistics, not weights, and
    # cost ~nothing)
    save_params_only(args.out, params, model_state)
    n = sum(x.size for x in jax.tree_util.tree_leaves(params))
    print(f"exported {n / 1e6:.1f} M params as {args.dtype} -> {args.out}")


if __name__ == "__main__":
    main()
