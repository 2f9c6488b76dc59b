"""Worker process for the REAL 2-process data-parallel integration test.

Launched by tests/test_parallel.py::test_two_process_training_end_to_end
(one subprocess per rank).  Joins the JAX distributed runtime over the
env-provided coordinator, then runs the actual ``train()`` entry point —
loader process-sharding, global-batch assembly, GSPMD step, collective
Orbax checkpointing, lead-only logging — exactly as on a pod slice, with
CPU devices + Gloo collectives standing in for chips + ICI.

Prints ``RESULT rank=<r> step=<n> param0=<x>`` (x = first parameter
value, replicated — identical across ranks iff training stayed in sync)
for the parent to compare.
"""

import os
import sys

# Must configure platform BEFORE importing jax (and undo the axon site
# override after import, before any backend use).
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.pop("XLA_FLAGS", None)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    import dataclasses

    import numpy as np

    from tacotron2_tpu.config import Config, ModelConfig, TrainConfig
    from tacotron2_tpu.train import train

    meta = sys.argv[1]
    ckpt_dir = sys.argv[2]

    cfg = Config(
        model=ModelConfig(
            symbols_embedding_dim=32, encoder_embedding_dim=32,
            decoder_rnn_dim=48, prenet_dim=16, attention_rnn_dim=48,
            attention_dim=24, location_n_filters=8, location_kernel_size=15,
            postnet_embedding_dim=24, max_decoder_steps=50),
        train=dataclasses.replace(TrainConfig(), epochs=1, batch_size=1,
                                  text_pad_multiple=4, mel_pad_multiple=8))

    state = train(meta, ckpt_dir, cfg=cfg)
    # A replicated param is addressable on every process; ranks must agree.
    param0 = float(np.asarray(
        jax.tree_util.tree_leaves(state.params)[0]).ravel()[0])
    print(f"RESULT rank={jax.process_index()} step={int(state.step)} "
          f"param0={param0:.6f}", flush=True)


if __name__ == "__main__":
    main()
