"""Multi-chip batched synthesis: data-parallel serving over a device mesh.

The reference serves from exactly one device (reference: inference.py:20-25
picks a single ``device``).  Here serving scales the TPU-native way: the
same fused tokens->waveform programs (infer/fused.py) run under GSPMD with
the batch dimension sharded over the mesh's ``data`` axis — XLA partitions
the whole program (encoder, autoregressive while_loop, postnet, vocoder)
across chips and inserts the one collective the decode loop needs (the
global gate-stop reduction) over ICI.  Parameters are replicated once at
construction; per-call host work is only tokenization and a device_put of
the sharded token batch.

Throughput scales with mesh size because each chip decodes ``B / n_data``
items of the batch; per-stream latency stays that of a ``B / n_data``-item
batch on one chip.
"""

from __future__ import annotations

from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import Config
from ..models.tacotron2 import make_speaker_ids
from ..text import pad_sequences, text_to_sequence
from .fused import synthesize_wav_fused, synthesize_wav_fused_hifigan


def _pad_rows(arr: np.ndarray, n_rows: int) -> np.ndarray:
    """Pad the leading (batch) axis to ``n_rows`` by repeating the last
    row (a real row, so the padding decodes — and gate-stops — like its
    original; dummy all-zero rows would never fire the gate and pin the
    whole batch at the step cap under stop_mode='all')."""
    if arr.shape[0] == n_rows:
        return arr
    reps = np.repeat(arr[-1:], n_rows - arr.shape[0], axis=0)
    return np.concatenate([arr, reps], axis=0)


class ShardedSynthesizer:
    """Batched texts -> waveforms, data-parallel over a mesh.

    Usage::

        mesh = make_mesh(n_data=len(jax.devices()))
        synth = ShardedSynthesizer(params, model_state, mesh, cfg)
        wavs = synth(["First text.", "Second text.", ...])

    ``hifigan_params`` switches the fused vocoder from Griffin-Lim to the
    HiFi-GAN generator (both single-dispatch programs).  Batches whose
    size is not a multiple of the mesh's ``data`` extent are padded by
    repeating the final item; outputs are trimmed back.
    """

    def __init__(self, params, model_state, mesh: Mesh,
                 cfg: Optional[Config] = None, hifigan_params=None,
                 gl_iters: int = 60, tensor_parallel: bool = False):
        if "data" not in mesh.axis_names:
            raise ValueError(f"mesh must have a 'data' axis, has "
                             f"{mesh.axis_names}")
        self.cfg = cfg or Config()
        # Register the mesh so the decode's Pallas kernels shard over
        # ``data`` and run on local batch shards (ops/meshing.py): on a
        # data-only mesh the whole-decode megakernel engages PER SHARD
        # (weights VMEM-resident on every core, per-shard gate stops —
        # sound because serving always decodes stop_mode="all", see
        # ops/decoder_megakernel.py::megakernel_enabled); batches past
        # its VMEM window, and TP meshes, take the while_loop decode
        # with the shard_mapped fused attention tail.  The registration
        # is process-global trace-time state — scope it with close()
        # (or use the instance as a context manager) so later
        # single-device jit traces in the same process don't silently
        # shard over a stale mesh.
        from ..ops.meshing import set_kernel_mesh
        self._prev_kernel_mesh = set_kernel_mesh(mesh)
        self._mesh_registered = True
        self.mesh = mesh
        self.n_data = mesh.shape["data"]
        self.gl_iters = gl_iters
        rep = NamedSharding(mesh, P())
        if tensor_parallel:
            # Shard the decoder's wide matmuls over the ``model`` axis
            # (same layout training uses, parallel/mesh.py); GSPMD
            # partitions the decode loop's matmuls and all-gathers the
            # gate-width activations over ICI.
            if mesh.shape.get("model", 1) < 2:
                raise ValueError("tensor_parallel needs a 'model' mesh "
                                 f"axis wider than 1, mesh: {mesh.shape}")
            from ..parallel.mesh import param_shardings
            self.params = jax.device_put(
                params, param_shardings(mesh, params, tensor_parallel=True))
        else:
            self.params = jax.device_put(params, rep)
        self.model_state = jax.device_put(model_state, rep)
        self.hifigan_params = (None if hifigan_params is None
                               else jax.device_put(hifigan_params, rep))
        self._batch_sharding = NamedSharding(mesh, P("data"))

    def close(self):
        """Restore the kernel-mesh registration this synthesizer made.

        After ``close()`` new jit traces (a plain Synthesizer, bench code)
        stop shard_mapping their Pallas calls over this mesh; already-
        compiled programs keep working.  Idempotent."""
        if getattr(self, "_mesh_registered", False):
            from ..ops.meshing import set_kernel_mesh
            set_kernel_mesh(*self._prev_kernel_mesh)
            self._mesh_registered = False

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
        return False

    def __call__(self, texts: Sequence[str],
                 speaker_id=None,
                 max_steps: Optional[int] = None) -> List[np.ndarray]:
        """Synthesize ``texts`` -> list of trimmed float32 waveforms.

        ``speaker_id``: one id for all items or a per-item sequence
        (None entries default), as in :func:`make_speaker_ids`.
        """
        if not texts:
            return []
        n = len(texts)
        cfg = self.cfg
        seqs = [text_to_sequence(t) or [0] for t in texts]
        tokens, lengths = pad_sequences(seqs, pad_multiple=16)
        spk = make_speaker_ids(speaker_id, n, cfg.model)

        b = -(-n // self.n_data) * self.n_data   # round up to mesh multiple
        tokens = _pad_rows(np.asarray(tokens), b)
        lengths = _pad_rows(np.asarray(lengths), b)
        put = lambda x: jax.device_put(x, self._batch_sharding)
        spk_dev = None if spk is None else put(_pad_rows(np.asarray(spk), b))

        # stop_mode='all' always: each (padded) item decodes to its own
        # gate stop; the cross-item AND is the program's one global
        # collective per decode step.
        if self.hifigan_params is not None:
            wav, _, _, ends = synthesize_wav_fused_hifigan(
                self.params, self.model_state, self.hifigan_params,
                cfg.model, cfg.audio, put(tokens), put(lengths), spk_dev,
                max_steps=max_steps, stop_mode="all")
        else:
            wav, _, ends = synthesize_wav_fused(
                self.params, self.model_state, cfg.model, cfg.audio,
                put(tokens), put(lengths), spk_dev,
                max_steps=max_steps, gl_iters=self.gl_iters,
                stop_mode="all")
        wav_np = np.asarray(wav)
        ends_np = np.asarray(ends)
        hop = cfg.audio.hop_length
        return [wav_np[i, : int(ends_np[i]) * hop] for i in range(n)]
