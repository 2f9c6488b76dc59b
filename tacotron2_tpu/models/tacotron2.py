"""Full Tacotron 2 model: encoder + decoder + postnet (+ optional speaker).

Functional re-design of the reference top-level module
(reference: src/model.py:410-501).  Parameters and BatchNorm running stats
are explicit pytrees; forward/infer are pure functions ready for
jit/grad/pjit.  Reference quirks preserved:

  * lazy projection-bias init to per-channel mel means of the first batch
    (src/model.py:424-441) — exposed as :func:`init_projection_bias`, which
    the train loop applies once (a functional param update instead of an
    in-place mutation);
  * ``use_postnet`` bypass for the postnet freeze phase (src/model.py:474-479);
  * additive -1e9 attention masking of encoder padding built from text
    lengths (src/model.py:443-450);
  * inference warns on outputs shorter than 3 frames (src/model.py:496-497)
    — surfaced via the returned frame count, checked by the caller.

New capability: optional multi-speaker conditioning (``cfg.n_speakers > 1``)
via a learned speaker embedding projected and broadcast-added to the
encoder memory; the reference carries speaker_id in metadata but never uses
it (prepare_metadata.py:47-51).
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from ..config import ModelConfig
from .decoder import decoder_infer, decoder_init, decoder_teacher_forced
from .encoder import encoder_apply, encoder_init
from .layers import embedding_init, linear_apply, linear_init
from .postnet import postnet_apply, postnet_init


class Tacotron2Output(NamedTuple):
    mel_postnet: jnp.ndarray   # (B, T_dec, n_mels)
    mel_coarse: jnp.ndarray    # (B, T_dec, n_mels)
    gate_logits: jnp.ndarray   # (B, T_dec)
    alignments: jnp.ndarray    # (B, T_dec, T_enc)


def tacotron2_init(key, cfg: ModelConfig
                   ) -> Tuple[Dict[str, Any], Dict[str, Any]]:
    """Returns (params, state); state carries BatchNorm running stats."""
    k_enc, k_dec, k_post, k_spk = jax.random.split(key, 4)
    enc_p, enc_s = encoder_init(k_enc, cfg)
    post_p, post_s = postnet_init(k_post, cfg)
    params: Dict[str, Any] = {
        "encoder": enc_p,
        "decoder": decoder_init(k_dec, cfg),
        "postnet": post_p,
    }
    if cfg.n_speakers > 1:
        k_emb, k_proj = jax.random.split(k_spk)
        params["speaker"] = {
            "embedding": embedding_init(k_emb, cfg.n_speakers,
                                        cfg.speaker_embedding_dim),
            "proj": linear_init(k_proj, cfg.speaker_embedding_dim,
                                cfg.encoder_embedding_dim, bias=False),
        }
    state = {"encoder": enc_s, "postnet": post_s}
    return params, state


def make_pad_mask(lengths: jnp.ndarray, max_len: int) -> jnp.ndarray:
    """(B,) lengths -> (B, max_len) bool mask, True where padding
    (reference: src/model.py:443-450)."""
    ids = jnp.arange(max_len)[None, :]
    return ids >= lengths[:, None]


def init_projection_bias(params: Dict[str, Any],
                         mel_targets: jnp.ndarray) -> Dict[str, Any]:
    """Set the decoder projection bias to per-channel mel means of a batch
    (reference: src/model.py:424-441).  Returns updated params."""
    channel_means = jnp.mean(mel_targets, axis=(0, 2))  # (n_mels,)
    new = jax.tree_util.tree_map(lambda x: x, params)   # shallow-ish copy
    new["decoder"] = dict(params["decoder"])
    new["decoder"]["proj"] = dict(params["decoder"]["proj"])
    new["decoder"]["proj"]["b"] = channel_means.astype(
        params["decoder"]["proj"]["b"].dtype)
    return new


_warned_default_speaker = False


def make_speaker_ids(speaker_id, batch: int,
                     cfg: ModelConfig) -> Optional[jnp.ndarray]:
    """Validated (B,) speaker-id array for inference helpers.

    ``speaker_id`` is either one id broadcast over the batch, or a
    length-``batch`` sequence of per-item ids (mixed-speaker batches, e.g.
    the serving layer's coalesced requests); ``None`` entries default.

    Multi-speaker models are ALWAYS conditioned in training
    (train/step.py passes the batch's speaker_ids), so decoding one
    unconditioned would be out-of-distribution: when the model is
    multi-speaker and no id is given, default to speaker 0 with a notice.
    Out-of-range ids raise (jnp.take would silently clamp under jit).
    """
    if isinstance(speaker_id, (list, tuple)):
        if len(speaker_id) != batch:
            raise ValueError(f"got {len(speaker_id)} speaker_ids for a "
                             f"batch of {batch}")
        per_item = list(speaker_id)
    else:
        per_item = [speaker_id] * batch
    if cfg.n_speakers <= 1:
        for sid in per_item:
            if sid not in (None, 0):
                raise ValueError(
                    f"speaker_id={sid} given but the model is "
                    f"single-speaker (n_speakers={cfg.n_speakers})")
        return None
    if any(sid is None for sid in per_item):
        # Notice once per process: this runs on serving hot paths (twice
        # per request through the batching service), so an unconditional
        # print would flood the log with duplicates.
        global _warned_default_speaker
        if not _warned_default_speaker:
            _warned_default_speaker = True
            print("[speaker] multi-speaker model, no speaker_id given: "
                  "using speaker 0 (notice printed once)")
    ids = []
    for sid in per_item:
        sid = 0 if sid is None else int(sid)
        if not (0 <= sid < cfg.n_speakers):
            raise ValueError(f"speaker_id={sid} out of range "
                             f"[0, {cfg.n_speakers})")
        ids.append(sid)
    return jnp.asarray(ids, jnp.int32)


def _condition_memory(params: Dict[str, Any], memory: jnp.ndarray,
                      speaker_ids: Optional[jnp.ndarray]) -> jnp.ndarray:
    if "speaker" in params and speaker_ids is not None:
        emb = jnp.take(params["speaker"]["embedding"]["table"], speaker_ids,
                       axis=0)                               # (B, spk_dim)
        memory = memory + linear_apply(params["speaker"]["proj"],
                                       emb)[:, None, :]
    return memory


def tacotron2_forward(params: Dict[str, Any], state: Dict[str, Any],
                      cfg: ModelConfig, text: jnp.ndarray,
                      mel_targets: jnp.ndarray,
                      text_lengths: Optional[jnp.ndarray], rng,
                      train: bool, use_postnet: bool = True,
                      speaker_ids: Optional[jnp.ndarray] = None
                      ) -> Tuple[Tacotron2Output, Dict[str, Any]]:
    """Teacher-forced forward pass.

    Args:
        text: (B, T_enc) int32 token IDs (zero-padded).
        mel_targets: (B, n_mels, T_dec) float32 (reference layout).
        text_lengths: (B,) true lengths; None = assume unpadded
            (reference: src/model.py:462-469).
    Returns:
        (Tacotron2Output, new_state)
    """
    b, t_enc = text.shape
    if train:
        rng_dec, rng_post = jax.random.split(rng)
    else:
        rng_dec = rng_post = jnp.zeros((2,), jnp.uint32)

    memory, enc_state = encoder_apply(params["encoder"], state["encoder"],
                                      text, cfg, train)
    memory = _condition_memory(params, memory, speaker_ids)
    if text_lengths is None:
        text_lengths = jnp.full((b,), t_enc, jnp.int32)
    enc_mask = make_pad_mask(text_lengths, t_enc)

    mel_coarse, gate_logits, alignments = decoder_teacher_forced(
        params["decoder"], cfg, memory, mel_targets, enc_mask, rng_dec, train)

    post_state = state["postnet"]
    if use_postnet:
        residual, post_state = postnet_apply(
            params["postnet"], state["postnet"],
            jnp.swapaxes(mel_coarse, 1, 2), cfg, rng_post, train)
        mel_postnet = mel_coarse + jnp.swapaxes(residual, 1, 2)
    else:
        mel_postnet = mel_coarse  # postnet-freeze bypass

    out = Tacotron2Output(mel_postnet=mel_postnet, mel_coarse=mel_coarse,
                          gate_logits=gate_logits, alignments=alignments)
    return out, {"encoder": enc_state, "postnet": post_state}


def tacotron2_infer(params: Dict[str, Any], state: Dict[str, Any],
                    cfg: ModelConfig, text: jnp.ndarray,
                    max_steps: Optional[int] = None,
                    gate_threshold: Optional[float] = None,
                    drop_first_frame: bool = True,
                    speaker_ids: Optional[jnp.ndarray] = None,
                    text_lengths: Optional[jnp.ndarray] = None,
                    stop_mode: str = "any",
                    forced_stop_at: Optional[jnp.ndarray] = None
                    ) -> Tuple[Tacotron2Output, jnp.ndarray, jnp.ndarray]:
    """Autoregressive inference (eval mode).

    ``text_lengths`` masks padded encoder positions in attention — the
    reference never pads at inference (B=1 exact length, no mask,
    src/model.py:305), so None keeps that exact behavior; padded batch
    callers must pass true lengths.  ``stop_mode`` 'any' reproduces the
    reference's whole-batch stop (src/model.py:327); 'all' decodes until
    every item's gate fires (batched serving).

    Returns (Tacotron2Output with S = max_steps padded time axis,
    n_frames scalar int32 — total decoded frames, frame_ends (B,) int32 —
    per-item frame count at its own gate firing).
    """
    max_steps = cfg.max_decoder_steps if max_steps is None else max_steps
    gate_threshold = (cfg.gate_threshold if gate_threshold is None
                      else gate_threshold)
    dummy_rng = jnp.zeros((2,), jnp.uint32)

    memory, _ = encoder_apply(params["encoder"], state["encoder"], text, cfg,
                              train=False)
    memory = _condition_memory(params, memory, speaker_ids)
    mask = (None if text_lengths is None
            else make_pad_mask(text_lengths, text.shape[1]))
    mel_coarse, gate_logits, alignments, n_frames, frame_ends = decoder_infer(
        params["decoder"], cfg, memory, max_steps, gate_threshold,
        drop_first_frame=drop_first_frame, mask=mask, stop_mode=stop_mode,
        forced_stop_at=forced_stop_at)

    residual, _ = postnet_apply(params["postnet"], state["postnet"],
                                jnp.swapaxes(mel_coarse, 1, 2), cfg,
                                dummy_rng, train=False)
    mel_postnet = mel_coarse + jnp.swapaxes(residual, 1, 2)
    out = Tacotron2Output(mel_postnet=mel_postnet, mel_coarse=mel_coarse,
                          gate_logits=gate_logits, alignments=alignments)
    return out, n_frames, frame_ends


def param_count(params) -> int:
    return sum(int(x.size) for x in jax.tree_util.tree_leaves(params))


import functools as _functools

#: Whole-pipeline jitted inference: encoder + while_loop decode + postnet
#: compile into ONE XLA program (no per-op host dispatch — essential for
#: latency through a remote-tunneled device).
tacotron2_infer_jit = _functools.partial(
    jax.jit, static_argnames=("cfg", "max_steps", "gate_threshold",
                              "drop_first_frame", "stop_mode"))(
    tacotron2_infer)


def cast_params_bf16(params):
    """bfloat16 copy of the weights for serving: halves the per-step HBM
    weight traffic that dominates batch-1 autoregressive decode.  Matmul
    accumulation stays fp32 (preferred_element_type on every dot)."""
    def cast(x):
        if x.dtype == jnp.float32:
            return x.astype(jnp.bfloat16)
        return x
    return jax.tree_util.tree_map(cast, params)
