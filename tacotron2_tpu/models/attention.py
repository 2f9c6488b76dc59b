"""Location-sensitive attention as pure functions with explicit carried state.

Functional re-design of the reference's stateful attention module
(reference: src/model.py:80-148).  The module attributes the reference
mutates per step (``prev_attn``, ``cum_attn``, ``processed_memory``,
``mask`` — src/model.py:104-115,143-145) become explicit values: the
processed memory and mask are precomputed once per utterance, and
``(prev_attn, cum_attn)`` ride the decoder scan carry.

Energy formula (src/model.py:117-133):
    e = energy_scale * v . tanh(W_q q + W_m memory + W_l F(prev, cum))
with a 2-channel (previous + cumulative) location conv of 32 filters,
kernel 31, and additive -1e9 masking of encoder padding.  ``energy_scale``
is a learnable scalar initialized at 1.2 (a deliberate reference deviation
from the paper).
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from ..config import ModelConfig
from .layers import conv1d_apply, conv1d_init, linear_apply, linear_init


class AttentionState(NamedTuple):
    """Per-utterance attention recurrence state (carried through the scan)."""
    prev_attn: jnp.ndarray  # (B, T_enc)
    cum_attn: jnp.ndarray   # (B, T_enc)


def attention_init(key, cfg: ModelConfig) -> Dict[str, Any]:
    k1, k2, k3, k4, k5 = jax.random.split(key, 5)
    return {
        "query": linear_init(k1, cfg.attention_rnn_dim, cfg.attention_dim,
                             bias=False),
        "memory": linear_init(k2, cfg.encoder_embedding_dim,
                              cfg.attention_dim, bias=False),
        "location_conv": conv1d_init(k3, 2, cfg.location_n_filters,
                                     cfg.location_kernel_size, bias=False),
        "location_dense": linear_init(k4, cfg.location_n_filters,
                                      cfg.attention_dim, bias=False),
        "v": linear_init(k5, cfg.attention_dim, 1, bias=True),
        "energy_scale": jnp.asarray(cfg.energy_scale_init, jnp.float32),
    }


def attention_init_state(batch: int, t_enc: int) -> AttentionState:
    return AttentionState(prev_attn=jnp.zeros((batch, t_enc), jnp.float32),
                          cum_attn=jnp.zeros((batch, t_enc), jnp.float32))


def precompute_memory(params: Dict[str, Any],
                      memory: jnp.ndarray) -> jnp.ndarray:
    """W_m @ memory, computed once per utterance (B, T_enc, attn_dim)."""
    return linear_apply(params["memory"], memory)


def attention_energies(params: Dict[str, Any], query: jnp.ndarray,
                       processed_memory: jnp.ndarray,
                       att_state: AttentionState,
                       mask: Optional[jnp.ndarray]) -> jnp.ndarray:
    """Alignment energies (B, T_enc) for one decoder step."""
    processed_query = linear_apply(params["query"], query)[:, None, :]
    loc_in = jnp.stack([att_state.prev_attn, att_state.cum_attn], axis=1)
    loc = conv1d_apply(params["location_conv"], loc_in, padding="same")
    loc = jnp.swapaxes(loc, 1, 2)                       # (B, T_enc, F)
    loc = linear_apply(params["location_dense"], loc)   # (B, T_enc, attn_dim)
    energies = linear_apply(
        params["v"], jnp.tanh(processed_query + processed_memory + loc))
    energies = energies[..., 0] * params["energy_scale"]
    if mask is not None:
        energies = jnp.where(mask, -1e9, energies)
    return energies


def _fused_tail_enabled() -> bool:
    """Use the Pallas fused energies+softmax+context kernel?

    Controlled by TACOTRON2_FUSED_ATTENTION: "1"/"0" to force, unset =
    auto (on for TPU backends)."""
    import os
    flag = os.environ.get("TACOTRON2_FUSED_ATTENTION")
    if flag is not None:
        return flag not in ("0", "false", "no")
    return jax.default_backend() == "tpu"


def attention_step(params: Dict[str, Any], query: jnp.ndarray,
                   memory: jnp.ndarray, processed_memory: jnp.ndarray,
                   att_state: AttentionState,
                   mask: Optional[jnp.ndarray]
                   ) -> Tuple[jnp.ndarray, jnp.ndarray, AttentionState]:
    """One attention step.

    Returns (context (B, D_enc), attn_weights (B, T_enc), new_state).
    """
    if _fused_tail_enabled():
        from ..ops.attention_kernel import attention_tail
        processed_query = linear_apply(params["query"], query)[:, None, :]
        loc_in = jnp.stack([att_state.prev_attn, att_state.cum_attn], axis=1)
        loc = conv1d_apply(params["location_conv"], loc_in, padding="same")
        loc = linear_apply(params["location_dense"], jnp.swapaxes(loc, 1, 2))
        qsum = processed_query + processed_memory + loc
        # Under the bf16 training policy, store the attention tail's input
        # (its autodiff residual) in bf16: qsum is the LARGEST per-step
        # residual of the whole decoder scan — (T_dec, B, T_enc, attn_dim)
        # once stacked, 8 GB fp32 at (512, 256, 128, 128) — and the kernel
        # upcasts to fp32 internally before tanh/softmax anyway.
        qsum = qsum.astype(params["v"]["w"].dtype)
        if mask is None:
            mask = jnp.zeros(qsum.shape[:2], bool)
        # ``memory`` is passed fp32 even under the bf16 policy (the kernel
        # downcasts it internally, forward-only): the custom-VJP boundary
        # keeps fp32 primals so ``d_memory`` — the encoder's entire
        # gradient signal, summed over every decode step — never rounds
        # through bf16.
        attn, context = attention_tail(
            qsum, params["v"]["w"][:, 0], params["v"]["b"][0],
            params["energy_scale"], mask, memory)
    else:
        energies = attention_energies(params, query, processed_memory,
                                      att_state, mask)
        attn = jax.nn.softmax(energies, axis=1)
        context = jnp.einsum("bt,btd->bd", attn, memory)
    return context, attn, AttentionState(prev_attn=attn,
                                         cum_attn=att_state.cum_attn + attn)
