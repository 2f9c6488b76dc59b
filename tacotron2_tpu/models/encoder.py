"""Tacotron 2 encoder: embedding -> conv stack -> BiLSTM.

Functional re-design of the reference encoder (reference: src/model.py:8-77):
  * 512-dim phoneme embedding over the 72-symbol table,
  * 3 x [Conv1d(512, 512, k=5, same) + BatchNorm + ReLU]  (no dropout —
    the reference applies none here),
  * single-layer BiLSTM 512 -> 2 x 256, run as two ``lax.scan``s over the
    full padded length (matching the reference's unpacked ``nn.LSTM``).

Outputs the attention memory (B, T_enc, 512).
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp

from ..config import ModelConfig
from .layers import (batchnorm_apply, batchnorm_init, bilstm_apply,
                     bilstm_init, conv1d_apply, conv1d_init, embedding_apply,
                     embedding_init)


def encoder_init(key, cfg: ModelConfig) -> Tuple[Dict[str, Any], Dict[str, Any]]:
    """Returns (params, state) — state carries BatchNorm running stats."""
    keys = jax.random.split(key, 2 + cfg.encoder_n_convolutions)
    params: Dict[str, Any] = {
        "embedding": embedding_init(keys[0], cfg.n_symbols,
                                    cfg.symbols_embedding_dim),
        "convs": [],
        "bn": [],
        "bilstm": bilstm_init(keys[1], cfg.encoder_embedding_dim,
                              cfg.encoder_embedding_dim // 2),
    }
    state: Dict[str, Any] = {"bn": []}
    for i in range(cfg.encoder_n_convolutions):
        params["convs"].append(conv1d_init(
            keys[2 + i], cfg.encoder_embedding_dim, cfg.encoder_embedding_dim,
            cfg.encoder_kernel_size))
        bn_p, bn_s = batchnorm_init(cfg.encoder_embedding_dim)
        params["bn"].append(bn_p)
        state["bn"].append(bn_s)
    return params, state


def encoder_apply(params: Dict[str, Any], state: Dict[str, Any],
                  tokens: jnp.ndarray, cfg: ModelConfig, train: bool
                  ) -> Tuple[jnp.ndarray, Dict[str, Any]]:
    """tokens (B, T_enc) int32 -> (memory (B, T_enc, 512), new_state)."""
    x = embedding_apply(params["embedding"], tokens)      # (B, T, D)
    x = jnp.swapaxes(x, 1, 2)                             # (B, D, T) for conv
    new_bn = []
    from ..ops.convbn_kernel import conv_bn_act_pallas, fused_convbn_enabled
    fused_eval = not train and fused_convbn_enabled()
    for conv_p, bn_p, bn_s in zip(params["convs"], params["bn"], state["bn"]):
        if fused_eval:
            x = conv_bn_act_pallas(conv_p=conv_p, bn_p=bn_p, bn_s=bn_s, x=x,
                                   eps=cfg.batchnorm_eps, act="relu")
            new_bn.append(bn_s)
            continue
        x = conv1d_apply(conv_p, x, padding="same")
        x, bn_s2 = batchnorm_apply(bn_p, bn_s, x, train,
                                   momentum=cfg.batchnorm_momentum,
                                   eps=cfg.batchnorm_eps)
        x = jax.nn.relu(x)
        new_bn.append(bn_s2)
    x = jnp.swapaxes(x, 1, 2)                             # (B, T, D)
    memory = bilstm_apply(params["bilstm"], x)            # (B, T, D)
    return memory, {"bn": new_bn}
