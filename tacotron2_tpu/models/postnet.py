"""PostNet: 5-layer conv refinement predicting a mel residual.

Functional re-design of the reference PostNet (reference: src/model.py:336-407):
80 -> 512 -> 512 -> 512 -> 512 -> 80 channels, kernel 5, BatchNorm on every
layer, tanh on all but the last, dropout 0.5 on every layer (training only).
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp

from ..config import ModelConfig
from .layers import batchnorm_apply, batchnorm_init, conv1d_apply, \
    conv1d_init, dropout


def postnet_init(key, cfg: ModelConfig) -> Tuple[Dict[str, Any], Dict[str, Any]]:
    n = cfg.postnet_n_convolutions
    keys = jax.random.split(key, n)
    dims = ([cfg.n_mels] + [cfg.postnet_embedding_dim] * (n - 1),
            [cfg.postnet_embedding_dim] * (n - 1) + [cfg.n_mels])
    params: Dict[str, Any] = {"convs": [], "bn": []}
    state: Dict[str, Any] = {"bn": []}
    for i in range(n):
        params["convs"].append(conv1d_init(
            keys[i], dims[0][i], dims[1][i], cfg.postnet_kernel_size))
        bn_p, bn_s = batchnorm_init(dims[1][i])
        params["bn"].append(bn_p)
        state["bn"].append(bn_s)
    return params, state


def postnet_apply(params: Dict[str, Any], state: Dict[str, Any],
                  x: jnp.ndarray, cfg: ModelConfig, rng, train: bool
                  ) -> Tuple[jnp.ndarray, Dict[str, Any]]:
    """x: (B, n_mels, T) coarse mel -> (residual (B, n_mels, T), new_state)."""
    n = len(params["convs"])
    new_bn = []
    from ..ops.convbn_kernel import conv_bn_act_pallas, fused_convbn_enabled
    fused_eval = not train and fused_convbn_enabled()
    # Training under a bf16 policy keeps the INTER-layer activations in
    # the compute dtype: every (B, 512, T) tensor between convs (and its
    # backward cotangent) moves at half bandwidth, while BN statistics
    # still accumulate fp32 (batchnorm_apply) and the final residual
    # emits fp32 for the loss.  Eval keeps fp32 intermediates (serving
    # precision is governed by its own casts).
    cdt = params["convs"][0]["w"].dtype
    mid_dtype = cdt if (train and cdt != jnp.float32) else None
    for i, (conv_p, bn_p, bn_s) in enumerate(
            zip(params["convs"], params["bn"], state["bn"])):
        if fused_eval:
            x = conv_bn_act_pallas(conv_p=conv_p, bn_p=bn_p, bn_s=bn_s, x=x,
                                   eps=cfg.batchnorm_eps,
                                   act="tanh" if i < n - 1 else "none")
            new_bn.append(bn_s)
            continue
        x = conv1d_apply(conv_p, x, padding="same",
                         out_dtype=mid_dtype if i < n - 1 else None)
        x, bn_s2 = batchnorm_apply(bn_p, bn_s, x, train,
                                   momentum=cfg.batchnorm_momentum,
                                   eps=cfg.batchnorm_eps)
        if i < n - 1:
            x = jnp.tanh(x)
        if train:
            rng, sub = jax.random.split(rng)
            x = dropout(sub, x, cfg.p_postnet_dropout, train)
        new_bn.append(bn_s2)
    return x, {"bn": new_bn}
