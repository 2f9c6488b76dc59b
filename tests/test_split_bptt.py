"""Split-BPTT decoder backward (ops/decoder_bptt.py) vs plain autodiff.

The custom backward must reproduce the autodiff gradients of the SAME
forward scan: the dx chain recomputes activations from stored carries and
the weight-gradient contractions are hoisted out of the loop, so any
mismatch is a bookkeeping bug, not an approximation.  Parity is checked
at the decoder level (grads w.r.t. every decoder param, the encoder
memory, and the processed memory) and end-to-end through train_step
(prenet + memory-projection + encoder cotangents included), with dropout
ACTIVE (the backward re-derives the dropout masks from the per-step
keys) and with encoder padding masks, on both the pure-jnp and the
fused-Pallas attention tails.
"""

import dataclasses
import functools

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tacotron2_tpu.config import Config, ModelConfig
from tacotron2_tpu.models.decoder import decoder_init, decoder_teacher_forced
from tacotron2_tpu.ops.decoder_bptt import split_bptt_enabled

BASE = ModelConfig(
    symbols_embedding_dim=32, encoder_embedding_dim=32, decoder_rnn_dim=48,
    prenet_dim=16, attention_rnn_dim=48, attention_dim=24,
    location_n_filters=8, location_kernel_size=15,
    postnet_embedding_dim=24, max_decoder_steps=40)

B, T_ENC, T_DEC = 3, 9, 14


def _inputs(cfg, seed=0):
    rng = np.random.default_rng(seed)
    memory = jnp.asarray(
        rng.standard_normal((B, T_ENC, cfg.encoder_embedding_dim)),
        jnp.float32)
    mel_t = jnp.asarray(rng.standard_normal((B, cfg.n_mels, T_DEC)) - 5.0,
                        jnp.float32)
    mask = jnp.asarray([[False] * T_ENC,
                        [False] * 7 + [True] * (T_ENC - 7),
                        [False] * 5 + [True] * (T_ENC - 5)])
    w_mel = jnp.asarray(rng.standard_normal((B, T_DEC, cfg.n_mels)),
                        jnp.float32)
    w_gate = jnp.asarray(rng.standard_normal((B, T_DEC)), jnp.float32)
    w_att = jnp.asarray(rng.standard_normal((B, T_DEC, T_ENC)), jnp.float32)
    return memory, mel_t, mask, (w_mel, w_gate, w_att)


def _decoder_grads(cfg, use_mask=True, seed=0):
    params = decoder_init(jax.random.PRNGKey(7), cfg)
    memory, mel_t, mask, (w_mel, w_gate, w_att) = _inputs(cfg, seed)

    def loss(params, memory):
        mels, gates, aligns = decoder_teacher_forced(
            params, cfg, memory, mel_t, mask if use_mask else None,
            jax.random.PRNGKey(3), train=True)
        # generic cotangents on every output
        return (jnp.sum(mels * w_mel) + jnp.sum(gates * w_gate)
                + jnp.sum(aligns * w_att))

    val, grads = jax.jit(jax.value_and_grad(loss, argnums=(0, 1)))(
        params, memory)
    return float(val), grads


def _assert_tree_close(a, b, rtol, atol):
    flat_a = jax.tree_util.tree_leaves_with_path(a)
    flat_b = jax.tree_util.tree_leaves(b)
    assert len(flat_a) == len(flat_b)
    for (path, ga), gb in zip(flat_a, flat_b):
        np.testing.assert_allclose(
            np.asarray(ga, np.float32), np.asarray(gb, np.float32),
            rtol=rtol, atol=atol,
            err_msg=jax.tree_util.keystr(path))


@pytest.mark.parametrize("fused", [False, True],
                         ids=["jnp-tail", "pallas-tail"])
@pytest.mark.parametrize("use_mask", [True, False],
                         ids=["masked", "unmasked"])
def test_decoder_grads_match_autodiff(monkeypatch, fused, use_mask):
    monkeypatch.delenv("TACOTRON2_SPLIT_BPTT", raising=False)
    monkeypatch.setenv("TACOTRON2_FUSED_ATTENTION", "1" if fused else "0")
    cfg_split = dataclasses.replace(BASE, decoder_split_bptt=True)
    cfg_plain = dataclasses.replace(BASE, decoder_split_bptt=False)
    assert split_bptt_enabled(cfg_split) and not split_bptt_enabled(cfg_plain)

    val_s, grads_s = _decoder_grads(cfg_split, use_mask=use_mask)
    val_p, grads_p = _decoder_grads(cfg_plain, use_mask=use_mask)

    # identical forward (same scan), so the loss values agree tightly
    assert np.isclose(val_s, val_p, rtol=1e-6)
    # fp32 recompute from stored carries: gradients agree to float noise
    _assert_tree_close(grads_s, grads_p, rtol=2e-4, atol=2e-5)


def test_dropout_mask_recompute_is_exact(monkeypatch):
    """With dropout rates cranked up, any key-split mismatch between the
    forward's decode_step and the backward's recompute would zero/scale
    DIFFERENT elements and blow gradients far past tolerance."""
    monkeypatch.delenv("TACOTRON2_SPLIT_BPTT", raising=False)
    monkeypatch.setenv("TACOTRON2_FUSED_ATTENTION", "0")
    hot = dict(p_attention_dropout=0.4, p_decoder_dropout=0.4)
    val_s, grads_s = _decoder_grads(
        dataclasses.replace(BASE, decoder_split_bptt=True, **hot))
    val_p, grads_p = _decoder_grads(
        dataclasses.replace(BASE, decoder_split_bptt=False, **hot))
    assert np.isclose(val_s, val_p, rtol=1e-6)
    _assert_tree_close(grads_s, grads_p, rtol=2e-4, atol=2e-5)


def test_env_kill_switch(monkeypatch):
    cfg = dataclasses.replace(BASE, decoder_split_bptt=True)
    monkeypatch.setenv("TACOTRON2_SPLIT_BPTT", "0")
    assert not split_bptt_enabled(cfg)
    monkeypatch.setenv("TACOTRON2_SPLIT_BPTT", "1")
    assert split_bptt_enabled(
        dataclasses.replace(BASE, decoder_split_bptt=False))
    monkeypatch.delenv("TACOTRON2_SPLIT_BPTT")
    # explicit remat request wins over the default-on split path
    assert not split_bptt_enabled(
        dataclasses.replace(BASE, remat_decoder_step=True))


def _train_step_once(model_cfg, precision="float32"):
    from tacotron2_tpu.train import (create_train_state, make_optimizer,
                                     train_step)
    cfg = Config(model=model_cfg)
    cfg = dataclasses.replace(
        cfg, train=dataclasses.replace(cfg.train, precision=precision))
    rng = np.random.default_rng(0)
    batch = {
        "text": jnp.asarray(rng.integers(1, 72, (2, 8)), jnp.int32),
        "text_lengths": jnp.asarray([8, 6], jnp.int32),
        "mel": jnp.asarray(rng.standard_normal((2, 80, 16)) - 5.0,
                           jnp.float32),
        "mel_lengths": jnp.asarray([16, 12], jnp.int32),
        "speaker_ids": jnp.zeros((2,), jnp.int32),
    }
    state = create_train_state(cfg, seed=0)
    tx = make_optimizer(cfg.train)
    state, losses, _ = train_step(state, batch, cfg=cfg, tx=tx,
                                  use_postnet=True, sigma_warmup_steps=800)
    return float(losses.total), state.params


def test_train_step_end_to_end_parity(monkeypatch):
    """Through the full training objective: prenet, memory-projection,
    encoder and embedding gradients all flow through the custom-VJP
    boundary's input cotangents.  Compares the raw gradients (comparing
    post-Adam params instead would amplify float noise on near-zero
    gradients by 1/(|g|+eps))."""
    from tacotron2_tpu.train import create_train_state
    from tacotron2_tpu.train.step import _forward_loss

    monkeypatch.delenv("TACOTRON2_SPLIT_BPTT", raising=False)
    monkeypatch.setenv("TACOTRON2_FUSED_ATTENTION", "0")
    rng = np.random.default_rng(0)
    batch = {
        "text": jnp.asarray(rng.integers(1, 72, (2, 8)), jnp.int32),
        "text_lengths": jnp.asarray([8, 6], jnp.int32),
        "mel": jnp.asarray(rng.standard_normal((2, 80, 16)) - 5.0,
                           jnp.float32),
        "mel_lengths": jnp.asarray([16, 12], jnp.int32),
        "speaker_ids": jnp.zeros((2,), jnp.int32),
    }
    out = {}
    for name, split in (("split", True), ("plain", False)):
        cfg = Config(model=dataclasses.replace(
            BASE, decoder_split_bptt=split))
        # pin fp32: the session default is the bf16 policy, under which
        # BOTH backward implementations quantize at bf16 ulp and tight
        # comparison is meaningless (covered by the bf16 test below)
        cfg = dataclasses.replace(
            cfg, train=dataclasses.replace(cfg.train, precision="float32"))
        state = create_train_state(cfg, seed=0)
        grads, (losses, _, _) = jax.jit(
            jax.grad(_forward_loss, has_aux=True),
            static_argnames=("cfg", "use_postnet", "sigma_warmup_steps"))(
            state.params, state.model_state, cfg, batch,
            jax.random.PRNGKey(5), state.loss_step, True, 800)
        out[name] = (float(losses.total), grads)
    assert np.isclose(out["split"][0], out["plain"][0], rtol=1e-6)
    # atol floor: scalar grads (energy_scale) sum thousands of cancelling
    # fp32 terms in different orders -> a few e-5 of cancellation noise.
    _assert_tree_close(out["split"][1], out["plain"][1],
                       rtol=2e-4, atol=5e-5)


def test_train_step_bf16_policy_runs_and_tracks_fp32(monkeypatch):
    """Under the bf16 compute policy the split backward's gate gradients
    round through bf16 exactly once (same class of rounding as autodiff at
    the bf16 leaves) — parity vs the autodiff bf16 path is loose but the
    path must run and stay in the same neighborhood."""
    monkeypatch.delenv("TACOTRON2_SPLIT_BPTT", raising=False)
    monkeypatch.setenv("TACOTRON2_FUSED_ATTENTION", "0")
    loss_s, params_s = _train_step_once(
        dataclasses.replace(BASE, decoder_split_bptt=True), "bfloat16")
    loss_p, params_p = _train_step_once(
        dataclasses.replace(BASE, decoder_split_bptt=False), "bfloat16")
    assert np.isfinite(loss_s)
    assert np.isclose(loss_s, loss_p, rtol=1e-4)
    # bf16 rounding differs step-by-step between the two backward
    # implementations; bound the drift of one optimizer step instead of
    # elementwise equality.
    def nrm(t):
        return np.sqrt(sum(float(jnp.sum(jnp.square(
            x.astype(jnp.float32)))) for x in jax.tree_util.tree_leaves(t)))
    diff = jax.tree_util.tree_map(
        lambda a, b: a.astype(jnp.float32) - b.astype(jnp.float32),
        params_s, params_p)
    assert nrm(diff) / nrm(params_p) < 5e-4


def test_memory_residuals_not_stacked(monkeypatch):
    """The point of the exercise: the split path's backward must NOT carry
    the (T, B, T_enc, attn_dim) qsum residual or per-step weight-gradient
    accumulators.  Check the compiled HLO allocates no buffer of the qsum
    residual's stacked size."""
    monkeypatch.delenv("TACOTRON2_SPLIT_BPTT", raising=False)
    monkeypatch.setenv("TACOTRON2_FUSED_ATTENTION", "0")
    cfg = dataclasses.replace(BASE, decoder_split_bptt=True)
    params = decoder_init(jax.random.PRNGKey(7), cfg)
    memory, mel_t, mask, (w_mel, w_gate, w_att) = _inputs(cfg)

    def loss(params):
        mels, gates, aligns = decoder_teacher_forced(
            params, cfg, memory, mel_t, mask, jax.random.PRNGKey(3),
            train=True)
        return jnp.sum(mels * w_mel) + jnp.sum(gates * w_gate)

    txt = jax.jit(jax.grad(loss)).lower(params).compile().as_text()
    qsum_stacked = f"{T_DEC},{B},{T_ENC},{cfg.attention_dim}"
    assert qsum_stacked not in txt, "stacked qsum residual survived"
