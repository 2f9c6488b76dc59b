"""Parity tests for the Pallas training-forward megakernel.

`decoder_fwd_train_mega` (ops/decoder_train_kernel.py) replaces the
split-BPTT forward scan; since the custom-VJP backward is shared, the
whole value-and-grad of `decoder_scan_bptt` must match the XLA-scan
path.  On CPU the kernel runs in Pallas interpret mode (fp32 — tight
tolerances); dropout masks must reproduce decode_step's bernoulli draws
bit-exactly for the backward recompute to be consistent.
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tacotron2_tpu.config import ModelConfig
from tacotron2_tpu.models.attention import precompute_memory
from tacotron2_tpu.models.decoder import decoder_init
from tacotron2_tpu.ops.decoder_bptt import (_step_dropout_masks,
                                            decoder_scan_bptt)

SMALL = ModelConfig(n_mels=8, prenet_dim=16, encoder_embedding_dim=32,
                    decoder_rnn_dim=64, attention_rnn_dim=64,
                    attention_dim=16, location_n_filters=4,
                    location_kernel_size=7)
B, T_ENC, T_DEC = 2, 12, 10


@pytest.fixture(scope="module")
def setup():
    os.environ["TACOTRON2_FUSED_ATTENTION"] = "1"
    params = decoder_init(jax.random.PRNGKey(0), SMALL)
    core = {k: params[k] for k in ("attention", "attn_lstm", "dec_lstm",
                                   "proj", "gate")}
    pre = jax.random.normal(jax.random.PRNGKey(1), (T_DEC, B, 16)) * 0.3
    memory = jax.random.normal(jax.random.PRNGKey(2), (B, T_ENC, 32)) * 0.5
    pm = precompute_memory(core["attention"], memory)
    mask = jnp.zeros((B, T_ENC), bool).at[1, 9:].set(True)
    keys = jax.random.split(jax.random.PRNGKey(7), T_DEC)
    yield core, pre, memory, pm, mask, keys
    os.environ.pop("TACOTRON2_FUSED_ATTENTION", None)
    os.environ.pop("TACOTRON2_MEGA_TRAIN", None)


def run_both(setup_vals, loss_fn):
    """Value-and-grad through BOTH Pallas kernels (forward + reverse
    dx-chain, ops/decoder_bwd_kernel.py) vs the XLA scan path —
    differentiating w.r.t. params AND the prenet/memory/pm inputs so
    every cotangent the custom backward emits is compared."""
    core, pre, memory, pm, mask, keys = setup_vals

    def loss(c, p_in, m_in, pm_in):
        out = decoder_scan_bptt(SMALL, c, p_in, m_in, pm_in, mask, keys)
        return loss_fn(out)

    res = {}
    for flag in ("0", "1"):
        os.environ["TACOTRON2_MEGA_TRAIN"] = flag
        jax.clear_caches()
        res[flag] = jax.value_and_grad(loss, argnums=(0, 1, 2, 3))(
            core, pre, memory, pm)
    return res["0"], res["1"]


class TestTrainKernelParity:
    def test_value_and_grad(self, setup):
        (l0, g0), (l1, g1) = run_both(
            setup, lambda out: (jnp.sum(out[0] ** 2) + jnp.sum(out[1] ** 2)
                                + jnp.sum(out[2] ** 2) * 0.1))
        assert abs(float(l1) - float(l0)) < 1e-3 * abs(float(l0))
        leaves0 = jax.tree_util.tree_leaves_with_path(g0)
        leaves1 = dict(jax.tree_util.tree_leaves_with_path(g1))
        gscale = max(float(jnp.max(jnp.abs(v))) for _, v in leaves0)
        for path, v0 in leaves0:
            d = float(jnp.max(jnp.abs(leaves1[path] - v0)))
            rel = d / (float(jnp.max(jnp.abs(v0))) + 1e-3 * gscale)
            assert rel < 1e-3, (jax.tree_util.keystr(path), rel)

    def test_forward_outputs_match(self, setup):
        core, pre, memory, pm, mask, keys = setup
        outs = {}
        for flag in ("0", "1"):
            os.environ["TACOTRON2_MEGA_TRAIN"] = flag
            jax.clear_caches()
            outs[flag] = decoder_scan_bptt(SMALL, core, pre, memory, pm,
                                           mask, keys)
        for i, name in enumerate(("mels", "gates", "attns")):
            err = float(jnp.max(jnp.abs(outs["0"][i] - outs["1"][i])))
            assert err < 3e-5, (name, err)

    def test_dropout_masks_match_decode_step(self, setup):
        """The precomputed masks must equal decode_step's bernoulli
        draws bit-exactly (the backward recompute depends on it)."""
        _, _, _, _, _, keys = setup
        mka, mkd = _step_dropout_masks(SMALL, keys, B, SMALL.decoder_rnn_dim)
        for t in range(T_DEC):
            r_att, r_dec = jax.random.split(keys[t])
            ref_a = jax.random.bernoulli(r_att,
                                         1.0 - SMALL.p_attention_dropout,
                                         (B, SMALL.decoder_rnn_dim))
            ref_d = jax.random.bernoulli(r_dec,
                                         1.0 - SMALL.p_decoder_dropout,
                                         (B, SMALL.decoder_rnn_dim))
            np.testing.assert_array_equal(np.asarray(mka[t]),
                                          np.asarray(ref_a))
            np.testing.assert_array_equal(np.asarray(mkd[t]),
                                          np.asarray(ref_d))


class TestBf16PolicyParity:
    """Kernel-vs-scan parity under the DEFAULT TPU policy (bf16 compute
    dtype) — the configuration the fp32 tests above never exercise.

    The forward kernel streams PRE-activation gate stacks and attention
    qsum rows (the rounded values its own tanh consumed), so the reverse
    kernel re-derives every sigmoid/tanh in fp32 from rounded INPUTS —
    perturbing saturated Jacobian factors by a ~2^-8 relative factor
    instead of snapping them to exactly zero as rounded OUTPUTS would;
    the residual kernel-vs-scan drift is that input rounding plus the
    banded-conv reassociation and bf16 matmul rounding, bounded by the
    tolerances pinned here (measured ~1e-2 worst relative leaf)."""

    def _bf16_core(self, setup_vals):
        core, pre, memory, pm, mask, keys = setup_vals
        core16 = jax.tree_util.tree_map(
            lambda p: p.astype(jnp.bfloat16)
            if p.dtype == jnp.float32 else p, core)
        return core16, pre, memory, pm, mask, keys

    def test_value_and_grad_bf16(self, setup):
        (l0, g0), (l1, g1) = run_both(
            self._bf16_core(setup),
            lambda out: (jnp.sum(out[0] ** 2) + jnp.sum(out[1] ** 2)
                         + jnp.sum(out[2] ** 2) * 0.1))
        assert abs(float(l1) - float(l0)) < 2e-2 * abs(float(l0))
        leaves0 = jax.tree_util.tree_leaves_with_path(g0)
        leaves1 = dict(jax.tree_util.tree_leaves_with_path(g1))
        gscale = max(float(jnp.max(jnp.abs(v.astype(jnp.float32))))
                     for _, v in leaves0)
        for path, v0 in leaves0:
            v0 = v0.astype(jnp.float32)
            v1 = leaves1[path].astype(jnp.float32)
            d = float(jnp.max(jnp.abs(v1 - v0)))
            rel = d / (float(jnp.max(jnp.abs(v0))) + 1e-2 * gscale)
            assert rel < 5e-2, (jax.tree_util.keystr(path), rel)

    def test_saturated_gates_keep_gradients_bf16(self, setup):
        """Drive the LSTM gates toward saturation (large input biases)
        and check the kernel path's LSTM weight gradients track the scan
        path instead of collapsing — the failure mode of streaming
        post-activation stacks in bf16, where sigmoid outputs within
        2^-9 of 1 round to exactly 1 and ia*(1-ia) becomes exactly 0."""
        core, pre, memory, pm, mask, keys = self._bf16_core(setup)
        sat = dict(core)
        for k in ("attn_lstm", "dec_lstm"):
            sat[k] = dict(core[k])
            # push input/forget-gate pre-activations to ~|6..8|: the
            # region where fp32 keeps derivative factors ~1e-3 but a
            # bf16-rounded activation zeroes them
            h = SMALL.decoder_rnn_dim
            bi = core[k]["bi"].astype(jnp.float32)
            bi = bi.at[:h].add(7.0).at[h:2 * h].add(-7.0)
            sat[k]["bi"] = bi.astype(core[k]["bi"].dtype)

        def loss(c, p_in, m_in, pm_in):
            out = decoder_scan_bptt(SMALL, c, p_in, m_in, pm_in, mask, keys)
            return jnp.sum(out[0] ** 2) + jnp.sum(out[1] ** 2)

        res = {}
        for flag in ("0", "1"):
            os.environ["TACOTRON2_MEGA_TRAIN"] = flag
            jax.clear_caches()
            res[flag] = jax.grad(loss)(sat, pre, memory, pm)
        for k in ("attn_lstm", "dec_lstm"):
            for w in ("wi", "wh"):
                v0 = res["0"][k][w].astype(jnp.float32)
                v1 = res["1"][k][w].astype(jnp.float32)
                n0 = float(jnp.linalg.norm(v0))
                assert n0 > 0.0
                # the kernel must retain the gradient mass (no silent
                # saturation collapse) and track the scan direction
                assert float(jnp.linalg.norm(v1)) > 0.5 * n0, (k, w)
                rel = float(jnp.linalg.norm(v1 - v0)) / n0
                assert rel < 5e-2, (k, w, rel)


class TestEnabledGating:
    def test_cleared_config_beats_env_force(self, monkeypatch):
        """Same contract as the inference kernel: a cleared
        cfg.decoder_megakernel (mesh gating) is authoritative over
        TACOTRON2_MEGA_TRAIN=1 (which exists to skip the TPU-backend
        check for interpret-mode tests, not to override mesh gating)."""
        import dataclasses

        from tacotron2_tpu.ops.decoder_train_kernel import (
            train_megakernel_enabled)
        off = dataclasses.replace(SMALL, decoder_megakernel=False)
        monkeypatch.setenv("TACOTRON2_MEGA_TRAIN", "1")
        assert not train_megakernel_enabled(off, 4, 32, jnp.float32)
        monkeypatch.delenv("TACOTRON2_MEGA_TRAIN")
        assert not train_megakernel_enabled(off, 4, 32, jnp.float32)

    def test_vmem_falloff_warns(self, monkeypatch):
        """r5: the training VMEM gate logs the fall-off to the ~2.5x
        slower split-BPTT scan (measured at B=128/T_enc=256), matching
        the decode kernel's r4-item-7 warning."""
        import logging

        from tacotron2_tpu.config import ModelConfig as MC
        from tacotron2_tpu.ops import decoder_train_kernel as tk
        monkeypatch.setattr(tk.jax, "default_backend", lambda: "tpu")
        monkeypatch.delenv("TACOTRON2_MEGA_TRAIN", raising=False)
        monkeypatch.setenv("TACOTRON2_FUSED_ATTENTION", "1")
        tk._warn_train_vmem_falloff.cache_clear()
        records = []
        handler = logging.Handler()
        handler.emit = lambda r: records.append(r)
        logging.getLogger("tacotron2_tpu").addHandler(handler)
        try:
            assert not tk.train_megakernel_enabled(MC(), 128, 256,
                                                   jnp.bfloat16)
        finally:
            logging.getLogger("tacotron2_tpu").removeHandler(handler)
        assert any("TRAIN megakernel VMEM gate" in r.getMessage()
                   for r in records), records
