"""Pallas kernel tests (interpret mode on CPU; the same code compiles for
TPU).  Each kernel must match its pure-jnp reference implementation.
"""

import numpy as np
import pytest

import jax.numpy as jnp

import jax

from tacotron2_tpu.ops.attention_kernel import (attention_tail,
                                                attention_tail_pallas,
                                                attention_tail_reference)
from tacotron2_tpu.ops.convbn_kernel import (conv_bn_act_pallas,
                                             conv_bn_act_reference)


class TestAttentionTailKernel:
    def _inputs(self, b=8, t=128, a=128, d=512, seed=0):
        rng = np.random.default_rng(seed)
        qsum = rng.standard_normal((b, t, a)).astype(np.float32)
        v_w = rng.standard_normal((a,)).astype(np.float32)
        v_b = np.float32(0.3)
        scale = np.float32(1.2)
        mask = np.zeros((b, t), bool)
        mask[1, t - 17:] = True
        memory = rng.standard_normal((b, t, d)).astype(np.float32)
        return (jnp.asarray(qsum), jnp.asarray(v_w), jnp.asarray(v_b),
                jnp.asarray(scale), jnp.asarray(mask), jnp.asarray(memory))

    def test_matches_reference(self):
        args = self._inputs()
        attn_ref, ctx_ref = attention_tail_reference(*args)
        attn, ctx = attention_tail_pallas(*args)
        np.testing.assert_allclose(np.asarray(attn), np.asarray(attn_ref),
                                   atol=1e-5)
        np.testing.assert_allclose(np.asarray(ctx), np.asarray(ctx_ref),
                                   atol=1e-4)

    def test_masked_positions_zero(self):
        args = self._inputs()
        attn, _ = attention_tail_pallas(*args)
        assert np.asarray(attn)[1, -17:].max() < 1e-6
        np.testing.assert_allclose(np.asarray(attn).sum(-1), 1.0, atol=1e-5)

    def test_uneven_batch_blocks(self):
        # b=6: whole-batch block (b < 8).  b=12: divisor path (blk=6, no
        # padding).  b=13: no divisor >= 4 -> pads the batch to 16 and
        # slices the padded softmax rows back off.  b=3: b < 4 edge.
        for b in (6, 12, 13, 3):
            args = self._inputs(b=b)
            attn_ref, ctx_ref = attention_tail_reference(*args)
            attn, ctx = attention_tail_pallas(*args)
            assert attn.shape == (b, args[0].shape[1])
            np.testing.assert_allclose(np.asarray(attn),
                                       np.asarray(attn_ref), atol=1e-5)
            np.testing.assert_allclose(np.asarray(ctx), np.asarray(ctx_ref),
                                       atol=1e-4)

    def test_bf16_qsum_keeps_fp32_memory_grad(self):
        # Under the bf16 policy the caller casts qsum down but passes
        # memory fp32; the kernel downcasts memory internally
        # (forward-only) and d_memory must come back fp32.
        qsum, v_w, v_b, scale, mask, memory = self._inputs(b=4, t=64, d=128)
        qsum = qsum.astype(jnp.bfloat16)

        def loss(memory):
            attn, ctx = attention_tail(qsum, v_w, v_b, scale, mask, memory)
            return jnp.sum(jnp.tanh(ctx))

        g = jax.grad(loss)(memory)
        assert g.dtype == jnp.float32

        def loss_ref(memory):
            attn, ctx = attention_tail_reference(
                qsum.astype(jnp.float32), v_w, v_b, scale, mask, memory)
            return jnp.sum(jnp.tanh(ctx))

        g_ref = jax.grad(loss_ref)(memory)
        np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref),
                                   atol=2e-2, rtol=2e-2)

    def test_custom_vjp_matches_reference_grads(self):
        qsum, v_w, v_b, scale, mask, memory = self._inputs(b=4, t=64, d=128)

        def loss_fused(qsum, v_w, v_b, scale, memory):
            attn, ctx = attention_tail(qsum, v_w, v_b, scale, mask, memory)
            return jnp.sum(attn * attn) + jnp.sum(jnp.tanh(ctx))

        def loss_ref(qsum, v_w, v_b, scale, memory):
            attn, ctx = attention_tail_reference(qsum, v_w, v_b, scale,
                                                 mask, memory)
            return jnp.sum(attn * attn) + jnp.sum(jnp.tanh(ctx))

        g_fused = jax.grad(loss_fused, argnums=(0, 1, 2, 3, 4))(
            qsum, v_w, v_b, scale, memory)
        g_ref = jax.grad(loss_ref, argnums=(0, 1, 2, 3, 4))(
            qsum, v_w, v_b, scale, memory)
        for a, b in zip(g_fused, g_ref):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-4, rtol=1e-4)


class TestConvBnActKernel:
    """Fused eval-mode conv+BN+activation (SURVEY 2.2: encoder/postnet
    conv stacks) vs the unfused conv1d_apply + batchnorm_apply chain."""

    def _layer(self, c_in, c_out, k=5, seed=0):
        from tacotron2_tpu.models.layers import batchnorm_init, conv1d_init
        key = jax.random.PRNGKey(seed)
        conv_p = conv1d_init(key, c_in, c_out, k)
        bn_p, bn_s = batchnorm_init(c_out)
        rng = np.random.default_rng(seed)
        # Non-trivial running stats so the fold actually does something.
        bn_s = {"mean": jnp.asarray(rng.standard_normal(c_out)
                                    .astype(np.float32) * 0.5),
                "var": jnp.asarray(
                    rng.uniform(0.5, 2.0, c_out).astype(np.float32))}
        bn_p = {"scale": jnp.asarray(rng.uniform(0.5, 1.5, c_out)
                                     .astype(np.float32)),
                "bias": jnp.asarray(rng.standard_normal(c_out)
                                    .astype(np.float32) * 0.1)}
        return conv_p, bn_p, bn_s

    def test_matches_unfused_all_acts(self):
        for act in ("relu", "tanh", "none"):
            conv_p, bn_p, bn_s = self._layer(512, 512)
            x = jnp.asarray(np.random.default_rng(1)
                            .standard_normal((2, 512, 64)).astype(np.float32))
            ref = conv_bn_act_reference(x, conv_p, bn_p, bn_s, 1e-5, act)
            out = conv_bn_act_pallas(x, conv_p, bn_p, bn_s, eps=1e-5, act=act)
            np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                       atol=2e-4, rtol=2e-4)

    def test_postnet_edge_channels(self):
        # First (80 -> 512) and last (512 -> 80) postnet layers: channel
        # counts that are not MXU-tile multiples.
        for c_in, c_out, act in ((80, 512, "tanh"), (512, 80, "none")):
            conv_p, bn_p, bn_s = self._layer(c_in, c_out, seed=2)
            x = jnp.asarray(np.random.default_rng(3)
                            .standard_normal((3, c_in, 100))
                            .astype(np.float32))
            ref = conv_bn_act_reference(x, conv_p, bn_p, bn_s, 1e-5, act)
            out = conv_bn_act_pallas(x, conv_p, bn_p, bn_s, eps=1e-5, act=act)
            np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                       atol=2e-4, rtol=2e-4)

    def test_bf16_weights_match_unfused_bf16_path(self):
        # Under the bf16 serving cast the kernel must mirror
        # conv1d_apply's policy (matmuls in the weight dtype, fp32 out),
        # not silently promote to fp32.
        conv_p, bn_p, bn_s = self._layer(512, 512)
        conv_bf = {k: v.astype(jnp.bfloat16) for k, v in conv_p.items()}
        x = jnp.asarray(np.random.default_rng(5)
                        .standard_normal((2, 512, 64)).astype(np.float32))
        ref = conv_bn_act_reference(x, conv_bf, bn_p, bn_s, 1e-5, "tanh")
        out = conv_bn_act_pallas(x, conv_bf, bn_p, bn_s, eps=1e-5,
                                 act="tanh")
        assert out.dtype == ref.dtype == jnp.float32
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=3e-2, rtol=3e-2)

    def test_encoder_postnet_flag_parity(self, monkeypatch):
        # Whole-stack parity: eval-mode encoder/postnet with the fused
        # kernel enabled must match the default XLA path.
        from tacotron2_tpu.config import ModelConfig
        from tacotron2_tpu.models.encoder import encoder_apply, encoder_init
        from tacotron2_tpu.models.postnet import postnet_apply, postnet_init
        cfg = ModelConfig()
        key = jax.random.PRNGKey(0)
        enc_p, enc_s = encoder_init(key, cfg)
        post_p, post_s = postnet_init(key, cfg)
        tokens = jnp.asarray(np.random.default_rng(0)
                             .integers(1, cfg.n_symbols, (2, 32)), jnp.int32)
        mel = jnp.asarray(np.random.default_rng(1)
                          .standard_normal((2, cfg.n_mels, 48))
                          .astype(np.float32))
        monkeypatch.delenv("TACOTRON2_FUSED_CONVBN", raising=False)
        mem_ref, _ = encoder_apply(enc_p, enc_s, tokens, cfg, train=False)
        res_ref, _ = postnet_apply(post_p, post_s, mel, cfg, None,
                                   train=False)
        monkeypatch.setenv("TACOTRON2_FUSED_CONVBN", "1")
        mem, _ = encoder_apply(enc_p, enc_s, tokens, cfg, train=False)
        res, _ = postnet_apply(post_p, post_s, mel, cfg, None, train=False)
        np.testing.assert_allclose(np.asarray(mem), np.asarray(mem_ref),
                                   atol=5e-4, rtol=5e-4)
        np.testing.assert_allclose(np.asarray(res), np.asarray(res_ref),
                                   atol=5e-4, rtol=5e-4)


class TestMxuConvBackward:
    """The hand-written conv1d backward (layers._conv1d_mxu: d_w as K
    time-shifted MXU contractions, d_x as the tap-reversed transposed
    conv) must produce the same gradients as XLA's conv transpose."""

    @pytest.mark.parametrize("k,pad", [(5, "same"), (4, "same"), (5, 1)])
    def test_grad_parity_fp32(self, k, pad, monkeypatch):
        from tacotron2_tpu.models.layers import conv1d_apply, conv1d_init
        key = jax.random.PRNGKey(0)
        p = conv1d_init(key, 64, 64, k)
        x = jnp.asarray(np.random.default_rng(0)
                        .standard_normal((2, 64, 33)).astype(np.float32))

        def loss(p, x, enabled):
            with_env = "1" if enabled else "0"
            monkeypatch.setenv("TACOTRON2_MXU_CONVGRAD", with_env)
            y = conv1d_apply(p, x, padding=pad)
            return jnp.sum(jnp.sin(y) * y), y

        (val, y), grads = jax.value_and_grad(loss, argnums=(0, 1),
                                             has_aux=True)(p, x, True)
        (val0, y0), grads0 = jax.value_and_grad(loss, argnums=(0, 1),
                                                has_aux=True)(p, x, False)
        np.testing.assert_allclose(np.asarray(y), np.asarray(y0),
                                   atol=1e-5, rtol=1e-5)
        for a, b in zip(jax.tree_util.tree_leaves(grads),
                        jax.tree_util.tree_leaves(grads0)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=2e-4, rtol=2e-4)

    def test_grad_parity_bf16_weights(self, monkeypatch):
        # bf16 weights (the training policy's cast view): cotangents must
        # land in bf16 and match the XLA transpose within bf16 rounding.
        from tacotron2_tpu.models.layers import conv1d_apply, conv1d_init
        key = jax.random.PRNGKey(1)
        p32 = conv1d_init(key, 64, 64, 5)
        p = jax.tree_util.tree_map(
            lambda a: a.astype(jnp.bfloat16), p32)
        x = jnp.asarray(np.random.default_rng(1)
                        .standard_normal((2, 64, 40)).astype(np.float32))

        def loss(p, x, enabled):
            monkeypatch.setenv("TACOTRON2_MXU_CONVGRAD",
                               "1" if enabled else "0")
            y = conv1d_apply(p, x, padding="same", out_dtype=jnp.bfloat16)
            return jnp.sum(y.astype(jnp.float32) ** 2)

        g = jax.grad(loss, argnums=(0, 1))(p, x, True)
        g0 = jax.grad(loss, argnums=(0, 1))(p, x, False)
        assert g[0]["w"].dtype == jnp.bfloat16
        for a, b in zip(jax.tree_util.tree_leaves(g),
                        jax.tree_util.tree_leaves(g0)):
            np.testing.assert_allclose(
                np.asarray(a, np.float32), np.asarray(b, np.float32),
                atol=5e-2, rtol=5e-2)

    def test_tiny_conv_takes_raw_path(self):
        # The K-dispatch backward loses for tiny channel counts (e.g. the
        # 2->32 K=31 location conv inside the decode scan): conv1d_apply
        # must route those through the plain XLA conv.
        from tacotron2_tpu.models import layers as L
        assert 2 * 32 < 4096  # the gate conv1d_apply checks
        p = L.conv1d_init(jax.random.PRNGKey(0), 2, 32, 31)
        x = jnp.ones((3, 2, 50), jnp.float32)
        y = L.conv1d_apply(p, x, padding="same")
        assert y.shape == (3, 32, 50)
