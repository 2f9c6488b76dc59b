"""Pallas kernel tests (interpret mode on CPU; the same code compiles for
TPU).  Each kernel must match its pure-jnp reference implementation.
"""

import numpy as np

import jax.numpy as jnp

import jax

from tacotron2_tpu.ops.attention_kernel import (attention_tail,
                                                attention_tail_pallas,
                                                attention_tail_reference)


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
        args = self._inputs(b=6)  # not a multiple of block_b=8
        attn_ref, ctx_ref = attention_tail_reference(*args)
        attn, ctx = attention_tail_pallas(*args)
        np.testing.assert_allclose(np.asarray(attn), np.asarray(attn_ref),
                                   atol=1e-5)
        np.testing.assert_allclose(np.asarray(ctx), np.asarray(ctx_ref),
                                   atol=1e-4)

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
