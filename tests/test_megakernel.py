"""Parity tests for the whole-decode Pallas megakernel.

The megakernel (ops/decoder_megakernel.py) must reproduce
`decoder_infer`'s while_loop semantics exactly: outputs, early-exit
bookkeeping (n_frames / frame_ends under stop_mode any/all), the
drop-first-frame quirk, the traced forced_stop_at instrument, and the
post-stop buffer contents.  On CPU the kernel runs in Pallas interpret
mode — numerics match the XLA path to float tolerance.
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tacotron2_tpu.config import ModelConfig
from tacotron2_tpu.models.decoder import decoder_init, decoder_infer
from tacotron2_tpu.ops.decoder_megakernel import decoder_infer_mega

SMALL = ModelConfig(n_mels=8, prenet_dim=16, encoder_embedding_dim=32,
                    decoder_rnn_dim=64, attention_rnn_dim=64,
                    attention_dim=16, location_n_filters=4,
                    location_kernel_size=7)
B, T_ENC, MAX = 2, 12, 14


@pytest.fixture(scope="module")
def setup():
    # pure-XLA reference path (the Pallas attention tail is its own
    # tested component; here we want the megakernel vs the JAX math)
    os.environ["TACOTRON2_FUSED_ATTENTION"] = "0"
    params = decoder_init(jax.random.PRNGKey(0), SMALL)
    memory = jax.random.normal(jax.random.PRNGKey(1), (B, T_ENC, 32)) * 0.5
    mask = jnp.zeros((B, T_ENC), bool).at[1, 9:].set(True)
    yield params, memory, mask
    os.environ.pop("TACOTRON2_FUSED_ATTENTION", None)


def assert_parity(ref, got, tol=2e-4):
    assert int(ref[3]) == int(got[3])
    np.testing.assert_array_equal(np.asarray(ref[4]), np.asarray(got[4]))
    for i, name in enumerate(("mels", "gates", "aligns")):
        err = np.max(np.abs(np.asarray(ref[i]) - np.asarray(got[i])))
        assert err < tol, (name, err)


class TestMegakernelParity:
    @pytest.mark.parametrize("drop", [True, False])
    @pytest.mark.parametrize("stop_mode", ["any", "all"])
    def test_full_run(self, setup, drop, stop_mode):
        params, memory, mask = setup
        args = dict(drop_first_frame=drop, mask=mask, stop_mode=stop_mode)
        ref = decoder_infer(params, SMALL, memory, MAX, 0.5, **args)
        got = decoder_infer_mega(params, SMALL, memory, MAX, 0.5, **args)
        assert int(got[3]) == MAX          # random weights: gate never fires
        assert_parity(ref, got)

    @pytest.mark.parametrize("stop_mode", ["any", "all"])
    def test_forced_stop(self, setup, stop_mode):
        params, memory, mask = setup
        args = dict(mask=mask, stop_mode=stop_mode,
                    forced_stop_at=jnp.int32(5))
        ref = decoder_infer(params, SMALL, memory, MAX, 0.5, **args)
        got = decoder_infer_mega(params, SMALL, memory, MAX, 0.5, **args)
        assert int(got[3]) == 5
        # post-stop rows keep the untouched-buffer contents
        assert np.all(np.asarray(got[0])[:, 5:] == 0.0)
        assert np.all(np.asarray(got[1])[:, 5:] == -1e9)
        assert_parity(ref, got)

    @pytest.mark.parametrize("stop_at", [0, 1])
    def test_forced_stop_floor(self, setup, stop_at):
        """forced_stop_at <= 1 must behave like 1 under drop_first_frame:
        the while_loop only ever evaluates the forced stop with
        n_out >= 1 (its dropped diagnostic step runs OUTSIDE the loop),
        so the megakernel must not fire at its in-grid t=0 step."""
        params, memory, mask = setup
        args = dict(mask=mask, drop_first_frame=True,
                    forced_stop_at=jnp.int32(stop_at))
        ref = decoder_infer(params, SMALL, memory, MAX, 0.5, **args)
        got = decoder_infer_mega(params, SMALL, memory, MAX, 0.5, **args)
        assert int(ref[3]) == 1
        assert_parity(ref, got)

    def test_natural_gate_fire(self, setup):
        params, memory, mask = setup
        hot = jax.tree_util.tree_map(lambda x: x, params)
        hot["gate"] = dict(params["gate"],
                           b=jnp.full_like(params["gate"]["b"], 5.0))
        ref = decoder_infer(hot, SMALL, memory, MAX, 0.5, mask=mask)
        got = decoder_infer_mega(hot, SMALL, memory, MAX, 0.5, mask=mask)
        assert int(got[3]) == 2            # fires at the first eligible step
        assert_parity(ref, got)

    def test_no_mask(self, setup):
        params, memory, _ = setup
        ref = decoder_infer(params, SMALL, memory, MAX, 0.5)
        got = decoder_infer_mega(params, SMALL, memory, MAX, 0.5)
        assert_parity(ref, got)


class TestEnabledGating:
    def test_cleared_config_beats_env_force(self, monkeypatch):
        """Mesh users clear cfg.decoder_megakernel to keep the
        un-partitionable Pallas call out of GSPMD programs; the env
        force-flag must not silently re-enable it."""
        import dataclasses

        from tacotron2_tpu.ops.decoder_megakernel import megakernel_enabled
        off = dataclasses.replace(SMALL, decoder_megakernel=False)
        monkeypatch.setenv("TACOTRON2_MEGA_DECODER", "1")
        assert not megakernel_enabled(off, b=1)
        monkeypatch.delenv("TACOTRON2_MEGA_DECODER")
        assert not megakernel_enabled(off, b=1)

    def test_vmem_falloff_warns(self, monkeypatch, caplog):
        """r5 (VERDICT r4 item 7): when the VMEM gate rejects a config
        (fp32 weights past B=16 at reference dims) the fall-off to the
        ~2.5x-slower while_loop program must be LOGGED, naming the bf16
        alternative that would re-engage the kernel."""
        import logging

        from tacotron2_tpu.config import ModelConfig as MC
        from tacotron2_tpu.ops import decoder_megakernel as mk
        monkeypatch.setattr(mk.jax, "default_backend", lambda: "tpu")
        mk._warn_vmem_falloff.cache_clear()
        full = MC()   # reference dims: fp32 engages only through B=16
        with caplog.at_level(logging.WARNING, logger="tacotron2_tpu"):
            assert not mk.megakernel_enabled(full, b=64,
                                             bytes_per_weight=4,
                                             stop_mode="all")
        assert any("while_loop" in r.message and "bf16" in r.message
                   for r in caplog.records), caplog.records
        # bf16 weights at the same batch DO fit -> no new warning
        caplog.clear()
        with caplog.at_level(logging.WARNING, logger="tacotron2_tpu"):
            assert mk.megakernel_enabled(full, b=64, bytes_per_weight=2,
                                         stop_mode="all")
        assert not caplog.records


class TestBatchedMiddle:
    """r4: the banded-matmul attention middle batches the kernel to
    serving-scale B (the r3 unrolled middle was gated to B<=8)."""

    @pytest.mark.parametrize("b", [16, 64])
    def test_large_batch_parity(self, b):
        os.environ["TACOTRON2_FUSED_ATTENTION"] = "0"
        try:
            params = decoder_init(jax.random.PRNGKey(0), SMALL)
            memory = jax.random.normal(
                jax.random.PRNGKey(2), (b, T_ENC, 32)) * 0.5
            lens = 4 + (jnp.arange(b) % (T_ENC - 4))
            mask = jnp.arange(T_ENC)[None, :] >= lens[:, None]
            args = dict(mask=mask, stop_mode="all",
                        forced_stop_at=jnp.int32(6))
            ref = decoder_infer(params, SMALL, memory, MAX, 0.5, **args)
            got = decoder_infer_mega(params, SMALL, memory, MAX, 0.5, **args)
            assert_parity(ref, got)
        finally:
            os.environ.pop("TACOTRON2_FUSED_ATTENTION", None)

    def test_enabled_window_covers_serving_batches(self):
        """At the reference dims the VMEM estimate admits B=64 bf16 (the
        serving coalesce sizes) and rejects B=256; B=128 sits at the
        margin (~96 MB of the 100 MB budget) and is settled on-chip."""
        from tacotron2_tpu.ops.decoder_megakernel import _vmem_estimate
        ref_cfg = ModelConfig()
        assert _vmem_estimate(ref_cfg, 64, 128, 2) < 100 * 1024 * 1024
        assert _vmem_estimate(ref_cfg, 256, 128, 2) > 100 * 1024 * 1024
