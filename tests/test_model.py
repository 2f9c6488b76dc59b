"""Model tests: shapes, masking, inference semantics, and — the strong
anchor — numerical parity against the PyTorch reference model with
identical weights (reference: src/model.py, imported read-only and run in
eval mode on CPU).
"""

import sys
import types

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tacotron2_tpu.config import ModelConfig
from tacotron2_tpu.models import (make_pad_mask, param_count,
                                  init_projection_bias, tacotron2_forward,
                                  tacotron2_infer, tacotron2_init)
from tacotron2_tpu.utils import (params_from_torch_state_dict,
                                 torch_state_dict_from_params)

CFG = ModelConfig()
SMALL = ModelConfig(
    symbols_embedding_dim=32, encoder_embedding_dim=32, decoder_rnn_dim=48,
    prenet_dim=16, attention_rnn_dim=48, attention_dim=24,
    location_n_filters=8, location_kernel_size=15,
    postnet_embedding_dim=24, max_decoder_steps=50)


def _batch(cfg, b=2, t_enc=11, t_dec=23, seed=0):
    rng = np.random.default_rng(seed)
    text = rng.integers(1, 72, (b, t_enc)).astype(np.int32)
    text_lengths = np.array([t_enc, t_enc - 4], dtype=np.int32)
    text[1, t_enc - 4:] = 0
    mel = rng.standard_normal((b, cfg.n_mels, t_dec)).astype(np.float32) - 5.0
    return jnp.asarray(text), jnp.asarray(text_lengths), jnp.asarray(mel)


class TestShapes:
    def test_forward_shapes(self):
        params, state = tacotron2_init(jax.random.PRNGKey(0), SMALL)
        text, lengths, mel = _batch(SMALL)
        out, new_state = tacotron2_forward(
            params, state, SMALL, text, mel, lengths,
            jax.random.PRNGKey(1), train=True)
        b, t_enc = text.shape
        t_dec = mel.shape[2]
        assert out.mel_postnet.shape == (b, t_dec, SMALL.n_mels)
        assert out.mel_coarse.shape == (b, t_dec, SMALL.n_mels)
        assert out.gate_logits.shape == (b, t_dec)
        assert out.alignments.shape == (b, t_dec, t_enc)
        # BN running stats must have moved in train mode
        before = state["encoder"]["bn"][0]["mean"]
        after = new_state["encoder"]["bn"][0]["mean"]
        assert not np.allclose(np.asarray(before), np.asarray(after))

    def test_param_count_full_model(self):
        params, _ = tacotron2_init(jax.random.PRNGKey(0), CFG)
        n = param_count(params)
        # ~28.2M params (SURVEY: enc 5.55M / dec 18.26M / postnet 4.35M)
        assert 27.5e6 < n < 29.0e6

    def test_alignments_are_masked_distributions(self):
        params, state = tacotron2_init(jax.random.PRNGKey(0), SMALL)
        text, lengths, mel = _batch(SMALL)
        out, _ = tacotron2_forward(params, state, SMALL, text, mel, lengths,
                                   jax.random.PRNGKey(1), train=False)
        a = np.asarray(out.alignments)
        np.testing.assert_allclose(a.sum(-1), 1.0, atol=1e-5)
        # padded encoder positions get ~zero attention (additive -1e9 mask)
        assert a[1, :, -4:].max() < 1e-6

    def test_use_postnet_bypass(self):
        params, state = tacotron2_init(jax.random.PRNGKey(0), SMALL)
        text, lengths, mel = _batch(SMALL)
        out, _ = tacotron2_forward(params, state, SMALL, text, mel, lengths,
                                   jax.random.PRNGKey(1), train=False,
                                   use_postnet=False)
        np.testing.assert_array_equal(np.asarray(out.mel_postnet),
                                      np.asarray(out.mel_coarse))

    def test_projection_bias_init(self):
        params, _ = tacotron2_init(jax.random.PRNGKey(0), SMALL)
        _, _, mel = _batch(SMALL)
        new = init_projection_bias(params, mel)
        np.testing.assert_allclose(
            np.asarray(new["decoder"]["proj"]["b"]),
            np.asarray(mel).mean(axis=(0, 2)), rtol=1e-6)
        # original untouched (functional update)
        assert not np.allclose(np.asarray(params["decoder"]["proj"]["b"]),
                               np.asarray(new["decoder"]["proj"]["b"]))

    def test_make_pad_mask(self):
        m = np.asarray(make_pad_mask(jnp.asarray([3, 1]), 4))
        np.testing.assert_array_equal(
            m, [[False, False, False, True], [False, True, True, True]])


class TestInference:
    def test_runs_to_cap_with_fresh_weights(self):
        # gate bias -3 => sigmoid ~0.047 < 0.5: fresh model never stops early
        params, state = tacotron2_init(jax.random.PRNGKey(0), SMALL)
        text, _, _ = _batch(SMALL)
        out, n_frames, ends = tacotron2_infer(params, state, SMALL, text,
                                              max_steps=20)
        assert int(n_frames) == 20
        assert np.asarray(ends).tolist() == [20, 20]  # no gate fired
        assert out.mel_postnet.shape == (2, 20, SMALL.n_mels)

    def test_gate_early_stop(self):
        params, state = tacotron2_init(jax.random.PRNGKey(0), SMALL)
        # Force the gate to fire immediately: huge positive bias
        params = jax.tree_util.tree_map(lambda x: x, params)
        params["decoder"] = dict(params["decoder"])
        params["decoder"]["gate"] = dict(params["decoder"]["gate"])
        params["decoder"]["gate"]["b"] = jnp.full_like(
            params["decoder"]["gate"]["b"], 10.0)
        text, _, _ = _batch(SMALL)
        out, n_frames, ends = tacotron2_infer(params, state, SMALL, text,
                                              max_steps=20)
        # stop requires >1 recorded frames (reference: src/model.py:327)
        assert int(n_frames) == 2
        assert np.asarray(ends).max() == 2

    def test_forced_stop_at_is_traced_data(self):
        """forced_stop_at fires the exit path at a controlled frame, and
        being TRACED data, different stop frames reuse one executable
        (the bench.py early-stop instrument)."""
        params, state = tacotron2_init(jax.random.PRNGKey(0), SMALL)
        text, _, _ = _batch(SMALL)
        for stop in (5, 11):
            out, n_frames, ends = tacotron2_infer(
                params, state, SMALL, text, max_steps=20,
                forced_stop_at=jnp.int32(stop))
            assert int(n_frames) == stop
            assert np.asarray(ends).tolist() == [stop, stop]
        # without it, same weights run to the cap
        _, n_frames, _ = tacotron2_infer(params, state, SMALL, text,
                                         max_steps=20)
        assert int(n_frames) == 20

    def test_stop_mode_all_tracks_per_item_ends(self):
        params, state = tacotron2_init(jax.random.PRNGKey(0), SMALL)
        params = jax.tree_util.tree_map(lambda x: x, params)
        params["decoder"] = dict(params["decoder"])
        params["decoder"]["gate"] = dict(params["decoder"]["gate"])
        params["decoder"]["gate"]["b"] = jnp.full_like(
            params["decoder"]["gate"]["b"], 10.0)
        text, _, _ = _batch(SMALL)
        out, n_frames, ends = tacotron2_infer(params, state, SMALL, text,
                                              max_steps=20, stop_mode="all")
        assert int(n_frames) == 2
        assert np.asarray(ends).tolist() == [2, 2]

    def test_padded_inference_masks_attention(self):
        """With text_lengths, padded encoder positions get no attention —
        the unmasked-padding hazard batched callers would otherwise hit."""
        params, state = tacotron2_init(jax.random.PRNGKey(0), SMALL)
        rng = np.random.default_rng(7)
        text = np.zeros((1, 16), np.int32)
        text[0, :9] = rng.integers(1, 72, 9)
        out, n, _ = tacotron2_infer(
            params, state, SMALL, jnp.asarray(text), max_steps=10,
            text_lengths=jnp.asarray([9], jnp.int32))
        a = np.asarray(out.alignments)[:, :int(n)]
        assert a[0, :, 9:].max() < 1e-6
        np.testing.assert_allclose(a.sum(-1), 1.0, atol=1e-5)

    def test_drop_first_frame_quirk(self):
        params, state = tacotron2_init(jax.random.PRNGKey(0), SMALL)
        text, _, _ = _batch(SMALL)
        out_drop, _, _ = tacotron2_infer(params, state, SMALL, text,
                                         max_steps=10, drop_first_frame=True)
        out_keep, _, _ = tacotron2_infer(params, state, SMALL, text,
                                         max_steps=10, drop_first_frame=False)
        a = np.asarray(out_drop.mel_coarse)[:, 0]
        b = np.asarray(out_keep.mel_coarse)[:, 1]
        # dropped-first-frame: frame k of the drop variant equals frame k+1
        # of the keep variant (same state trajectory, first frame unrecorded)
        np.testing.assert_allclose(a, b, atol=1e-5)


@pytest.fixture(scope="module")
def torch_ref():
    """Import the read-only PyTorch reference model (librosa stubbed)."""
    torch = pytest.importorskip("torch")
    for name in ("librosa", "librosa.feature", "librosa.feature.inverse"):
        if name not in sys.modules:
            sys.modules[name] = types.ModuleType(name)
    sys.path.insert(0, "/root/reference")
    try:
        from src.model import Tacotron2 as RefTacotron2  # type: ignore
    except Exception as e:  # pragma: no cover
        pytest.skip(f"reference model unavailable: {e}")
    finally:
        sys.path.pop(0)
    return torch, RefTacotron2


class TestTorchParity:
    """Bit-level behavior checks against the reference with shared weights."""

    @pytest.fixture(scope="class")
    def pair(self, torch_ref):
        torch, RefTacotron2 = torch_ref
        torch.manual_seed(0)
        ref = RefTacotron2()
        ref.eval()
        ref._projection_bias_initialized = True  # disable lazy mutation
        sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
        params, state = params_from_torch_state_dict(sd, CFG)
        return torch, ref, params, state

    def test_teacher_forced_forward_parity(self, pair):
        torch, ref, params, state = pair
        rng = np.random.default_rng(3)
        b, t_enc, t_dec = 2, 13, 19
        text = rng.integers(1, 72, (b, t_enc))
        text[1, -5:] = 0
        lengths = np.array([t_enc, t_enc - 5])
        mel = (rng.standard_normal((b, 80, t_dec)) - 5.0).astype(np.float32)

        with torch.no_grad():
            t_post, t_coarse, t_gate, t_align = ref(
                torch.from_numpy(text), torch.from_numpy(mel),
                torch.from_numpy(lengths), use_postnet=True)
        t_align = torch.stack(t_align, dim=1)

        out, _ = tacotron2_forward(
            params, state, CFG, jnp.asarray(text, jnp.int32),
            jnp.asarray(mel), jnp.asarray(lengths, jnp.int32),
            jax.random.PRNGKey(0), train=False, use_postnet=True)

        # float32 accumulation over recurrent steps: allow 1e-3 absolute
        np.testing.assert_allclose(np.asarray(out.mel_coarse),
                                   t_coarse.numpy(), atol=1e-3)
        np.testing.assert_allclose(np.asarray(out.mel_postnet),
                                   t_post.numpy(), atol=2e-3)
        np.testing.assert_allclose(np.asarray(out.gate_logits),
                                   t_gate.numpy(), atol=1e-3)
        np.testing.assert_allclose(np.asarray(out.alignments),
                                   t_align.numpy(), atol=5e-4)

    def test_inference_parity(self, pair):
        torch, ref, params, state = pair
        rng = np.random.default_rng(4)
        text = rng.integers(1, 72, (1, 9))
        with torch.no_grad():
            r_post, r_coarse, r_gate, _ = ref.inference(
                torch.from_numpy(text), max_len_cap=12)
        out, n_frames, _ = tacotron2_infer(params, state, CFG,
                                           jnp.asarray(text, jnp.int32),
                                           max_steps=12)
        n = int(n_frames)
        assert n == r_coarse.shape[1]
        np.testing.assert_allclose(np.asarray(out.mel_coarse)[:, :n],
                                   r_coarse.numpy(), atol=5e-4)
        np.testing.assert_allclose(np.asarray(out.mel_postnet)[:, :n],
                                   r_post.numpy(), atol=1e-3)

    def test_state_dict_roundtrip(self, pair):
        _, _, params, state = pair
        sd = torch_state_dict_from_params(params, state, CFG)
        params2, state2 = params_from_torch_state_dict(sd, CFG)
        flat1 = jax.tree_util.tree_leaves(params)
        flat2 = jax.tree_util.tree_leaves(params2)
        assert len(flat1) == len(flat2)
        for a, b in zip(flat1, flat2):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
