"""HiFi-GAN generator tests: shapes, upsampling factor, and numerical
parity against an independently-written torch implementation of the same
v1 architecture (validating the transposed-conv math and MRF wiring the
NVIDIA checkpoint expects).
"""

import numpy as np
import pytest

import jax

from tacotron2_tpu.models.hifigan import (RESBLOCK_DILATIONS,
                                          RESBLOCK_KERNELS, UPSAMPLE_KERNELS,
                                          UPSAMPLE_RATES, hifigan_apply,
                                          hifigan_init,
                                          params_from_nvidia_state_dict)


class TestForward:
    def test_output_shape_256x_upsampling(self):
        params = hifigan_init(jax.random.PRNGKey(0))
        mel = np.random.default_rng(0).standard_normal((2, 80, 7)).astype(
            np.float32)
        wav = np.asarray(hifigan_apply(params, mel))
        assert wav.shape == (2, 7 * 256)  # prod(8,8,2,2) * hop alignment
        assert np.abs(wav).max() <= 1.0  # tanh output

    def test_chunked_apply_exactly_matches_full(self):
        """hifigan_apply_chunked is an EXACT memory-bounded evaluation:
        receptive-field-overlapped windows with clamped starts reproduce
        the unchunked output, including the utterance edges."""
        from tacotron2_tpu.models.hifigan import hifigan_apply_chunked
        params = hifigan_init(jax.random.PRNGKey(0))
        mel = np.random.default_rng(2).standard_normal((2, 80, 100)).astype(
            np.float32) - 5.0
        full = np.asarray(hifigan_apply(params, mel))
        # chunk not dividing T, several chunks, clamped last window
        chunked = np.asarray(hifigan_apply_chunked(params, mel, chunk=24))
        assert chunked.shape == full.shape
        np.testing.assert_allclose(chunked, full, atol=2e-5)
        # short input falls back to the unchunked path
        short_ref = np.asarray(hifigan_apply(params, mel[:, :, :30]))
        short = np.asarray(hifigan_apply_chunked(params, mel[:, :, :30],
                                                 chunk=64))
        np.testing.assert_allclose(short, short_ref, atol=2e-5)

    def test_bf16_serving_cast_close_to_fp32(self):
        """bf16-cast generator (halved activation footprint for batched
        serving) stays numerically close to fp32 and returns fp32 audio."""
        from tacotron2_tpu.models.tacotron2 import cast_params_bf16
        import jax.numpy as jnp
        params = hifigan_init(jax.random.PRNGKey(0))
        mel = np.random.default_rng(1).standard_normal((1, 80, 9)).astype(
            np.float32) - 5.0
        ref = np.asarray(hifigan_apply(params, mel))
        bf = np.asarray(hifigan_apply(cast_params_bf16(params), mel))
        assert bf.dtype == np.float32
        assert np.abs(bf - ref).max() < 0.05   # tanh-bounded signal


def _build_torch_hifigan(torch):
    """Minimal torch HiFi-GAN v1 generator (independent reimplementation
    of the architecture, for cross-checking only)."""
    nn = torch.nn

    class ResBlock(nn.Module):
        def __init__(self, ch, k, dils):
            super().__init__()
            self.convs1 = nn.ModuleList([
                nn.Conv1d(ch, ch, k, dilation=d, padding=(k - 1) * d // 2)
                for d in dils])
            self.convs2 = nn.ModuleList([
                nn.Conv1d(ch, ch, k, padding=(k - 1) // 2) for _ in dils])

        def forward(self, x):
            for c1, c2 in zip(self.convs1, self.convs2):
                xt = torch.nn.functional.leaky_relu(x, 0.1)
                xt = c1(xt)
                xt = torch.nn.functional.leaky_relu(xt, 0.1)
                xt = c2(xt)
                x = x + xt
            return x

    class Generator(nn.Module):
        def __init__(self):
            super().__init__()
            self.conv_pre = nn.Conv1d(80, 512, 7, padding=3)
            self.ups = nn.ModuleList()
            self.resblocks = nn.ModuleList()
            ch = 512
            for u, k in zip(UPSAMPLE_RATES, UPSAMPLE_KERNELS):
                self.ups.append(nn.ConvTranspose1d(
                    ch, ch // 2, k, stride=u, padding=(k - u) // 2))
                ch //= 2
                for rk, dils in zip(RESBLOCK_KERNELS, RESBLOCK_DILATIONS):
                    self.resblocks.append(ResBlock(ch, rk, dils))
            self.conv_post = nn.Conv1d(ch, 1, 7, padding=3)

        def forward(self, x):
            x = self.conv_pre(x)
            n = len(RESBLOCK_KERNELS)
            for i, up in enumerate(self.ups):
                x = torch.nn.functional.leaky_relu(x, 0.1)
                x = up(x)
                acc = None
                for j in range(n):
                    y = self.resblocks[i * n + j](x)
                    acc = y if acc is None else acc + y
                x = acc / n
            x = torch.nn.functional.leaky_relu(x, 0.1)
            return torch.tanh(self.conv_post(x)).squeeze(1)

    return Generator()


class TestTorchParity:
    def test_converted_weights_match_torch_forward(self):
        torch = pytest.importorskip("torch")
        torch.manual_seed(0)
        gen = _build_torch_hifigan(torch)
        gen.eval()
        sd = {k: v.detach().numpy() for k, v in gen.state_dict().items()}
        params = params_from_nvidia_state_dict(sd)

        mel = np.random.default_rng(1).standard_normal((1, 80, 11)).astype(
            np.float32)
        with torch.no_grad():
            ref = gen(torch.from_numpy(mel)).numpy()
        ours = np.asarray(hifigan_apply(
            jax.tree_util.tree_map(np.asarray, params), mel))
        assert ours.shape == ref.shape
        np.testing.assert_allclose(ours, ref, atol=2e-4)

    def test_weight_norm_denormalization(self):
        torch = pytest.importorskip("torch")
        torch.manual_seed(1)
        gen = _build_torch_hifigan(torch)
        # weight-norm every conv like the NGC checkpoint stores them
        for m in gen.modules():
            if isinstance(m, (torch.nn.Conv1d, torch.nn.ConvTranspose1d)):
                torch.nn.utils.parametrizations.weight_norm(m)
        sd = {}
        for k, v in gen.state_dict().items():
            # parametrized naming -> classic weight_g/weight_v naming
            k = k.replace("parametrizations.weight.original0", "weight_g")
            k = k.replace("parametrizations.weight.original1", "weight_v")
            sd[k] = v.detach().numpy()
        params = params_from_nvidia_state_dict(sd)

        mel = np.random.default_rng(2).standard_normal((1, 80, 5)).astype(
            np.float32)
        gen.eval()
        with torch.no_grad():
            ref = gen(torch.from_numpy(mel)).numpy()
        ours = np.asarray(hifigan_apply(
            jax.tree_util.tree_map(np.asarray, params), mel))
        np.testing.assert_allclose(ours, ref, atol=2e-4)

    def test_weight_normed_checkpoint_file_roundtrip(self, tmp_path):
        """End-to-end through the FILE loader: a torch.save'd checkpoint in
        the NGC layout ({'generator': state_dict} with weight_g/weight_v
        entries) -> load_hifigan_params -> forward parity vs torch.

        This exercises the exact path a real NVIDIA checkpoint takes
        (models/hifigan.py:load_hifigan_params), not just the in-memory
        dict converter."""
        torch = pytest.importorskip("torch")
        from tacotron2_tpu.models.hifigan import load_hifigan_params

        torch.manual_seed(3)
        gen = _build_torch_hifigan(torch)
        for m in gen.modules():
            if isinstance(m, (torch.nn.Conv1d, torch.nn.ConvTranspose1d)):
                torch.nn.utils.parametrizations.weight_norm(m)
        sd = {}
        for k, v in gen.state_dict().items():
            k = k.replace("parametrizations.weight.original0", "weight_g")
            k = k.replace("parametrizations.weight.original1", "weight_v")
            sd[k] = v.detach().clone()
        ckpt_path = str(tmp_path / "hifigan_gen_checkpoint_test.pt")
        torch.save({"generator": sd}, ckpt_path)

        params = load_hifigan_params(ckpt_path)

        mel = np.random.default_rng(3).standard_normal((1, 80, 6)).astype(
            np.float32)
        gen.eval()
        with torch.no_grad():
            ref = gen(torch.from_numpy(mel)).numpy()
        ours = np.asarray(hifigan_apply(params, mel))
        np.testing.assert_allclose(ours, ref, atol=2e-4)

    def test_vocoder_loader_chunk_frames(self, tmp_path):
        """load_hifigan_vocoder(chunk_frames=...) (the serve.py
        --vocoder_chunk_frames plumbing) produces the same audio as the
        unchunked vocoder callable."""
        torch = pytest.importorskip("torch")
        from tacotron2_tpu.models.hifigan import load_hifigan_vocoder

        torch.manual_seed(4)
        gen = _build_torch_hifigan(torch)
        ckpt_path = str(tmp_path / "hifigan_plain.pt")
        torch.save({"generator": gen.state_dict()}, ckpt_path)

        mel = np.random.default_rng(4).standard_normal((1, 80, 90)).astype(
            np.float32) - 5.0
        full = load_hifigan_vocoder(ckpt_path)(mel)
        chunked = load_hifigan_vocoder(ckpt_path, chunk_frames=24)(mel)
        assert chunked.shape == full.shape == (1, 90 * 256)
        np.testing.assert_allclose(chunked, full, atol=2e-5)

    def test_missing_checkpoint_file_raises(self):
        from tacotron2_tpu.models.hifigan import load_hifigan_params
        with pytest.raises(FileNotFoundError, match="HiFi-GAN checkpoint"):
            load_hifigan_params("/nonexistent/ckpt.pt")
