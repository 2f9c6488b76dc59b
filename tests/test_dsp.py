"""DSP tests: STFT/mel/Griffin-Lim numerics.

The JAX implementations are validated against independent numpy mirrors
written here (straightforward loop implementations of the librosa
conventions documented in tacotron2_tpu/dsp/), plus structural invariants.
"""

import os

import numpy as np
import pytest
from scipy.signal import get_window

from tacotron2_tpu.config import AudioConfig
from tacotron2_tpu.dsp import (batched_log_mel_with_lengths, griffin_lim,
                               hann_window, istft, log_mel_spectrogram,
                               mel_filterbank, mel_to_audio, mel_to_linear,
                               reflect_pad_batch, save_wav, stft,
                               stft_magnitude, stft_magnitude_squared)
from tacotron2_tpu.dsp.mel import hz_to_mel, mel_to_hz
from tacotron2_tpu.dsp.wav import load_audio

CFG = AudioConfig()


def np_stft_power(y, n_fft=1024, hop=256, win_length=1024):
    """Independent numpy reference: centered, reflect-padded power STFT."""
    win = get_window("hann", win_length, fftbins=True)
    if win_length < n_fft:
        lpad = (n_fft - win_length) // 2
        w = np.zeros(n_fft)
        w[lpad:lpad + win_length] = win
    else:
        w = win
    ypad = np.pad(y, n_fft // 2, mode="reflect")
    t = 1 + len(y) // hop
    out = np.empty((n_fft // 2 + 1, t))
    for i in range(t):
        frame = ypad[i * hop:i * hop + n_fft] * w
        out[:, i] = np.abs(np.fft.rfft(frame)) ** 2
    return out


@pytest.fixture(scope="module")
def chirp():
    rng = np.random.default_rng(0)
    t = np.arange(22050 * 0.7) / 22050
    y = np.sin(2 * np.pi * (200 + 400 * t) * t) * 0.5
    y += 0.01 * rng.standard_normal(len(t))
    return y.astype(np.float32)


class TestWindow:
    def test_matches_scipy_periodic_hann(self):
        w = hann_window(1024)
        np.testing.assert_allclose(w, get_window("hann", 1024, fftbins=True),
                                   atol=1e-6)


class TestStft:
    def test_power_matches_numpy_reference(self, chirp):
        ours = np.asarray(stft_magnitude_squared(
            chirp, n_fft=1024, hop_length=256, win_length=1024))
        ref = np_stft_power(chirp)
        assert ours.shape == ref.shape
        np.testing.assert_allclose(ours, ref, rtol=1e-3, atol=1e-4)

    def test_frame_count(self, chirp):
        out = np.asarray(stft_magnitude_squared(
            chirp, n_fft=1024, hop_length=256, win_length=1024))
        assert out.shape == (513, 1 + len(chirp) // 256)

    def test_istft_roundtrip(self, chirp):
        spec = stft(chirp, n_fft=1024, hop_length=256, win_length=1024)
        recon = np.asarray(istft(spec, n_fft=1024, hop_length=256,
                                 win_length=1024, length=len(chirp)))
        # interior samples reconstruct near-exactly (COLA)
        np.testing.assert_allclose(recon[1024:-1024], chirp[1024:-1024],
                                   atol=1e-4)


class TestMelScale:
    def test_slaney_roundtrip(self):
        f = np.array([0.0, 250.0, 999.0, 1000.0, 4000.0, 8000.0])
        np.testing.assert_allclose(mel_to_hz(hz_to_mel(f)), f, rtol=1e-10)

    def test_linear_below_1k(self):
        np.testing.assert_allclose(hz_to_mel(600.0), 600.0 / (200.0 / 3.0))

    def test_filterbank_shape_and_coverage(self):
        fb = mel_filterbank(22050, 1024, 80, 0.0, 8000.0)
        assert fb.shape == (80, 513)
        assert (fb >= 0).all()
        # every filter has support
        assert (fb.sum(axis=1) > 0).all()
        # slaney normalization: each row integrates to ~2/(width); peak value
        # equals enorm at the filter's center for interior filters
        mel_pts = mel_to_hz(np.linspace(hz_to_mel(0.0), hz_to_mel(8000.0), 82))
        enorm = 2.0 / (mel_pts[2:] - mel_pts[:-2])
        peaks = fb.max(axis=1)
        # peaks should be close to (but not exceed much) the analytic enorm
        assert (peaks <= enorm * 1.0001).all()
        assert (peaks >= enorm * 0.5).all()

    def test_pure_tone_lands_in_right_band(self):
        sr = 22050
        freq = 2000.0
        t = np.arange(sr) / sr
        y = np.sin(2 * np.pi * freq * t).astype(np.float32)
        mel = np.asarray(log_mel_spectrogram(y))
        band = int(np.argmax(mel[:, mel.shape[1] // 2]))
        # expected band: where 2 kHz falls among the 80 slaney centers
        centers = mel_to_hz(np.linspace(hz_to_mel(0.0), hz_to_mel(8000.0), 82))[1:-1]
        expected = int(np.argmin(np.abs(centers - freq)))
        assert abs(band - expected) <= 1


class TestLogMel:
    def test_matches_numpy_pipeline(self, chirp):
        ours = np.asarray(log_mel_spectrogram(chirp))
        fb = mel_filterbank(22050, 1024, 80, 0.0, 8000.0)
        ref = np.log(np.clip(fb @ np_stft_power(chirp), 1e-5, None))
        # numpy mirror runs float64, JAX float32: allow ~2% power error
        np.testing.assert_allclose(ours, ref, rtol=1e-3, atol=2e-2)

    def test_shape_and_dtype(self, chirp):
        out = np.asarray(log_mel_spectrogram(chirp))
        assert out.dtype == np.float32
        assert out.shape == (80, 1 + len(chirp) // 256)

    def test_batched_matches_per_item(self, chirp):
        sigs = [chirp, chirp[:9000], chirp[:5000]]
        pad = CFG.n_fft // 2
        total = max(len(s) for s in sigs) + CFG.n_fft
        batch = reflect_pad_batch(sigs, pad, total)
        lengths = np.array([len(s) for s in sigs], dtype=np.int32)
        mels, mel_lens = batched_log_mel_with_lengths(batch, lengths)
        mels = np.asarray(mels)
        for i, s in enumerate(sigs):
            solo = np.asarray(log_mel_spectrogram(s))
            tl = int(mel_lens[i])
            assert tl == solo.shape[1]
            np.testing.assert_allclose(mels[i, :, :tl], solo, rtol=1e-4,
                                       atol=1e-4)


class TestGoldenFixture:
    """Regression anchor on a REAL speech signal: the reference repo's
    committed WAV (/root/reference/generated_audio/output_4.wav),
    peak-normalized (the committed file sits ~ -40 dBFS) and frozen as
    tests/fixtures/output4_logmel_golden.npy.  Any change to the STFT
    framing, Hann window, Slaney filterbank, clipping, or log convention
    shifts these 80x101 values and fails here."""

    FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures",
                           "output4_logmel_golden.npy")
    WAV = "/root/reference/generated_audio/output_4.wav"

    def test_real_speech_mel_matches_frozen_golden(self):
        if not os.path.isfile(self.WAV):
            pytest.skip("reference WAV not present")
        from tacotron2_tpu.dsp.mel import get_mel_spectrogram_array
        golden = np.load(self.FIXTURE)
        y, sr = load_audio(self.WAV, target_sr=22050)
        assert sr == 22050
        y = y / np.abs(y).max() * 0.95
        mel = np.asarray(get_mel_spectrogram_array(y))
        assert mel.shape == golden.shape == (80, 101)
        np.testing.assert_allclose(mel, golden, rtol=1e-5, atol=1e-4)

    def test_golden_has_speech_dynamics(self):
        """The fixture itself must stay meaningful: log-scale values with
        real dynamic range, not a silence/floor artifact."""
        golden = np.load(self.FIXTURE)
        assert golden.min() < -8.0       # quiet bins near the log floor
        assert golden.max() > 2.0        # voiced energy well above it
        assert (golden < np.log(1.1e-5)).mean() < 0.05


class TestGriffinLim:
    def test_reconstruction_quality(self, chirp):
        mag = np.asarray(stft_magnitude(chirp, n_fft=1024, hop_length=256,
                                        win_length=1024))
        recon = np.asarray(griffin_lim(mag, n_fft=1024, hop_length=256,
                                       win_length=1024, n_iter=32,
                                       length=len(chirp)))
        assert recon.shape == chirp.shape
        # Spectral convergence: |STFT(recon)| should approximate mag well
        mag2 = np.asarray(stft_magnitude(recon, n_fft=1024, hop_length=256,
                                         win_length=1024))
        err = np.linalg.norm(mag - mag2) / np.linalg.norm(mag)
        assert err < 0.15

    def test_mel_to_linear_reduces_residual(self, chirp):
        mel_power = np.exp(np.asarray(log_mel_spectrogram(chirp)))
        fb = mel_filterbank(22050, 1024, 80, 0.0, 8000.0)
        s = np.asarray(mel_to_linear(mel_power, sr=22050, n_fft=1024,
                                     n_mels=80, fmin=0.0, fmax=8000.0))
        assert (s >= 0).all()
        resid = np.linalg.norm(fb @ s - mel_power) / np.linalg.norm(mel_power)
        assert resid < 0.05

    def test_mel_to_audio_end_to_end(self, chirp):
        logmel = np.asarray(log_mel_spectrogram(chirp))
        wav = mel_to_audio(logmel, n_iter=16)
        assert wav.ndim == 1
        assert wav.shape[0] > 0
        assert np.isfinite(wav).all()

    def test_mel_to_audio_transposed_input(self, chirp):
        logmel = np.asarray(log_mel_spectrogram(chirp))
        wav_a = mel_to_audio(logmel, n_iter=4)
        wav_b = mel_to_audio(logmel.T, n_iter=4)  # auto-fixed orientation
        np.testing.assert_allclose(wav_a, wav_b, atol=1e-5)


class TestWavIO:
    def test_roundtrip(self, tmp_path, chirp):
        path = str(tmp_path / "t.wav")
        save_wav(path, chirp, 22050)
        y, sr = load_audio(path, target_sr=22050)
        assert sr == 22050
        np.testing.assert_allclose(y, chirp, atol=1e-6)

    def test_int16_input(self, tmp_path, chirp):
        from scipy.io import wavfile
        path = str(tmp_path / "i.wav")
        wavfile.write(path, 22050, (chirp * 32767).astype(np.int16))
        y, _ = load_audio(path)
        np.testing.assert_allclose(y, chirp, atol=1e-3)
