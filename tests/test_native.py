"""Native C++ loader tests: decode parity with the Python WAV reader and
reflect-pad layout parity with the host numpy path.
"""

import numpy as np
import pytest

from tacotron2_tpu.data.native_loader import (decode_batch_padded, decode_wav,
                                              native_available)
from tacotron2_tpu.dsp import save_wav
from tacotron2_tpu.dsp.mel import reflect_pad_batch
from tacotron2_tpu.dsp.wav import load_audio

pytestmark = pytest.mark.skipif(not native_available(),
                                reason="native library unavailable")


@pytest.fixture(scope="module")
def wav_files(tmp_path_factory):
    root = tmp_path_factory.mktemp("native_wavs")
    rng = np.random.default_rng(0)
    sigs, paths = [], []
    for i, n in enumerate([5000, 9000, 15435]):
        y = (0.4 * np.sin(np.arange(n) * 0.05 * (i + 1))
             + 0.01 * rng.standard_normal(n)).astype(np.float32)
        p = str(root / f"s{i}.wav")
        save_wav(p, y, 22050)
        sigs.append(y)
        paths.append(p)
    # also an int16 file
    from scipy.io import wavfile
    p16 = str(root / "s16.wav")
    wavfile.write(p16, 22050, (sigs[0] * 32767).astype(np.int16))
    return paths, sigs, p16


class TestDecode:
    def test_float32_parity(self, wav_files):
        paths, sigs, _ = wav_files
        y, sr = decode_wav(paths[2])
        assert sr == 22050
        np.testing.assert_allclose(y, sigs[2], atol=1e-7)

    def test_int16_parity_with_python_reader(self, wav_files):
        _, _, p16 = wav_files
        y_native, _ = decode_wav(p16)
        y_py, _ = load_audio(p16)
        np.testing.assert_allclose(y_native, y_py, atol=1e-6)

    def test_missing_file(self):
        with pytest.raises(IOError):
            decode_wav("/nonexistent/file.wav")


class TestBatchDecode:
    def test_reflect_pad_layout_matches_numpy(self, wav_files):
        paths, sigs, _ = wav_files
        pad = 512
        total = max(len(s) for s in sigs) + 1024
        batch, lengths, rates = decode_batch_padded(paths, pad, total)
        ref = reflect_pad_batch(sigs, pad, total)
        np.testing.assert_array_equal(lengths, [len(s) for s in sigs])
        assert (rates == 22050).all()
        np.testing.assert_allclose(batch, ref, atol=1e-7)

    def test_fuzz_random_bytes_never_crash(self, tmp_path):
        """The C parser must reject arbitrary garbage without crashing the
        process (truncated headers, lying chunk sizes, huge declared
        lengths)."""
        rng = np.random.default_rng(11)
        paths = []
        for i in range(24):
            p = str(tmp_path / f"fuzz{i}.wav")
            n = int(rng.integers(0, 2000))
            blob = rng.integers(0, 256, n, dtype=np.uint8).tobytes()
            if i % 3 == 0:  # valid RIFF/WAVE magic, garbage chunk body
                blob = b"RIFF" + blob[:4] + b"WAVE" + blob[4:]
            if i % 5 == 0:  # fmt/data headers with lying sizes
                blob = (b"RIFF\xff\xff\xff\xffWAVEfmt "
                        + b"\x10\x00\x00\x00" + blob[:16]
                        + b"data\xff\xff\xff\xff" + blob[16:])
            open(p, "wb").write(blob)
            paths.append(p)
        batch, lengths, rates = decode_batch_padded(paths, 512, 1 << 15)
        assert batch.shape == (24, 1 << 15)
        assert np.isfinite(batch).all()
        # anything that "decoded" must at least report a sample rate; pure
        # garbage (no RIFF magic) must be rejected outright
        assert ((lengths == 0) | (rates > 0)).all()

    def test_failed_file_marked_zero_length(self, wav_files, tmp_path):
        paths, sigs, _ = wav_files
        bad = str(tmp_path / "bad.wav")
        open(bad, "wb").write(b"not a wav")
        batch, lengths, _ = decode_batch_padded([paths[0], bad], 512,
                                                len(sigs[0]) + 2048)
        assert lengths[0] == len(sigs[0])
        assert lengths[1] == 0
