"""TTS HTTP server tests: real socket round trip with a small model."""

import json
import threading
import urllib.request
import wave
import io

import numpy as np
import pytest

from tacotron2_tpu.config import Config, ModelConfig, TrainConfig


@pytest.fixture(scope="module")
def server(tmp_path_factory):
    from http.server import ThreadingHTTPServer

    import jax

    from tacotron2_tpu.infer.server import TTSService, make_handler
    from tacotron2_tpu.models import tacotron2_init
    from tacotron2_tpu.train.checkpoint import save_params_only

    cfg = Config(model=ModelConfig(
        symbols_embedding_dim=32, encoder_embedding_dim=32,
        decoder_rnn_dim=48, prenet_dim=16, attention_rnn_dim=48,
        attention_dim=24, location_n_filters=8, location_kernel_size=15,
        postnet_embedding_dim=24, max_decoder_steps=24))
    params, state = tacotron2_init(jax.random.PRNGKey(0), cfg.model)
    ckpt = str(tmp_path_factory.mktemp("srv") / "model")
    save_params_only(ckpt, params, state)

    service = TTSService(ckpt, cfg, griffinlim_iters=4)
    httpd = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(service))
    thread = threading.Thread(target=httpd.serve_forever, daemon=True)
    thread.start()
    yield f"http://127.0.0.1:{httpd.server_address[1]}"
    httpd.shutdown()


def _post(url, payload):
    req = urllib.request.Request(
        url + "/synthesize", data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"})
    try:
        with urllib.request.urlopen(req, timeout=300) as resp:
            return resp.status, resp.headers.get("Content-Type"), resp.read()
    except urllib.error.HTTPError as e:
        return e.code, e.headers.get("Content-Type"), e.read()


class TestServer:
    def test_healthz(self, server):
        with urllib.request.urlopen(server + "/healthz", timeout=60) as r:
            body = json.loads(r.read())
        assert body["status"] == "ok"

    def test_synthesize_returns_wav(self, server):
        status, ctype, body = _post(server, {"text": "Hello world."})
        assert status == 200
        assert ctype == "audio/wav"
        with wave.open(io.BytesIO(body)) as w:
            assert w.getframerate() == 22050
            assert w.getnframes() > 0

    def test_two_texts_different_lengths(self, server):
        """Different trimmed lengths must both synthesize (quantized
        vocoder shapes)."""
        for text in ["Hi.", "A much longer sentence for synthesis here."]:
            status, ctype, body = _post(server, {"text": text})
            assert status == 200
            with wave.open(io.BytesIO(body)) as w:
                assert w.getnframes() % 256 == 0 or w.getnframes() > 0

    def test_missing_text_is_400(self, server):
        status, _, body = _post(server, {})
        assert status == 400
        assert b"text" in body

    def test_unknown_vocoder_is_400(self, server):
        status, _, body = _post(server, {"text": "hi", "vocoder": "wavenet"})
        assert status == 400

    def test_bad_json_is_400(self, server):
        req = urllib.request.Request(
            server + "/synthesize", data=b"{not json",
            headers={"Content-Type": "application/json"})
        try:
            urllib.request.urlopen(req, timeout=60)
            status = 200
        except urllib.error.HTTPError as e:
            status = e.code
        assert status == 400

    def test_unknown_route_is_404(self, server):
        try:
            urllib.request.urlopen(server + "/nope", timeout=60)
            status = 200
        except urllib.error.HTTPError as e:
            status = e.code
        assert status == 404

    def test_hifigan_without_checkpoint_is_503(self, server, monkeypatch):
        monkeypatch.delenv("HIFIGAN_CHECKPOINT", raising=False)
        monkeypatch.chdir("/tmp")  # ensure no stray hifigan_checkpoint.pt
        status, _, body = _post(server,
                                {"text": "hi", "vocoder": "hifigan"})
        assert status == 503
