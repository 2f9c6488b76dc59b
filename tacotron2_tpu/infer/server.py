"""Minimal production TTS HTTP server.

Serving layer (new capability — the reference is CLI-only): preloads the
model once, keeps the jitted decode warm, and exposes

    POST /synthesize   {"text": "...", "vocoder": "griffinlim"|"hifigan",
                        "speaker_id": 0}
        -> audio/wav bytes (22.05 kHz 16-bit WAV)
    GET  /healthz      -> {"status": "ok", ...}

Requests synthesize through the same pipeline as the CLI
(`synthesize_mels` + Griffin-Lim / HiFi-GAN).  Token lengths are bucketed
(16-multiples) so steady-state traffic reuses a handful of compiled
programs.  Single worker thread — the device executes one request at a
time anyway; the stdlib ThreadingHTTPServer handles socket concurrency.
"""

from __future__ import annotations

import io
import json
import threading
import wave
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Optional

import numpy as np

from ..config import Config
from .synthesize import load_model, synthesize_mels
from .vocode import vocode_mel


def _wav_bytes(audio: np.ndarray, sr: int) -> bytes:
    """Encode float audio as 16-bit PCM WAV bytes."""
    pcm = np.clip(audio, -1.0, 1.0)
    pcm = (pcm * 32767.0).astype(np.int16)
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes(pcm.tobytes())
    return buf.getvalue()


class TTSService:
    """Model-owning synthesis service (thread-safe; device access serialized)."""

    def __init__(self, checkpoint_path: str, cfg: Optional[Config] = None,
                 griffinlim_iters: int = 60, bf16: bool = False):
        self.cfg = cfg or Config()
        self.params, self.model_state = load_model(checkpoint_path, self.cfg)
        if bf16:
            from ..models import cast_params_bf16
            self.params = cast_params_bf16(self.params)
        self.griffinlim_iters = griffinlim_iters
        self._bf16 = bf16
        self._lock = threading.Lock()
        self._hifigan_vocoder = None
        self._requests = 0

    def _hifigan(self):
        if self._hifigan_vocoder is None:
            from ..models.hifigan import load_hifigan_vocoder
            # --bf16 applies to the generator too (halved activations)
            self._hifigan_vocoder = load_hifigan_vocoder(bf16=self._bf16)
        return self._hifigan_vocoder

    def synthesize(self, text: str, vocoder: str = "griffinlim",
                   speaker_id=None) -> bytes:
        with self._lock:
            self._requests += 1
            # Serving deliberately uses decode-then-bucketed-vocode (two
            # dispatches) rather than the fused tokens->waveform program
            # (infer/fused.py): the fused program's vocoder runs over the
            # full static max_decoder_steps buffer, which for a short
            # request spends 4-7x the generator/GL compute on masked
            # silence.  Bucketing the trimmed mel to 128-frame multiples
            # keeps per-request device time proportional to actual length
            # while still reusing a handful of compiled programs —
            # throughput wins over dispatch count on a serialized server.
            mels, _ = synthesize_mels(self.params, self.model_state,
                                      [text], self.cfg,
                                      speaker_id=speaker_id)
            audio = vocode_mel(
                mels[0], self.cfg.audio,
                vocoder=self._hifigan() if vocoder == "hifigan" else None,
                griffinlim_iters=self.griffinlim_iters)
        return _wav_bytes(audio, self.cfg.audio.sampling_rate)

    @property
    def request_count(self) -> int:
        return self._requests


def make_handler(service: TTSService):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, fmt, *args):  # quiet default access log
            pass

        def _json(self, code: int, obj) -> None:
            body = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/healthz":
                self._json(200, {"status": "ok",
                                 "requests": service.request_count})
            else:
                self._json(404, {"error": "not found"})

        def do_POST(self):
            if self.path != "/synthesize":
                self._json(404, {"error": "not found"})
                return
            try:
                length = int(self.headers.get("Content-Length", "0"))
                payload = json.loads(self.rfile.read(length) or b"{}")
                text = payload.get("text", "")
                if not isinstance(text, str) or not text.strip():
                    self._json(400, {"error": "missing 'text'"})
                    return
                vocoder = payload.get("vocoder", "griffinlim")
                if vocoder not in ("griffinlim", "hifigan"):
                    self._json(400, {"error": f"unknown vocoder {vocoder!r}"})
                    return
                speaker_id = payload.get("speaker_id")
                if speaker_id is not None and (isinstance(speaker_id, bool)
                                               or not isinstance(speaker_id,
                                                                 int)):
                    self._json(400, {"error": "speaker_id must be an int"})
                    return
                wav = service.synthesize(text, vocoder,
                                         speaker_id=speaker_id)
            except json.JSONDecodeError:
                self._json(400, {"error": "invalid JSON body"})
                return
            except ValueError as e:  # e.g. speaker_id out of range
                self._json(400, {"error": str(e)})
                return
            except FileNotFoundError as e:  # hifigan checkpoint missing
                self._json(503, {"error": str(e)})
                return
            except Exception as e:  # pragma: no cover
                self._json(500, {"error": f"{type(e).__name__}: {e}"})
                return
            self.send_response(200)
            self.send_header("Content-Type", "audio/wav")
            self.send_header("Content-Length", str(len(wav)))
            self.end_headers()
            self.wfile.write(wav)

    return Handler


def serve(checkpoint_path: str, host: str = "127.0.0.1", port: int = 8080,
          cfg: Optional[Config] = None,
          griffinlim_iters: int = 60,
          bf16: bool = False) -> ThreadingHTTPServer:
    """Start the TTS server (blocking).  Returns the server on shutdown."""
    service = TTSService(checkpoint_path, cfg, griffinlim_iters, bf16=bf16)
    httpd = ThreadingHTTPServer((host, port), make_handler(service))
    print(f"TTS server listening on http://{host}:{port} "
          f"(POST /synthesize, GET /healthz)")
    try:
        httpd.serve_forever()
    except KeyboardInterrupt:
        pass
    return httpd
