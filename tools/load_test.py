#!/usr/bin/env python
"""Load-generator for the TTS HTTP server: concurrency sweep with latency
percentiles.

    # terminal 1
    python serve.py --checkpoint ckpt/best_model --port 8080 --max_batch 16
    # terminal 2
    python tools/load_test.py --url http://127.0.0.1:8080 \
        --concurrency 1,4,16 --requests 32

Reports, per concurrency level: wall time, requests/s, audio-seconds
generated per wall-second (the serving real-time factor), and latency
p50/p90/max.  Texts cycle through a fixed pool so repeated requests hit
the same compiled buckets the way steady-state traffic does (the server
dedupes nothing — each request decodes).

Useful against both service modes: --max_batch 1 (per-request) vs
micro-batching, and for checking /healthz batching stats afterwards.
"""

from __future__ import annotations

import argparse
import io
import json
import sys
import threading
import time
import urllib.request
import wave

TEXTS = [
    "The birch canoe slid on the smooth planks.",
    "Glue the sheet to the dark blue background.",
    "It's easy to tell the depth of a well.",
    "These days a chicken leg is a rare dish.",
    "Rice is often served in round bowls.",
    "The juice of lemons makes fine punch.",
    "The box was thrown beside the parked truck.",
    "The hogs were fed chopped corn and garbage.",
]


def _one_request(url: str, text: str, vocoder: str, timeout: float):
    body = json.dumps({"text": text, "vocoder": vocoder}).encode()
    req = urllib.request.Request(f"{url}/synthesize", data=body,
                                 method="POST")
    t0 = time.time()
    with urllib.request.urlopen(req, timeout=timeout) as r:
        wav_bytes = r.read()
    wall = time.time() - t0
    with wave.open(io.BytesIO(wav_bytes)) as w:
        audio_sec = w.getnframes() / w.getframerate()
    return wall, audio_sec


def run_overload(url: str, concurrency: int, n_requests: int, vocoder: str,
                 timeout: float):
    """Slam the server with `concurrency` simultaneous requests and
    classify every outcome: 200 (served), 503 (shed, with Retry-After),
    504 (service timeout), other.  Verifies graceful shedding: under a
    flood, rejects must be FAST (bounded queue) and served requests keep
    a bounded p99 — queue growth would show up as unbounded 200
    latencies and no 503s."""
    results = []  # (status, wall, retry_after)
    lock = threading.Lock()
    sem = threading.Semaphore(concurrency)

    def worker(i):
        with sem:
            body = json.dumps({"text": TEXTS[i % len(TEXTS)],
                               "vocoder": vocoder}).encode()
            req = urllib.request.Request(f"{url}/synthesize", data=body,
                                         method="POST")
            t0 = time.time()
            try:
                with urllib.request.urlopen(req, timeout=timeout) as r:
                    r.read()
                    status, retry = r.status, None
            except urllib.error.HTTPError as e:
                e.read()
                status, retry = e.code, e.headers.get("Retry-After")
            except Exception:
                status, retry = -1, None
            with lock:
                results.append((status, time.time() - t0, retry))

    threads = [threading.Thread(target=worker, args=(i,))
               for i in range(n_requests)]
    t0 = time.time()
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    wall = time.time() - t0
    by_status = {}
    for status, w, _ in results:
        by_status.setdefault(status, []).append(w)
    out = {"overload_concurrency": concurrency, "requests": n_requests,
           "wall_s": round(wall, 3)}
    for status, walls in sorted(by_status.items()):
        walls.sort()
        key = {200: "served", 503: "shed_503", 504: "timeout_504",
               -1: "transport_error"}.get(status, f"status_{status}")
        out[key] = {"count": len(walls),
                    "p50_s": round(walls[len(walls) // 2], 3),
                    "p99_s": round(walls[min(len(walls) - 1,
                                             int(len(walls) * 0.99))], 3)}
    retry_afters = [r for s, _, r in results if s == 503 and r]
    if retry_afters:
        out["retry_after_s"] = sorted(set(retry_afters))
    return out


def run_level(url: str, concurrency: int, n_requests: int, vocoder: str,
              timeout: float):
    latencies = [None] * n_requests
    audio = [0.0] * n_requests
    errors = []
    sem = threading.Semaphore(concurrency)

    def worker(i):
        with sem:
            try:
                latencies[i], audio[i] = _one_request(
                    url, TEXTS[i % len(TEXTS)], vocoder, timeout)
            except Exception as e:
                errors.append(f"request {i}: {type(e).__name__}: {e}")

    threads = [threading.Thread(target=worker, args=(i,))
               for i in range(n_requests)]
    t0 = time.time()
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    wall = time.time() - t0
    ok = [l for l in latencies if l is not None]
    if errors:
        print(f"  {len(errors)} errors, first: {errors[0]}", file=sys.stderr)
    if not ok:
        return None
    ok.sort()
    return {
        "concurrency": concurrency,
        "requests": len(ok),
        "wall_s": round(wall, 3),
        "req_per_s": round(len(ok) / wall, 2),
        "audio_sec_per_wall_sec": round(sum(audio) / wall, 1),
        "latency_p50_s": round(ok[len(ok) // 2], 3),
        "latency_p90_s": round(ok[int(len(ok) * 0.9)], 3),
        "latency_max_s": round(ok[-1], 3),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--url", default="http://127.0.0.1:8080")
    ap.add_argument("--concurrency", default="1,4,16",
                    help="comma-separated concurrency levels")
    ap.add_argument("--requests", type=int, default=32,
                    help="requests per level")
    ap.add_argument("--vocoder", default="griffinlim",
                    choices=["griffinlim", "hifigan"])
    ap.add_argument("--timeout", type=float, default=600.0)
    ap.add_argument("--warmup", type=int, default=2,
                    help="untimed warmup requests (compile)")
    ap.add_argument("--overload", type=int, default=0, metavar="N",
                    help="after the sweep, flood the server with N "
                         "simultaneous requests and report the 200/503/"
                         "504 breakdown (graceful-shedding check; size N "
                         "past the server's --max_queue)")
    args = ap.parse_args()
    url = args.url.rstrip("/")
    levels = [int(c) for c in args.concurrency.split(",") if c.strip()]
    if not levels:
        ap.error("--concurrency has no levels")

    try:
        for i in range(args.warmup):
            _one_request(url, TEXTS[i % len(TEXTS)], args.vocoder,
                         args.timeout)
    except Exception as e:
        sys.exit(f"warmup request to {url}/synthesize failed "
                 f"({type(e).__name__}: {e}) — is the server up?")

    for level in levels:
        stats = run_level(url, level, args.requests, args.vocoder,
                          args.timeout)
        if stats is None:
            print(json.dumps({"concurrency": level, "error": "all failed"}))
            continue
        print(json.dumps(stats))

    if args.overload:
        print(json.dumps(run_overload(url, args.overload, args.overload,
                                      args.vocoder, args.timeout)))

    with urllib.request.urlopen(f"{url}/healthz",
                                timeout=args.timeout) as r:
        print("healthz:", r.read().decode(), file=sys.stderr)


if __name__ == "__main__":
    main()
