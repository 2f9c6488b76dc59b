#!/usr/bin/env python
"""Inference scaling benchmarks on the attached chip(s).

Three sweeps, each the evidence behind a BASELINE.md row:

  --sweep mega     decoder megakernel vs while_loop decode across batch
                   sizes (the r4 "batched middle" lifted the B<=8 engage
                   gate — this measures where residency actually pays);
                   300-frame forced stop = the serving-relevant
                   early-stop workload, plus the full 1000-frame cap.
  --sweep sharded  ShardedSynthesizer (GSPMD over a (data,) mesh) vs the
                   unsharded fused program, aggregate mel-frames/s.  On
                   a single chip the trivial 1-device mesh quantifies
                   pure mesh/shard_map overhead; on a real pod the same
                   tool reports scaling.
  --sweep buckets  the length-proportional one-dispatch path
                   (infer/fused.py::synthesize_wav_buckets) at a
                   300-frame stop: wall median-of-N.

The reference serves from one device with a Python decode loop
(reference: inference.py:20-25, src/model.py:318-333); none of these
configurations exist there.
"""

from __future__ import annotations

import argparse
import functools
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])  # repo root

from tacotron2_tpu.utils.cache import enable_persistent_cache  # noqa: E402

SR = 22050.0
HOP = 256.0


def _wall(fn, iters=5):
    ws = []
    for _ in range(iters):
        t0 = time.perf_counter()
        fn()
        ws.append(time.perf_counter() - t0)
    return min(ws), float(np.median(ws))


def sweep_mega(args):
    import os

    import jax
    import jax.numpy as jnp

    from tacotron2_tpu.config import Config
    from tacotron2_tpu.models import tacotron2_infer_jit, tacotron2_init

    cfg = Config()
    params, state = tacotron2_init(jax.random.PRNGKey(0), cfg.model)
    if args.bf16:
        # Serving weights: halves the resident working set — the VMEM
        # gate then engages the kernel through B=128 (fp32: B<=16).
        from tacotron2_tpu.models.tacotron2 import cast_params_bf16
        params = cast_params_bf16(params)
    rng = np.random.default_rng(0)

    def run(b, stop):
        # forced_stop_at is TRACED: one compiled program per (B, flag)
        # covers every stop length (stop=1000 == the full cap).
        tokens = jnp.asarray(rng.integers(1, 72, (b, args.t_enc)), jnp.int32)
        lengths = jnp.full((b,), args.t_enc, jnp.int32)
        out, n, ends = tacotron2_infer_jit(
            params, state, cfg.model, tokens, max_steps=1000,
            text_lengths=lengths, stop_mode="all",
            forced_stop_at=jnp.int32(stop))
        np.asarray(ends)
        # Sync on a scalar slice: fetching the whole (B, S, n_mels) mel
        # through the tunnel would time transport, not the decode.
        float(jax.device_get(out.mel_postnet[0, -1, -1]))

    def dev_time(fn, n=3):
        # Chip-only module time (the walls above carry ~60-70 ms of
        # tunnel dispatch that a locally-attached chip never pays).
        import tempfile

        from tacotron2_tpu.utils.xplane import (min_module_time,
                                                module_device_times)
        try:
            with tempfile.TemporaryDirectory() as tdir:
                with jax.profiler.trace(tdir):
                    for _ in range(n):
                        fn()
                return min_module_time(module_device_times(tdir),
                                       "tacotron2_infer")
        except Exception:
            return None

    for flag in ("1", "0"):
        os.environ["TACOTRON2_MEGA_DECODER"] = flag
        jax.clear_caches()
        name = "megakernel" if flag == "1" else "while_loop"
        for b in args.batches:
            run(b, 1000)  # compile once per (B, flag)
            for frames in (300, 1000):
                w, med = _wall(lambda: run(b, frames), args.iters)
                dev = dev_time(lambda: run(b, frames))
                audio = frames * HOP / SR
                per = w / b
                devs = ("" if dev is None else
                        f", device {dev * 1e3:7.2f} ms "
                        f"({dev / b / audio:.5f} RTF/stream)")
                print(f"{name} B={b} stop={frames}: wall {w * 1e3:8.1f} ms "
                      f"(median {med * 1e3:8.1f}) -> {per * 1e3:7.2f} ms/"
                      f"stream, per-stream RTF {per / audio:.5f}{devs}",
                      flush=True)


def sweep_sharded(args):
    import jax

    from tacotron2_tpu.config import Config
    from tacotron2_tpu.infer.fused import synthesize_wav_fused
    from tacotron2_tpu.infer.sharded import ShardedSynthesizer
    from tacotron2_tpu.models import tacotron2_init
    from tacotron2_tpu.parallel import make_mesh
    from tacotron2_tpu.text import pad_sequences, text_to_sequence

    cfg = Config()
    params, state = tacotron2_init(jax.random.PRNGKey(0), cfg.model)
    texts = ["The quick brown fox jumps over the lazy dog number %d." % i
             for i in range(max(args.batches))]
    max_steps = args.cap

    # Unsharded fused baseline (exact same program, no mesh).
    import jax.numpy as jnp
    seqs = [text_to_sequence(t) or [0] for t in texts]
    tokens, lengths = pad_sequences(seqs, pad_multiple=16)
    for b in args.batches:
        tk = jnp.asarray(tokens[:b])
        ln = jnp.asarray(lengths[:b])
        run = lambda: np.asarray(synthesize_wav_fused(
            params, state, cfg.model, cfg.audio, tk, ln, None,
            max_steps=max_steps, stop_mode="all")[0])
        run()
        w, med = _wall(run, args.iters)
        fps = b * max_steps / w
        print(f"unsharded fused B={b} cap={max_steps}: wall {w:7.3f} s "
              f"(median {med:7.3f}) -> {fps / 1e3:7.1f}k frames/s aggregate",
              flush=True)

    n_data = args.n_data or len(jax.devices())
    mesh = make_mesh(n_data=n_data, n_model=1,
                     devices=jax.devices()[:n_data])
    with ShardedSynthesizer(params, state, mesh, cfg) as synth:
        for b in args.batches:
            run = lambda: synth(texts[:b], max_steps=max_steps)
            run()
            w, med = _wall(run, args.iters)
            fps = b * max_steps / w
            print(f"sharded({n_data}) B={b} cap={max_steps}: wall {w:7.3f} s "
                  f"(median {med:7.3f}) -> {fps / 1e3:7.1f}k frames/s "
                  f"aggregate (incl. host G2P + trim)", flush=True)


def sweep_buckets(args):
    import jax
    import jax.numpy as jnp

    from tacotron2_tpu.config import Config
    from tacotron2_tpu.infer.fused import synthesize_wav_buckets
    from tacotron2_tpu.models import tacotron2_init

    cfg = Config()
    params, state = tacotron2_init(jax.random.PRNGKey(0), cfg.model)
    rng = np.random.default_rng(0)
    tokens = jnp.asarray(rng.integers(1, 72, (1, 64)), jnp.int32)
    lengths = jnp.full((1,), 64, jnp.int32)

    def run(stop):
        pcm, ends = synthesize_wav_buckets(
            params, state, cfg.model, cfg.audio, tokens, lengths, None,
            max_steps=1000,
            forced_stop_at=None if stop is None else jnp.int32(stop))
        np.asarray(pcm)
        return int(np.asarray(ends)[0])

    n = run(300)
    w, med = _wall(lambda: run(300), args.iters)
    audio = n * HOP / SR
    print(f"bucketed earlystop300: wall {w:.4f} s (median {med:.4f}) over "
          f"{audio:.2f} s audio -> RTF {w / audio:.5f} "
          f"(median {med / audio:.5f})", flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sweep", choices=("mega", "sharded", "buckets"),
                    required=True)
    ap.add_argument("--batches", type=int, nargs="+",
                    default=[1, 8, 16, 32, 64])
    ap.add_argument("--t_enc", type=int, default=128)
    ap.add_argument("--cap", type=int, default=1000)
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--n_data", type=int, default=None,
                    help="mesh data-axis size (default: all devices)")
    ap.add_argument("--bf16", action="store_true",
                    help="mega sweep: cast weights to bf16 (serving mode)")
    args = ap.parse_args()
    enable_persistent_cache()
    {"mega": sweep_mega, "sharded": sweep_sharded,
     "buckets": sweep_buckets}[args.sweep](args)


if __name__ == "__main__":
    main()
