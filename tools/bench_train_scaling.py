"""Training-step scaling measurement: ms/step + frames/s at given batch sizes.

Reproduces the BASELINE.md training-scaling table on the real TPU with
device-staged batches (the measurement convention: the training loop's
prefetch overlaps host work and H2D with device compute, so the clock
starts after the batch is resident).  Runs each batch size with the
split-BPTT decoder backward ON and OFF (ops/decoder_bptt.py) for A/B.

    python tools/bench_train_scaling.py 16,128
"""
import sys
sys.path.insert(0, __file__.rsplit("/", 2)[0])  # repo root
import dataclasses
import time

import numpy as np

from tacotron2_tpu.utils.cache import enable_persistent_cache
enable_persistent_cache()
import jax
import jax.numpy as jnp

from tacotron2_tpu.config import Config
from tacotron2_tpu.train import create_train_state, make_optimizer, train_step

print("devices:", jax.devices(), flush=True)
rng = np.random.default_rng(0)


def batch(b, t_enc, t_dec, n_mels=80):
    return {
        "text": rng.integers(1, 72, (b, t_enc)).astype(np.int32),
        "text_lengths": np.full((b,), t_enc, np.int32),
        "mel": rng.standard_normal((b, n_mels, t_dec)).astype(np.float32) - 5.0,
        "mel_lengths": np.full((b,), t_dec, np.int32),
        "speaker_ids": np.zeros((b,), np.int32),
    }


def stage(hb):
    db = {k: jax.device_put(v) for k, v in hb.items()}
    for v in db.values():
        np.asarray(v[(0,) * v.ndim])
    return db


def measure(split, b, t_enc=128, t_dec=512, iters=5):
    cfg = Config()
    cfg = dataclasses.replace(
        cfg, model=dataclasses.replace(cfg.model, decoder_split_bptt=split))
    tstate = create_train_state(cfg, seed=0)
    tx = make_optimizer(cfg.train)
    sigma = cfg.guided_attention.sigma_warmup_steps
    t0 = time.time()
    tstate, losses0, _ = train_step(tstate, batch(b, t_enc, t_dec), cfg=cfg,
                                    tx=tx, use_postnet=True,
                                    sigma_warmup_steps=sigma)
    l0 = float(losses0.total)
    print(f"  split={split} B={b}: compile+first {time.time()-t0:.1f}s "
          f"loss {l0:.4f}", flush=True)
    walls = []
    for _ in range(iters):
        tb = stage(batch(b, t_enc, t_dec))
        t0 = time.time()
        tstate, losses, _ = train_step(tstate, tb, cfg=cfg, tx=tx,
                                       use_postnet=True,
                                       sigma_warmup_steps=sigma)
        float(losses.total)
        walls.append(time.time() - t0)
    w = float(np.min(walls))
    fps = b * t_dec / w
    print(f"  split={split} B={b}: {w*1000:.1f} ms/step = {fps/1000:.1f}k "
          f"frames/s (median {np.median(walls)*1000:.1f} ms) "
          f"loss {float(losses.total):.4f}", flush=True)
    return w, fps


if __name__ == "__main__":
    bs = [int(x) for x in sys.argv[1].split(",")] if len(sys.argv) > 1 \
        else [16, 128]
    for b in bs:
        for split in (False, True):
            try:
                measure(split, b)
            except Exception as e:
                print(f"  split={split} B={b}: FAILED {type(e).__name__}: "
                      f"{str(e)[:300]}", flush=True)
