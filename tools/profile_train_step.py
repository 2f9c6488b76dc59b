#!/usr/bin/env python
"""Device-time profile of one training step: module + op-level breakdown.

Traces `train_step` with jax.profiler and aggregates the XPlane "XLA Ops"
events (utils/xplane.py parses the proto) into an op-class breakdown —
the evidence for BASELINE.md's roofline narrative.

    python tools/profile_train_step.py [--batch 128] [--split 1|0] [--top 25]
"""

from __future__ import annotations

import argparse
import collections
import re
import sys
import tempfile

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])  # repo root

from tacotron2_tpu.utils.cache import enable_persistent_cache  # noqa: E402


def op_class(name: str) -> str:
    """Collapse an HLO op name like '%fusion.123 = ... dot(...)' to a
    readable class."""
    m = re.match(r"%([a-zA-Z][a-zA-Z0-9_-]*?)[.\d]*\s*=", name)
    base = m.group(1) if m else name.split(" ", 1)[0].lstrip("%")
    if "custom-call" in name and "tpu_custom_call" in name:
        base = "pallas_custom_call"
    return base


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--t_enc", type=int, default=128)
    ap.add_argument("--t_dec", type=int, default=512)
    ap.add_argument("--split", type=int, default=1,
                    help="1 = split-BPTT decoder backward, 0 = autodiff")
    ap.add_argument("--top", type=int, default=25)
    ap.add_argument("--hlo", default=None,
                    help="also write the optimized HLO text here (maps "
                         "fusion names to source lines)")
    args = ap.parse_args()

    enable_persistent_cache()
    import dataclasses
    import jax

    from tacotron2_tpu.config import Config
    from tacotron2_tpu.train import (create_train_state, make_optimizer,
                                     train_step)
    from tacotron2_tpu.utils.xplane import _newest_xspace

    cfg = Config()
    cfg = dataclasses.replace(cfg, model=dataclasses.replace(
        cfg.model, decoder_split_bptt=bool(args.split)))
    state = create_train_state(cfg, seed=0)
    tx = make_optimizer(cfg.train)
    rng = np.random.default_rng(0)
    b, te, td = args.batch, args.t_enc, args.t_dec

    def batch():
        return {
            "text": rng.integers(1, 72, (b, te)).astype(np.int32),
            "text_lengths": np.full((b,), te, np.int32),
            "mel": rng.standard_normal((b, 80, td)).astype(np.float32) - 5.0,
            "mel_lengths": np.full((b,), td, np.int32),
            "speaker_ids": np.zeros((b,), np.int32),
        }

    def stage(hb):
        db = {k: jax.device_put(v) for k, v in hb.items()}
        for v in db.values():
            np.asarray(v[(0,) * v.ndim])
        return db

    sigma = cfg.guided_attention.sigma_warmup_steps
    state, losses, _ = train_step(state, batch(), cfg=cfg, tx=tx,
                                  use_postnet=True, sigma_warmup_steps=sigma)
    float(losses.total)   # compile + warm
    if args.hlo:
        txt = train_step.lower(state, batch(), cfg=cfg, tx=tx,
                               use_postnet=True,
                               sigma_warmup_steps=sigma).compile().as_text()
        with open(args.hlo, "w") as f:
            f.write(txt)
        print(f"HLO text -> {args.hlo} ({len(txt)} bytes)")
    tb = stage(batch())
    with tempfile.TemporaryDirectory() as tdir:
        with jax.profiler.trace(tdir):
            state, losses, _ = train_step(state, tb, cfg=cfg, tx=tx,
                                          use_postnet=True,
                                          sigma_warmup_steps=sigma)
            float(losses.total)
        xspace = _newest_xspace(tdir)

    per_class = collections.Counter()
    per_op = collections.Counter()
    module_ps = 0
    for plane in xspace.planes:
        if "host" in plane.name.lower():
            continue
        meta = plane.event_metadata
        for line in plane.lines:
            if line.name == "XLA Modules":
                for ev in line.events:
                    if "train_step" in meta[ev.metadata_id].name:
                        module_ps = max(module_ps, ev.duration_ps)
            if line.name != "XLA Ops":
                continue
            for ev in line.events:
                name = meta[ev.metadata_id].name
                per_class[op_class(name)] += ev.duration_ps
                per_op[name.split(" = ", 1)[0]] += ev.duration_ps

    total = sum(per_class.values())
    print(f"\ntrain_step B={b} split={bool(args.split)}: module device "
          f"time {module_ps/1e12*1000:.1f} ms, op-time sum "
          f"{total/1e12*1000:.1f} ms")
    print(f"{'op class':30s} {'ms':>9s} {'%':>6s}")
    for cls, ps in per_class.most_common(args.top):
        print(f"{cls:30s} {ps/1e12*1000:9.2f} {100*ps/total:6.1f}")
    print(f"\ntop individual ops:")
    for op, ps in per_op.most_common(args.top):
        print(f"  {ps/1e12*1000:8.2f} ms  {op[:100]}")


if __name__ == "__main__":
    main()
