#!/usr/bin/env python
"""One-command parity check for the NVIDIA NGC HiFi-GAN generator checkpoint.

The reference's primary vocoder is NVIDIA's NGC generator
(`/root/reference/inference.py:40-54` downloads
``hifigan_gen_checkpoint_10000_ft.pt`` via torch.hub).  This environment
has no network egress, so the converter
(`tacotron2_tpu/models/hifigan.py::params_from_nvidia_state_dict`) has
only ever been validated against synthetic weight-normed checkpoints in
the same layout.  This script closes the residual risk THE MOMENT a real
checkpoint file is available:

    python tools/verify_ngc_checkpoint.py /path/to/hifigan_gen_checkpoint_10000_ft.pt

It verifies, in order:

1. **Key manifest** — the generator state dict's key set and every
   tensor shape against the committed expectation
   (``docs/ngc_hifigan_manifest.json``, regenerate with ``--write-manifest``).
   Both layouts are accepted per conv: plain ``weight`` or weight-normed
   ``weight_g``+``weight_v``.  A ``module.`` prefix (DataParallel save)
   is stripped.
2. **Conversion + forward** — converts to the JAX pytree, runs the
   generator on a deterministic mel, checks shape/finiteness/tanh bound.
3. **Torch cross-parity** (default on; ``--no-torch-parity`` to skip) —
   loads the same weights into an independently-written torch
   implementation of the v1 architecture and compares waveforms
   (expected max |delta| < 2e-4 at fp32).

Prints a JSON report (``--out`` to also write it) and exits non-zero on
any failure.  The file's sha256 is recorded so a known-good checkpoint
can be pinned once verified.
"""

from __future__ import annotations

import argparse
import hashlib
import json
import os
import sys
from typing import Dict, List, Tuple

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])  # repo root

# Honor an explicit JAX_PLATFORMS even where a sitecustomize pins another
# backend at import time (the conversion check is tiny; CI/tests run it
# on CPU without paying a TPU compile round-trip).
if os.environ.get("JAX_PLATFORMS"):
    import jax
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

from tacotron2_tpu.models.hifigan import (  # noqa: E402
    RESBLOCK_DILATIONS, RESBLOCK_KERNELS, UPSAMPLE_INITIAL_CHANNEL,
    UPSAMPLE_KERNELS, UPSAMPLE_RATES, hifigan_apply,
    params_from_nvidia_state_dict)


def expected_manifest() -> Dict[str, Dict[str, List[int]]]:
    """Expected generator keys -> shapes, derived from the architecture
    constants (HiFi-GAN v1 / NVIDIA LJSpeech 22 kHz config).

    Per conv ``<prefix>`` the state dict holds ``<prefix>.bias`` plus
    EITHER ``<prefix>.weight`` OR the weight-normed pair
    ``<prefix>.weight_g`` (norm over all but dim 0, keepdims) +
    ``<prefix>.weight_v`` (full shape).  torch layouts: Conv1d weight is
    (out, in, k) with bias (out,); ConvTranspose1d weight is (in, out, k)
    with bias (out,).
    """
    convs: List[Tuple[str, Tuple[int, ...], int]] = []

    def add(prefix: str, w_shape: Tuple[int, ...], bias_ch: int):
        convs.append((prefix, w_shape, bias_ch))

    ch = UPSAMPLE_INITIAL_CHANNEL
    add("conv_pre", (ch, 80, 7), ch)
    for i, (u, k) in enumerate(zip(UPSAMPLE_RATES, UPSAMPLE_KERNELS)):
        add(f"ups.{i}", (ch, ch // 2, k), ch // 2)   # ConvTranspose1d
        ch //= 2
        for j, (rk, dils) in enumerate(zip(RESBLOCK_KERNELS,
                                           RESBLOCK_DILATIONS)):
            bi = i * len(RESBLOCK_KERNELS) + j
            for c in range(len(dils)):
                add(f"resblocks.{bi}.convs1.{c}", (ch, ch, rk), ch)
                add(f"resblocks.{bi}.convs2.{c}", (ch, ch, rk), ch)
    add("conv_post", (1, ch, 7), 1)

    manifest: Dict[str, Dict[str, List[int]]] = {}
    for prefix, w_shape, bias_ch in convs:
        manifest[prefix] = {
            "weight": list(w_shape),
            "weight_g": [w_shape[0], 1, 1],
            "weight_v": list(w_shape),
            "bias": [bias_ch],
        }
    return manifest


def check_keys(sd: Dict[str, np.ndarray], manifest) -> List[str]:
    """Return a list of human-readable problems (empty = pass)."""
    problems: List[str] = []
    seen = set()
    for prefix, shapes in manifest.items():
        bias_key = f"{prefix}.bias"
        if bias_key not in sd:
            problems.append(f"missing {bias_key}")
        else:
            seen.add(bias_key)
            got = list(sd[bias_key].shape)
            if got != shapes["bias"]:
                problems.append(f"{bias_key}: shape {got} != "
                                f"expected {shapes['bias']}")
        plain = f"{prefix}.weight" in sd
        normed = (f"{prefix}.weight_g" in sd
                  and f"{prefix}.weight_v" in sd)
        if not plain and not normed:
            problems.append(f"missing {prefix}.weight (or weight_g/"
                            f"weight_v pair)")
            continue
        for suffix in (("weight",) if plain else ("weight_g", "weight_v")):
            key = f"{prefix}.{suffix}"
            seen.add(key)
            got = list(sd[key].shape)
            if got != shapes[suffix]:
                problems.append(f"{key}: shape {got} != expected "
                                f"{shapes[suffix]}")
    extra = sorted(set(sd) - seen)
    for key in extra:
        problems.append(f"unexpected key {key} (shape "
                        f"{list(sd[key].shape)})")
    return problems


def _torch_generator(torch):
    """Independent torch HiFi-GAN v1 (cross-check only; mirrors
    tests/test_hifigan.py::_build_torch_hifigan)."""
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
                xt = c2(torch.nn.functional.leaky_relu(c1(xt), 0.1))
                x = x + xt
            return x

    class Generator(nn.Module):
        def __init__(self):
            super().__init__()
            self.conv_pre = nn.Conv1d(80, UPSAMPLE_INITIAL_CHANNEL, 7,
                                      padding=3)
            self.ups = nn.ModuleList()
            self.resblocks = nn.ModuleList()
            ch = UPSAMPLE_INITIAL_CHANNEL
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
                x = up(torch.nn.functional.leaky_relu(x, 0.1))
                acc = None
                for j in range(n):
                    y = self.resblocks[i * n + j](x)
                    acc = y if acc is None else acc + y
                x = acc / n
            x = torch.nn.functional.leaky_relu(x, 0.1)
            return torch.tanh(self.conv_post(x)).squeeze(1)

    return Generator()


def _denormed_torch_sd(torch, sd: Dict[str, np.ndarray]):
    """State dict with weight-norm pairs resolved to plain weights (the
    layout the independent torch generator loads)."""
    from tacotron2_tpu.models.hifigan import _denorm
    out = {}
    prefixes = {k.rsplit(".", 1)[0] for k in sd}
    for prefix in prefixes:
        out[f"{prefix}.weight"] = torch.from_numpy(
            np.ascontiguousarray(_denorm(sd, prefix)))
        out[f"{prefix}.bias"] = torch.from_numpy(
            np.ascontiguousarray(np.asarray(sd[f"{prefix}.bias"],
                                            np.float32)))
    return out


def verify(path: str, torch_parity: bool = True) -> Dict:
    report: Dict = {"checkpoint": path, "ok": False}
    with open(path, "rb") as f:
        report["sha256"] = hashlib.sha256(f.read()).hexdigest()

    import torch
    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    sd_raw = ckpt.get("generator", ckpt) if isinstance(ckpt, dict) else ckpt
    if hasattr(sd_raw, "state_dict"):
        sd_raw = sd_raw.state_dict()
    sd = {}
    for k, v in sd_raw.items():
        k = k[len("module."):] if k.startswith("module.") else k
        sd[k] = v.detach().cpu().numpy()
    report["n_keys"] = len(sd)
    report["layout"] = ("weight_normed"
                        if any(k.endswith(".weight_g") for k in sd)
                        else "plain")

    problems = check_keys(sd, expected_manifest())
    report["manifest_problems"] = problems
    if problems:
        return report

    params = params_from_nvidia_state_dict(sd)
    n_params = sum(int(np.prod(x.shape))
                   for x in __import__("jax").tree_util.tree_leaves(params))
    report["n_params"] = n_params

    rng = np.random.default_rng(0)
    mel = (rng.standard_normal((1, 80, 40)).astype(np.float32) - 5.0)
    wav = np.asarray(hifigan_apply(params, mel))
    report["forward"] = {
        "out_shape": list(wav.shape),
        "expected_shape": [1, 40 * 256],
        "finite": bool(np.isfinite(wav).all()),
        "max_abs": float(np.abs(wav).max()),
    }
    fwd_ok = (wav.shape == (1, 40 * 256)
              and report["forward"]["finite"]
              and report["forward"]["max_abs"] <= 1.0)

    parity_ok = True
    if torch_parity:
        gen = _torch_generator(torch)
        gen.load_state_dict(_denormed_torch_sd(torch, sd))
        gen.eval()
        with torch.no_grad():
            ref = gen(torch.from_numpy(mel)).numpy()
        max_delta = float(np.abs(np.asarray(wav) - ref).max())
        report["torch_parity"] = {"max_abs_delta": max_delta,
                                  "threshold": 2e-4}
        parity_ok = max_delta < 2e-4

    report["ok"] = bool(fwd_ok and parity_ok)
    return report


def main():
    ap = argparse.ArgumentParser(
        description="Verify an NVIDIA NGC HiFi-GAN generator checkpoint "
                    "against this framework's converter.")
    ap.add_argument("checkpoint", nargs="?",
                    help="path to hifigan_gen_checkpoint_*.pt")
    ap.add_argument("--no-torch-parity", action="store_true",
                    help="skip the independent-torch forward cross-check")
    ap.add_argument("--out", help="also write the JSON report here")
    ap.add_argument("--write-manifest", metavar="PATH",
                    help="write the expected key/shape manifest as JSON "
                         "and exit (used to generate "
                         "docs/ngc_hifigan_manifest.json)")
    args = ap.parse_args()

    if args.write_manifest:
        with open(args.write_manifest, "w") as f:
            json.dump(expected_manifest(), f, indent=1, sort_keys=True)
            f.write("\n")
        print(f"manifest written: {args.write_manifest}")
        return
    if not args.checkpoint:
        ap.error("checkpoint path required (or --write-manifest)")

    report = verify(args.checkpoint,
                    torch_parity=not args.no_torch_parity)
    print(json.dumps(report, indent=1))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(report, f, indent=1)
            f.write("\n")
    sys.exit(0 if report["ok"] else 1)


if __name__ == "__main__":
    main()
