#!/usr/bin/env python
"""Overlay two trainers' per-epoch curves from their training logs.

Both this framework's trainer and the reference's emit the same epoch
lines (by design — utils/logging mirrors reference train.py:552,558):

    Epoch N complete. Avg Loss: X, Time: Ys
    Validation | Epoch N Mel X Gate Y AttnEntropy Z

This tool parses any number of such logs and writes a small-multiples
PNG (one panel per metric, one y-axis per panel, two fixed series
colors) plus a JSON summary of the per-epoch values — the curve-for-curve
head-to-head evidence VERDICT r2 item 6 asks for.

    python tools/plot_head_to_head.py out.png \
        --log "Reference (torch, CPU)=ref/training_log.txt" \
        --log "tacotron2_tpu (JAX, TPU)=jax/training_log.txt"
"""

from __future__ import annotations

import argparse
import json
import re
from typing import Dict, List

_EPOCH_RE = re.compile(
    r"Epoch\s+(\d+) complete\. Avg Loss: ([0-9.eE+-]+)")
_VAL_RE = re.compile(
    r"Validation \| Epoch\s+(\d+) Mel ([0-9.eE+-]+) Gate ([0-9.eE+-]+) "
    r"AttnEntropy ([0-9.eE+-]+)")

# fixed categorical order (never cycled): slot 1 blue, slot 2 orange
_COLORS = ["#2a78d6", "#eb6834", "#1baf7a", "#eda100"]
_INK, _INK2, _SURFACE = "#0b0b0b", "#52514e", "#fcfcfb"


def parse_log(path: str) -> Dict[str, Dict[int, float]]:
    out: Dict[str, Dict[int, float]] = {
        "train_loss": {}, "val_mel": {}, "val_gate": {}, "val_entropy": {}}
    with open(path, errors="replace") as f:
        for line in f:
            m = _EPOCH_RE.search(line)
            if m:
                out["train_loss"][int(m.group(1))] = float(m.group(2))
            m = _VAL_RE.search(line)
            if m:
                ep = int(m.group(1))
                out["val_mel"][ep] = float(m.group(2))
                out["val_gate"][ep] = float(m.group(3))
                out["val_entropy"][ep] = float(m.group(4))
    return out


_PANELS = [("val_mel", "Validation mel L1", False),
           ("val_gate", "Validation gate BCE", True),
           ("val_entropy", "Validation attention entropy", False),
           ("train_loss", "Training loss (epoch avg)", True)]


def plot(series: Dict[str, Dict[str, Dict[int, float]]], out_png: str):
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, axes = plt.subplots(2, 2, figsize=(11, 7), dpi=130)
    fig.patch.set_facecolor(_SURFACE)
    for ax, (key, title, logscale) in zip(axes.flat, _PANELS):
        ax.set_facecolor(_SURFACE)
        for i, (name, curves) in enumerate(series.items()):
            pts = sorted(curves[key].items())
            if not pts:
                continue
            xs, ys = zip(*pts)
            color = _COLORS[i % len(_COLORS)]
            ax.plot(xs, ys, color=color, linewidth=2, label=name)
            # selective direct label: final value only
            ax.annotate(f"{ys[-1]:.3g}", (xs[-1], ys[-1]),
                        textcoords="offset points", xytext=(4, 0),
                        fontsize=8, color=_INK2)
        if logscale:
            ax.set_yscale("log")
        ax.set_title(title, fontsize=10, color=_INK, loc="left")
        ax.set_xlabel("epoch", fontsize=8, color=_INK2)
        ax.tick_params(labelsize=8, colors=_INK2)
        ax.grid(True, linewidth=0.5, alpha=0.25)
        for s in ax.spines.values():
            s.set_visible(False)
    axes.flat[0].legend(fontsize=8, frameon=False, loc="upper right")
    fig.tight_layout()
    fig.savefig(out_png, facecolor=_SURFACE)
    print(f"wrote {out_png}")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("out_png")
    p.add_argument("--log", action="append", required=True,
                   metavar="NAME=PATH", help="labeled training log (repeat)")
    p.add_argument("--json", default=None,
                   help="also dump parsed per-epoch values as JSON")
    a = p.parse_args()
    series = {}
    for spec in a.log:
        name, _, path = spec.partition("=")
        series[name] = parse_log(path)
        n_ep = len(series[name]["val_mel"])
        print(f"{name}: {n_ep} validation epochs parsed from {path}")
    plot(series, a.out_png)
    if a.json:
        with open(a.json, "w") as f:
            json.dump(series, f, indent=1)
        print(f"wrote {a.json}")


if __name__ == "__main__":
    main()
