#!/usr/bin/env python
"""Export a tacotron2_tpu processed corpus to the reference's cache format.

The reference trainer consumes per-utterance ``torch.save``'d caches —
``mels/<base>.pt`` holding an (n_mels, T) float array and
``text/<base>.pt`` holding a 1-D LongTensor of token IDs — discovered via
a pandas-read ``metadata.csv`` with a ``filepath`` column (reference:
src/data_utils.py:14-40).  This tool converts this framework's ``.npy``
caches into that layout so BOTH trainers can be run head-to-head on the
IDENTICAL preprocessed data (same mels, same token sequences).

    python tools/export_reference_corpus.py PROCESSED_DIR OUT_DIR \
        [--val_count N]

With ``--val_count N`` the last N metadata rows are split into
``metadata_val.csv`` (and the rest into ``metadata_train.csv``) in BOTH
directories, so the two trainers also share the exact train/val split.
"""

from __future__ import annotations

import argparse
import csv
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))   # runnable from any cwd

from tacotron2_tpu.data.metadata import basename_of  # noqa: E402


def export(processed_dir: str, out_dir: str, val_count: int = 0) -> int:
    import torch

    os.makedirs(os.path.join(out_dir, "mels"), exist_ok=True)
    os.makedirs(os.path.join(out_dir, "text"), exist_ok=True)
    meta_path = os.path.join(processed_dir, "metadata.csv")
    with open(meta_path, newline="") as f:
        rows = list(csv.DictReader(f))

    n = 0
    for row in rows:
        base = basename_of(row["filepath"])
        mel = np.load(os.path.join(processed_dir, "mels", f"{base}.npy"))
        seq = np.load(os.path.join(processed_dir, "text", f"{base}.npy"))
        # the reference wraps the mel in FloatTensor() on load, so a raw
        # numpy array is fine; text is indexed into a LongTensor directly
        torch.save(torch.from_numpy(mel.astype(np.float32)),
                   os.path.join(out_dir, "mels", f"{base}.pt"))
        torch.save(torch.from_numpy(seq.astype(np.int64)),
                   os.path.join(out_dir, "text", f"{base}.pt"))
        n += 1

    import shutil
    shutil.copy(meta_path, os.path.join(out_dir, "metadata.csv"))

    if val_count > 0:
        if val_count >= len(rows):
            raise SystemExit(f"--val_count {val_count} >= corpus {len(rows)}")
        header = list(rows[0].keys())
        for d in (processed_dir, out_dir):
            for name, subset in (("metadata_train.csv", rows[:-val_count]),
                                 ("metadata_val.csv", rows[-val_count:])):
                with open(os.path.join(d, name), "w", newline="") as f:
                    w = csv.DictWriter(f, fieldnames=header)
                    w.writeheader()
                    w.writerows(subset)
    return n


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("processed_dir")
    p.add_argument("out_dir")
    p.add_argument("--val_count", type=int, default=0,
                   help="split the last N rows into metadata_val.csv "
                        "(written to BOTH dirs)")
    a = p.parse_args()
    n = export(a.processed_dir, a.out_dir, a.val_count)
    print(f"Exported {n} items -> {a.out_dir}"
          + (f" (train/val split: {n - a.val_count}/{a.val_count})"
             if a.val_count else ""))
