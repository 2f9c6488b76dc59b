"""Alignment heatmap plotting (reference: train.py:219-241)."""

from __future__ import annotations

import numpy as np


def save_alignment_plot(alignments, path: str, sample_index: int = 0) -> None:
    """Save a (T_dec, T_enc) attention heatmap PNG for one sample.

    alignments: (B, T_dec, T_enc) array (numpy or JAX).
    """
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    a = np.asarray(alignments)
    if sample_index >= a.shape[0]:
        sample_index = 0
    matrix = a[sample_index]  # (T_dec, T_enc)

    fig, ax = plt.subplots(figsize=(10, 6))
    im = ax.imshow(matrix, aspect="auto", origin="lower",
                   interpolation="none", cmap="viridis")
    fig.colorbar(im, ax=ax)
    plt.xlabel("Encoder timestep (Phonemes)")
    plt.ylabel("Decoder timestep")
    plt.title(f"Attention Alignment (sample {sample_index})")
    plt.tight_layout()
    plt.savefig(path)
    plt.close(fig)
