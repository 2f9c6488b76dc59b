"""Global configuration for the TPU-native Tacotron 2 framework.

Frozen dataclasses mirroring every constant of the reference's flat config
module (reference: src/config.py:1-68), grouped the same way: audio, symbol
table, model dims, and training schedule.  Values are identical to the
reference so behavior (mel extraction, model capacity, schedules) matches.

Unlike the reference (a mutable module namespace), configs here are immutable
pytree-compatible dataclasses so they can be closed over by jitted functions
without retracing hazards.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

# ---------------------------------------------------------------------------
# Symbol table (reference: src/config.py:14-23) — 72 entries: 69 ARPAbet
# phonemes with stress markers, plus space, period, comma.
# ---------------------------------------------------------------------------
SYMBOLS: Tuple[str, ...] = (
    'AA0', 'AA1', 'AA2', 'AE0', 'AE1', 'AE2', 'AH0', 'AH1', 'AH2',
    'AO0', 'AO1', 'AO2', 'AW0', 'AW1', 'AW2', 'AY0', 'AY1', 'AY2',
    'B', 'CH', 'D', 'DH', 'EH0', 'EH1', 'EH2', 'ER0', 'ER1', 'ER2',
    'EY0', 'EY1', 'EY2', 'F', 'G', 'HH', 'IH0', 'IH1', 'IH2', 'IY0',
    'IY1', 'IY2', 'JH', 'K', 'L', 'M', 'N', 'NG', 'OW0', 'OW1',
    'OW2', 'OY0', 'OY1', 'OY2', 'P', 'R', 'S', 'SH', 'T', 'TH',
    'UH0', 'UH1', 'UH2', 'UW0', 'UW1', 'UW2', 'V', 'W', 'Y', 'Z', 'ZH',
    ' ', '.', ','
)

SYMBOL_TO_ID = {s: i for i, s in enumerate(SYMBOLS)}
N_SYMBOLS = len(SYMBOLS)


@dataclasses.dataclass(frozen=True)
class AudioConfig:
    """Audio/DSP parameters (reference: src/config.py:1-8)."""
    sampling_rate: int = 22050
    n_fft: int = 1024
    hop_length: int = 256
    win_length: int = 1024
    n_mels: int = 80
    fmin: float = 0.0
    fmax: float = 8000.0
    # log(clip(mel_power, eps)) dynamic-range floor (reference: src/audio.py:25)
    mel_eps: float = 1e-5


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    """Tacotron 2 architecture parameters (reference: src/config.py:25-59)."""
    n_symbols: int = N_SYMBOLS
    symbols_embedding_dim: int = 512

    # Encoder (reference: src/config.py:28-31)
    encoder_n_convolutions: int = 3
    encoder_embedding_dim: int = 512
    encoder_kernel_size: int = 5

    # Decoder (reference: src/config.py:33-40)
    n_mels: int = 80
    decoder_rnn_dim: int = 1024
    prenet_dim: int = 256
    max_decoder_steps: int = 1000
    gate_threshold: float = 0.5
    p_attention_dropout: float = 0.1
    p_decoder_dropout: float = 0.1
    p_prenet_dropout: float = 0.5
    p_postnet_dropout: float = 0.5

    # Attention (reference: src/config.py:42-48)
    attention_rnn_dim: int = 1024
    attention_dim: int = 128
    location_n_filters: int = 32
    location_kernel_size: int = 31
    # Learnable energy temperature, init >1 for mild sharpening
    # (reference: src/model.py:102)
    energy_scale_init: float = 1.2
    # Gate (stop token) bias init, sigmoid(-3) ~= 0.047
    # (reference: src/model.py:214-217)
    gate_bias_init: float = -3.0

    # PostNet (reference: src/config.py:56-59)
    postnet_embedding_dim: int = 512
    postnet_kernel_size: int = 5
    postnet_n_convolutions: int = 5

    # Multi-speaker extension (new capability; the reference records
    # speaker_id in metadata but never consumes it, prepare_metadata.py:47-51)
    n_speakers: int = 1
    speaker_embedding_dim: int = 64

    # BatchNorm running-stat momentum (torch nn.BatchNorm1d default)
    batchnorm_momentum: float = 0.1
    batchnorm_eps: float = 1e-5

    # Unroll factor for the teacher-forced decoder scan.  Unrolling lets
    # XLA software-pipeline several decode steps per loop iteration
    # (fewer loop-carried barriers for the 512-step scan); must divide or
    # pad-divide T_dec.  1 = no unrolling.
    decoder_scan_unroll: int = 1

    # Rematerialize the decoder step in the teacher-forced scan's backward
    # pass (jax.checkpoint): trades ~2x decoder-step recompute for not
    # storing per-step attention/LSTM activations — at (B=16, T_dec~800,
    # T_enc=128) the qsum residuals alone are ~4 GB fp32.  Off by default
    # (fits comfortably in 16 GB HBM at reference scale).
    remat_decoder_step: bool = False

    # Remat policy when remat_decoder_step is on: "full" recomputes the
    # whole step (max memory savings, ~35% slower at B=256); "dots" keeps
    # matmul outputs resident and recomputes only elementwise ops
    # (jax.checkpoint_policies.dots_saveable) — a cheaper middle ground
    # when the elementwise residuals (LSTM gate activations, attention
    # tanh/softmax) are what overflow HBM.
    decoder_remat_policy: str = "full"

    # Split-BPTT custom backward for the teacher-forced decoder scan
    # (ops/decoder_bptt.py): the reverse pass carries no weight-gradient
    # accumulators (it emits per-step gate gradients and the dW
    # contractions run as single time-batched MXU matmuls after the
    # loop), and stores only O(B) carries per step instead of the
    # attention qsum residuals.  ``remat_decoder_step`` (an explicit
    # memory/speed request) takes precedence and uses plain autodiff;
    # env kill-switch TACOTRON2_SPLIT_BPTT=0 for A/B measurement.
    decoder_split_bptt: bool = True

    # Whole-decode Pallas megakernel for autoregressive inference
    # (ops/decoder_megakernel.py): one kernel whose grid is the time
    # axis, keeping all decoder weights + the encoder memory VMEM-
    # resident across steps instead of re-streaming ~72 MB (fp32) of
    # parameters from HBM per decoded frame.  TPU-only (the while_loop
    # path is used elsewhere); env kill-switch TACOTRON2_MEGA_DECODER.
    decoder_megakernel: bool = True


@dataclasses.dataclass(frozen=True)
class GuidedAttentionConfig:
    """Diagonal-Gaussian attention guidance schedule
    (reference: src/config.py:50-54, train.py:126-217)."""
    initial_sigma_factor: float = 0.05   # initial sigma = max(3, factor*text_len)
    sigma_warmup_steps: int = 4000       # steps over which sigma anneals to 1.0
    min_sigma: float = 1.0
    max_sigma_cap: float = 20.0
    # Loss-side schedule (reference: train.py:133-137)
    weight_start: float = 1.0
    min_weight: float = 0.2
    entropy_target: float = 3.5
    kl_clamp: float = 150.0


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    """Training schedule (reference: src/config.py:61-68, train.py defaults)."""
    seed: int = 1234                      # reference: train.py:300
    learning_rate: float = 1e-3           # reference: train.py:622
    batch_size: int = 16                  # reference: train.py:621
    epochs: int = 100                     # reference: train.py:620
    lr_decay_milestones: Tuple[int, ...] = (50000, 100000, 150000)
    lr_decay_gamma: float = 0.8
    attention_lr_multiplier: float = 1.5  # x2.0 in debug (train.py:352)
    debug_attention_lr_multiplier: float = 2.0
    postnet_freeze_steps: int = 3000
    max_grad_norm: float = 1.0
    save_every_steps: int = 5000
    # Per-epoch checkpoint retention: keep the newest N epoch
    # checkpoints (best_model / step_* are never pruned).  0 keeps all —
    # the reference's behavior (train.py:537-582), which at ~300 MB per
    # full TrainState fills a disk in a few hundred epochs.
    keep_epoch_ckpts: int = 5
    accumulation_steps: int = 1
    # Mixed-precision training policy — the TPU counterpart of the
    # reference's CUDA AMP autocast+GradScaler (reference:
    # train.py:389-392,518-523).  "bfloat16" keeps fp32 master weights and
    # Adam moments and casts parameters to bf16 inside the jitted step, so
    # every matmul/conv runs the MXU in single-pass bf16 with fp32
    # accumulation; elementwise math, loss, and BatchNorm statistics stay
    # fp32.  No loss scaling is needed (bf16 shares fp32's exponent range).
    # "float32" disables the cast (exact-parity mode used by tests).
    precision: str = "bfloat16"
    # Debug overfit mode (reference: train.py:396-486)
    debug_batch_size: int = 8
    debug_sigma_warmup_steps: int = 800   # reference: train.py:356
    debug_success_mel_l1: float = 1.0     # reference: train.py:458
    # Static-shape bucketing (TPU-native addition; XLA needs fixed shapes)
    text_pad_multiple: int = 32
    mel_pad_multiple: int = 64


@dataclasses.dataclass(frozen=True)
class Config:
    audio: AudioConfig = dataclasses.field(default_factory=AudioConfig)
    model: ModelConfig = dataclasses.field(default_factory=ModelConfig)
    guided_attention: GuidedAttentionConfig = dataclasses.field(
        default_factory=GuidedAttentionConfig)
    train: TrainConfig = dataclasses.field(default_factory=TrainConfig)


DEFAULT_CONFIG = Config()
