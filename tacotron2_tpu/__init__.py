"""TPU-native Tacotron 2 TTS framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
`Angad8285/pytorch-tacotron2-implementation` (single-device PyTorch):
text frontend, jitted mel DSP, scan-based Tacotron 2, guided-attention
training loop, Griffin-Lim + HiFi-GAN vocoders, and mesh-sharded
data-parallel training.
"""

__version__ = "0.1.0"

from .config import (DEFAULT_CONFIG, N_SYMBOLS, SYMBOL_TO_ID, SYMBOLS,
                     AudioConfig, Config, GuidedAttentionConfig, ModelConfig,
                     TrainConfig)

__all__ = [
    "Config", "AudioConfig", "ModelConfig", "TrainConfig",
    "GuidedAttentionConfig", "DEFAULT_CONFIG", "SYMBOLS", "SYMBOL_TO_ID",
    "N_SYMBOLS",
]
