from .attention import (AttentionState, attention_init, attention_init_state,
                        attention_step, precompute_memory)
from .decoder import (DecoderCarry, decode_step, decoder_infer, decoder_init,
                      decoder_teacher_forced, init_carry, prenet_apply)
from .encoder import encoder_apply, encoder_init
from .postnet import postnet_apply, postnet_init
from .tacotron2 import (Tacotron2Output, cast_params_bf16,
                        init_projection_bias, make_pad_mask, param_count,
                        tacotron2_forward, tacotron2_infer,
                        tacotron2_infer_jit, tacotron2_init)

__all__ = [
    "AttentionState", "attention_init", "attention_init_state",
    "attention_step", "precompute_memory", "DecoderCarry", "decode_step",
    "decoder_infer", "decoder_init", "decoder_teacher_forced", "init_carry",
    "prenet_apply", "encoder_apply", "encoder_init", "postnet_apply",
    "postnet_init", "Tacotron2Output", "init_projection_bias",
    "make_pad_mask", "param_count", "tacotron2_forward", "tacotron2_infer",
    "tacotron2_infer_jit", "tacotron2_init", "cast_params_bf16",
]
