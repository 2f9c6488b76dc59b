from .checkpoint import (load_any_checkpoint, restore_checkpoint,
                         restore_params_only, save_checkpoint,
                         save_params_only)
from .loop import export_debug_inference, train, validate
from .loss import (LossOutput, build_gate_target, diagonal_attention_target,
                   tacotron2_loss)
from .optim import make_optimizer, milestone_schedule
from .state import TrainState, create_train_state
from .step import (cast_params_for_compute, compute_dtype_of, eval_step,
                   train_step, train_step_accum)

__all__ = [
    "train", "validate", "export_debug_inference", "LossOutput",
    "build_gate_target", "diagonal_attention_target", "tacotron2_loss",
    "make_optimizer", "milestone_schedule", "TrainState",
    "create_train_state", "eval_step", "train_step", "train_step_accum",
    "save_checkpoint", "restore_checkpoint", "save_params_only",
    "restore_params_only", "load_any_checkpoint",
]
