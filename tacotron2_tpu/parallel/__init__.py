from .distributed import (distributed_env_configured, global_batch_from_local,
                          initialize_distributed)
from .mesh import (batch_spec, make_mesh, param_shardings, replicated,
                   shard_batch, shard_params, shard_train_state)

__all__ = ["make_mesh", "replicated", "batch_spec", "shard_batch",
           "shard_params", "param_shardings", "shard_train_state",
           "initialize_distributed", "global_batch_from_local",
           "distributed_env_configured"]
