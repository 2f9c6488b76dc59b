from .torch_compat import (params_from_torch_state_dict,
                           torch_state_dict_from_params)

__all__ = ["params_from_torch_state_dict", "torch_state_dict_from_params"]
