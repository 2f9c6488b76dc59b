#!/usr/bin/env python
"""Convert checkpoints between the PyTorch reference and this framework.

Reference users can bring trained models across (and go back):

    # reference .pth (train.py:575-582 dict or bare state_dict) -> orbax
    python convert_checkpoint.py torch2jax tacotron2_epoch_5.pth ckpt_dir/

    # this framework's checkpoint -> reference-layout state_dict .pth
    python convert_checkpoint.py jax2torch ckpt_dir/ model.pth
"""

import argparse


def torch2jax(src: str, dst: str) -> None:
    import torch

    from tacotron2_tpu.config import ModelConfig
    from tacotron2_tpu.train.checkpoint import save_params_only
    from tacotron2_tpu.utils.torch_compat import params_from_torch_state_dict

    ckpt = torch.load(src, map_location="cpu", weights_only=False)
    sd = ckpt.get("model_state_dict", ckpt)
    sd_np = {k: v.detach().cpu().numpy() for k, v in sd.items()}
    params, state = params_from_torch_state_dict(sd_np, ModelConfig())
    save_params_only(dst, params, state)
    print(f"Converted {src} -> {dst} "
          f"({sum(v.size for v in sd_np.values()):,} params)")


def jax2torch(src: str, dst: str) -> None:
    import torch

    from tacotron2_tpu.config import Config, ModelConfig
    from tacotron2_tpu.infer import load_model
    from tacotron2_tpu.utils.torch_compat import torch_state_dict_from_params

    params, state = load_model(src, Config())
    sd_np = torch_state_dict_from_params(params, state, ModelConfig())
    sd = {k: torch.from_numpy(v.copy()) for k, v in sd_np.items()}
    torch.save({"model_state_dict": sd}, dst)
    print(f"Converted {src} -> {dst} ({len(sd)} tensors)")


if __name__ == "__main__":
    from tacotron2_tpu.utils.cache import enable_persistent_cache
    enable_persistent_cache()  # also honors JAX_PLATFORMS=cpu (no chip needed)
    parser = argparse.ArgumentParser()
    parser.add_argument("direction", choices=["torch2jax", "jax2torch"])
    parser.add_argument("src", type=str)
    parser.add_argument("dst", type=str)
    args = parser.parse_args()
    if args.direction == "torch2jax":
        torch2jax(args.src, args.dst)
    else:
        jax2torch(args.src, args.dst)
