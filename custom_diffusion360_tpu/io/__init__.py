"""Checkpoint I/O: torch/safetensors import, delta checkpoints, orbax state."""
from .torch_convert import (
    load_torch_state_dict,
    convert_unet_state_dict,
    convert_vae_state_dict,
    convert_clip_l_state_dict,
    convert_open_clip_state_dict,
    load_sdxl_checkpoint,
)
from .delta import (
    apply_delta_state_dict,
    extract_delta,
    save_delta_npz,
    load_delta_npz,
)
