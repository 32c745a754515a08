from .config import load_config, apply_overrides, config_to_dict
