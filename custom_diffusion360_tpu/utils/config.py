"""Config system: nested frozen dataclasses + YAML/dotlist overrides.

Replaces the reference's three-tier OmegaConf/argparse/instantiate_from_config
glue (main.py:37-268,782-797; sgm/util.py:168-186). The object graph is
static (EngineConfig and friends), so "config" reduces to overriding fields:

    cfg = load_config(EngineConfig(), "run.yaml", ["unet.num_samples=16"])

YAML files and dotlist strings share one override path; values are parsed
with YAML semantics (ints/floats/bools/lists). Component *selection* (e.g.
sampler or guider kind) stays a string field resolved by the CLI — a
registry of two dozen `target:` class paths is torch-era indirection the
functional design does not need.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Iterable, Mapping, Optional


def _parse_scalar(s: str):
    try:
        import yaml

        return yaml.safe_load(s)
    except Exception:
        return s


def _replace_path(cfg, path: list, value):
    """Immutable nested dataclasses.replace along a dotted path."""
    field = path[0]
    if not dataclasses.is_dataclass(cfg):
        raise TypeError(f"cannot descend into {type(cfg).__name__} at {field!r}")
    names = {f.name for f in dataclasses.fields(cfg)}
    if field not in names:
        raise KeyError(
            f"unknown config field {field!r} on {type(cfg).__name__} "
            f"(valid: {sorted(names)})"
        )
    cur = getattr(cfg, field)
    if len(path) == 1:
        if dataclasses.is_dataclass(cur) and isinstance(value, Mapping):
            new = _merge_mapping(cur, value)
        else:
            if isinstance(cur, tuple) and isinstance(value, list):
                value = tuple(value)
            new = value
    else:
        new = _replace_path(cur, path[1:], value)
    return dataclasses.replace(cfg, **{field: new})


def _merge_mapping(cfg, mapping: Mapping):
    for k, v in mapping.items():
        cfg = _replace_path(cfg, k.split("."), v)
    return cfg


def apply_overrides(cfg, overrides: Iterable[str]):
    """Dotlist overrides: ["unet.num_samples=16", "loss.loss_fg_lambda=5"]."""
    for item in overrides or ():
        key, _, raw = item.partition("=")
        cfg = _replace_path(cfg, key.strip().split("."), _parse_scalar(raw.strip()))
    return cfg


def load_config(cfg, yaml_path: Optional[str] = None, overrides: Iterable[str] = ()):
    if yaml_path:
        import yaml

        with open(yaml_path) as f:
            data = yaml.safe_load(f) or {}
        cfg = _merge_mapping(cfg, data)
    return apply_overrides(cfg, overrides)


def config_to_dict(cfg) -> Any:
    """Recursively serialize for logging/saving (tuples -> lists)."""
    if dataclasses.is_dataclass(cfg):
        return {
            f.name: config_to_dict(getattr(cfg, f.name))
            for f in dataclasses.fields(cfg)
        }
    if isinstance(cfg, tuple):
        return [config_to_dict(x) for x in cfg]
    return cfg
