"""Recursive dataclass config construction + dotted-path CLI overrides.

Makes every field of every (nested, frozen) TrainConfig reachable from the
command line, replacing the reference's per-script argparse walls
(image/train.py:483-555, protein/fmif/train_fmif.py:732-800,
molecule/semlaflow/train.py:454-545) with two generic mechanisms:

  --config recipe.json         # full/partial config tree as JSON
  --set optim.lr=3e-4          # dotted-path override, JSON-parsed values
  --set loss.enc_names='["dinov2","qwen2vl"]'

`build` constructs nested frozen dataclasses from plain dicts (lists coerce
to tuples for hashability); `apply_overrides` rebuilds the frozen tree along
the dotted path; `snapshot` writes the resolved config next to checkpoints.
"""

from __future__ import annotations

import dataclasses
import json
import os
import typing
from typing import Any, Dict, Optional, Sequence


def _resolve_hints(cls) -> Dict[str, Any]:
    try:
        return typing.get_type_hints(cls)
    except Exception:
        return {f.name: f.type for f in dataclasses.fields(cls)}


def _unwrap_optional(tp):
    origin = typing.get_origin(tp)
    if origin is typing.Union:
        args = [a for a in typing.get_args(tp) if a is not type(None)]
        if len(args) == 1:
            return args[0]
    return tp


def _coerce(tp, value):
    tp = _unwrap_optional(tp)
    if value is None:
        return None
    if dataclasses.is_dataclass(tp) and isinstance(value, dict):
        return build(tp, value)
    if isinstance(value, list):
        # frozen configs hold tuples, never lists (hashability for jit
        # static args); any list from JSON becomes a tuple
        return tuple(value)
    if tp is float and isinstance(value, int):
        return float(value)
    return value


def build(cls, data: Optional[Dict[str, Any]] = None):
    """Construct dataclass `cls` from a plain dict, recursing into nested
    dataclass fields and coercing lists to tuples. Unknown keys are an error
    (catches recipe typos)."""
    data = data or {}
    if not dataclasses.is_dataclass(cls):
        raise TypeError(f"{cls} is not a dataclass")
    hints = _resolve_hints(cls)
    names = {f.name for f in dataclasses.fields(cls)}
    unknown = set(data) - names
    if unknown:
        raise KeyError(f"unknown config keys for {cls.__name__}: "
                       f"{sorted(unknown)}; valid: {sorted(names)}")
    kwargs = {}
    for f in dataclasses.fields(cls):
        if f.name not in data:
            continue
        kwargs[f.name] = _coerce(hints.get(f.name, Any), data[f.name])
    return cls(**kwargs)


def merge(cfg, data: Dict[str, Any]):
    """Return a copy of `cfg` updated with `data` (recursive: dict values for
    nested dataclass fields merge into the existing sub-config)."""
    hints = _resolve_hints(type(cfg))
    updates = {}
    for key, value in data.items():
        if not any(f.name == key for f in dataclasses.fields(cfg)):
            raise KeyError(f"unknown config key {key!r} for "
                           f"{type(cfg).__name__}")
        current = getattr(cfg, key)
        if dataclasses.is_dataclass(current) and isinstance(value, dict):
            updates[key] = merge(current, value)
        else:
            updates[key] = _coerce(hints.get(key, Any), value)
    return dataclasses.replace(cfg, **updates)


def parse_value(text: str):
    """JSON first (numbers, bools, lists, null), bare string fallback."""
    try:
        return json.loads(text)
    except (json.JSONDecodeError, ValueError):
        return text


def apply_overrides(cfg, overrides: Sequence[str]):
    """Apply `path.to.field=value` overrides to a frozen dataclass tree."""
    for item in overrides or ():
        if "=" not in item:
            raise ValueError(f"--set expects key=value, got {item!r}")
        path, _, raw = item.partition("=")
        keys = path.strip().split(".")
        value = parse_value(raw)
        nested: Dict[str, Any] = {}
        current = nested
        for k in keys[:-1]:
            current[k] = {}
            current = current[k]
        current[keys[-1]] = value
        cfg = merge(cfg, nested)
    return cfg


def load_file(path: str) -> Dict[str, Any]:
    with open(path) as f:
        return json.load(f)


def resolve(cfg, config_path: Optional[str] = None,
            overrides: Optional[Sequence[str]] = None):
    """defaults (cfg) <- config file <- --set overrides."""
    if config_path:
        cfg = merge(cfg, load_file(config_path))
    if overrides:
        cfg = apply_overrides(cfg, overrides)
    return cfg


def to_json(cfg) -> str:
    return json.dumps(dataclasses.asdict(cfg), indent=2, default=str)


def snapshot(cfg, directory: str, name: str = "config.json") -> str:
    """Write the fully-resolved config next to the checkpoints (reference
    saves args into the ckpt dict, image/train.py:420)."""
    os.makedirs(directory, exist_ok=True)
    path = os.path.join(directory, name)
    with open(path, "w") as f:
        f.write(to_json(cfg))
    return path
