"""Unified config system: dataclass tree + YAML + dotted CLI overrides.

The reference uses four different config idioms (pyrallis dataclass+YAML for
video, HfArgumentParser for NLP, timm argparse for ViT, argparse+ast for DiT
— SURVEY.md section 5). This module unifies them: nested dataclasses loaded
from YAML with ``--a.b.c=value`` command-line overrides (the pyrallis
convention, ``diffusion/utils/config_wan.py`` style), and round-trip dumping
back to the work dir.
"""

from __future__ import annotations

import ast
import dataclasses
import json
from pathlib import Path
from typing import Any, Dict, List, Optional, Sequence, Type, TypeVar

T = TypeVar("T")


def _coerce(value: str) -> Any:
    """Parse a CLI string into a python literal when possible."""
    try:
        return ast.literal_eval(value)
    except (ValueError, SyntaxError):
        lowered = value.lower()
        if lowered in ("true", "false"):
            return lowered == "true"
        if lowered in ("null", "none"):
            return None
        return value


def _from_dict(cls: Type[T], data: Dict[str, Any]) -> T:
    """Recursively build a dataclass from a dict (unknown keys rejected)."""
    import typing

    try:  # resolve string annotations (PEP 563 "from __future__ import annotations")
        hints = typing.get_type_hints(cls)
    except Exception:
        hints = {}
    fields = {f.name: f for f in dataclasses.fields(cls)}
    kwargs = {}
    for k, v in data.items():
        if k not in fields:
            raise KeyError(f"unknown config key {k!r} for {cls.__name__}")
        ftype = hints.get(k, fields[k].type)
        target = ftype if isinstance(ftype, type) else None
        if (
            target is not None
            and dataclasses.is_dataclass(target)
            and isinstance(v, dict)
        ):
            kwargs[k] = _from_dict(target, v)
        else:
            kwargs[k] = v
    return cls(**kwargs)


def _to_dict(obj: Any) -> Any:
    if dataclasses.is_dataclass(obj):
        return {
            f.name: _to_dict(getattr(obj, f.name)) for f in dataclasses.fields(obj)
        }
    if isinstance(obj, (list, tuple)):
        return [_to_dict(x) for x in obj]
    if isinstance(obj, dict):
        return {k: _to_dict(v) for k, v in obj.items()}
    if obj is None or isinstance(obj, (bool, int, float, str)):
        return obj
    return str(obj)  # dtypes & other non-YAML-native objects


def _apply_override(obj: Any, dotted: str, value: Any) -> None:
    parts = dotted.split(".")
    target = obj
    for p in parts[:-1]:
        target = getattr(target, p)
    if not hasattr(target, parts[-1]):
        raise KeyError(f"unknown config path {dotted!r}")
    setattr(target, parts[-1], value)


def load_config(
    cls: Type[T],
    yaml_path: Optional[str] = None,
    overrides: Sequence[str] = (),
) -> T:
    """Build a config: defaults <- YAML <- ``--a.b=v`` CLI overrides."""
    data: Dict[str, Any] = {}
    if yaml_path:
        import yaml

        with open(yaml_path) as f:
            data = yaml.safe_load(f) or {}
    cfg = _from_dict(cls, data)
    for ov in overrides:
        if not ov.startswith("--"):
            raise ValueError(f"override must look like --a.b=v, got {ov!r}")
        key, _, raw = ov[2:].partition("=")
        _apply_override(cfg, key, _coerce(raw))
    return cfg


def parse_cli(cls: Type[T], argv: Sequence[str]) -> T:
    """argv = [maybe config.yaml] + ["--a.b=v", ...]."""
    yaml_path = None
    overrides: List[str] = []
    for a in argv:
        if a.startswith("--config_path="):
            yaml_path = a.split("=", 1)[1]
        elif a.startswith("--"):
            overrides.append(a)
        elif yaml_path is None and (a.endswith(".yaml") or a.endswith(".yml")):
            yaml_path = a
        else:
            raise ValueError(f"unrecognized argument {a!r}")
    return load_config(cls, yaml_path, overrides)


def dump_config(cfg: Any, path: str) -> None:
    """Dump the resolved config back to the work dir (reference behavior:
    ``train_wan.py:1018`` writes config.yaml)."""
    p = Path(path)
    p.parent.mkdir(parents=True, exist_ok=True)
    try:
        import yaml

        p.write_text(yaml.safe_dump(_to_dict(cfg), sort_keys=False))
    except ImportError:
        p.write_text(json.dumps(_to_dict(cfg), indent=2, default=str))
