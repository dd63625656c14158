"""YAML + CLI-override config system.

Rebuild of espnet2/utils/config_argparse.py + NestedDictAction semantics
(SURVEY.md §5.6): a YAML file is the base, ``--key value`` flags override
top-level keys, ``--key_conf sub=val`` (or ``--key_conf '{yaml}'``) patches
nested dicts.  The fully-resolved config is dumped to
``<output_dir>/config.yaml`` — the single artifact needed to rebuild the
model at inference (abs_task.py:1396-1400, build_model_from_file:2272).
"""

from __future__ import annotations

import argparse
import copy
from pathlib import Path
from typing import Any, Dict, List, Optional, Sequence, Union

import yaml


def filter_known_fields(cls, d: dict, where: str = "") -> dict:
    """Split a conf dict into known dataclass fields, warning on the rest.

    The reference fails hard on typo'd component-conf keys (ClassChoices
    passes **conf to constructors); a silent drop makes a mistyped
    ``encoder_conf`` key vanish — warn loudly instead (VERDICT weak #8).
    """
    import dataclasses
    import logging

    known = {f.name for f in dataclasses.fields(cls)}
    unknown = [k for k in d if k not in known]
    if unknown:
        logging.getLogger(__name__).warning(
            f"ignoring unknown {where or cls.__name__} key(s): {sorted(unknown)} "
            f"(known: {sorted(known)})"
        )
    return {k: v for k, v in d.items() if k in known}


def load_yaml(path: Union[str, Path]) -> Dict[str, Any]:
    with open(path, encoding="utf-8") as f:
        out = yaml.safe_load(f)
    if out is None:
        return {}
    if not isinstance(out, dict):
        raise ValueError(f"{path} must contain a mapping at top level")
    return out


def dump_yaml(config: Dict[str, Any], path: Union[str, Path]):
    Path(path).parent.mkdir(parents=True, exist_ok=True)

    class NoAliasDumper(yaml.SafeDumper):
        def ignore_aliases(self, data):
            return True  # yaml_no_alias_safe_dump.py behavior

    with open(path, "w", encoding="utf-8") as f:
        yaml.dump(config, f, Dumper=NoAliasDumper, allow_unicode=True, sort_keys=False)


def _parse_value(s: str) -> Any:
    """YAML-parse a CLI value string ('true'->True, '3'->3, '[1,2]'->list...)."""
    # a bare '-' (the stdout/stdin convention, e.g. --output -) YAML-parses
    # as a one-element block sequence [None]; keep it a string
    if s == "-":
        return s
    try:
        return yaml.safe_load(s)
    except yaml.YAMLError:
        return s


def parse_cli_overrides(args: Sequence[str]) -> Dict[str, Any]:
    """['--a', '1', '--b_conf', 'x=2', '--b_conf', 'y=3'] -> {'a':1,'b_conf':{'x':2,'y':3}}."""
    out: Dict[str, Any] = {}
    i = 0
    args = list(args)
    while i < len(args):
        a = args[i]
        if not a.startswith("--"):
            raise ValueError(f"expected --flag, got {a!r}")
        key = a[2:].replace("-", "_")
        if "=" in key:
            key, val = key.split("=", 1)
            vals = [val]
            i += 1
        else:
            vals = []
            i += 1
            while i < len(args) and not args[i].startswith("--"):
                vals.append(args[i])
                i += 1
        if key.endswith("_conf") and vals and all("=" in v for v in vals):
            sub = out.setdefault(key, {})
            if not isinstance(sub, dict):
                sub = {}
                out[key] = sub
            for v in vals:
                sk, sv = v.split("=", 1)
                sub[sk] = _parse_value(sv)
        elif not vals:
            out[key] = True
        elif len(vals) == 1:
            val = _parse_value(vals[0])
            if key in out and key.endswith("data_path_and_name_and_type"):
                # repeated triple flags append (abs_task.py action='append')
                prev = out[key] if isinstance(out[key], list) else [out[key]]
                out[key] = prev + [val]
            else:
                out[key] = val
        else:
            out[key] = [_parse_value(v) for v in vals]
    return out


def normalize_triples(value) -> List[tuple]:
    """data_path_and_name_and_type entries -> [(path, name, type), ...].

    Accepts YAML lists of 3-lists AND the reference's CLI form
    'path,name,type' (possibly a single string or a list of strings)."""
    if value is None:
        return []
    if isinstance(value, str):
        value = [value]
    out = []
    for item in value:
        if isinstance(item, str):
            parts = item.split(",")
            if len(parts) != 3:
                raise ValueError(f"expected 'path,name,type', got {item!r}")
            out.append(tuple(p.strip() for p in parts))
        else:
            t = tuple(item)
            if len(t) != 3:
                raise ValueError(f"expected a (path, name, type) triple, got {item!r}")
            out.append(t)
    return out


def merge_configs(base: Dict[str, Any], override: Dict[str, Any]) -> Dict[str, Any]:
    out = copy.deepcopy(base)
    for k, v in override.items():
        if k.endswith("_conf") and isinstance(v, dict) and isinstance(out.get(k), dict):
            out[k] = {**out[k], **v}
        else:
            out[k] = v
    return out


def build_config(
    cmd: Sequence[str], defaults: Optional[Dict[str, Any]] = None
) -> Dict[str, Any]:
    """--config <yaml> plus arbitrary --key overrides -> resolved config dict."""
    cmd = list(cmd)
    config: Dict[str, Any] = copy.deepcopy(defaults or {})
    # peel off --config flags first (may appear multiple times, later wins base)
    rest: List[str] = []
    i = 0
    while i < len(cmd):
        if cmd[i] == "--config":
            config = merge_configs(config, load_yaml(cmd[i + 1]))
            i += 2
        elif cmd[i].startswith("--config="):
            config = merge_configs(config, load_yaml(cmd[i].split("=", 1)[1]))
            i += 1
        else:
            rest.append(cmd[i])
            i += 1
    return merge_configs(config, parse_cli_overrides(rest))


def read_token_list(token_list: Union[str, Path, Sequence[str]]) -> List[str]:
    if isinstance(token_list, (str, Path)):
        with open(token_list, encoding="utf-8") as f:
            return [line.rstrip("\n") for line in f if line.rstrip("\n") != ""]
    return list(token_list)
