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
            out[key] = _parse_value(vals[0])
        else:
            out[key] = [_parse_value(v) for v in vals]
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
