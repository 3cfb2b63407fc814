"""Python-file config system with ``_base_`` inheritance and dotted overrides.

The reference's public API surface is mmcv-style python-dict configs
(``Config.fromfile`` + ``_base_`` + ``--cfg-options`` deep merge —
reference tools/train.py:105-136, SURVEY §5). This is a dependency-free
equivalent: a config file is a python module whose top-level names form the
dict; ``_base_`` lists parent files merged depth-first; dotted CLI overrides
(``a.b.c=1``) deep-set leaves with literal-eval'd values.
"""

from __future__ import annotations

import ast
import copy
import os
import types
from typing import Any, Dict, List, Optional, Sequence


def _exec_config_file(path: str) -> Dict[str, Any]:
    with open(path) as f:
        src = f.read()
    module = types.ModuleType('_cfg')
    module.__file__ = path
    exec(compile(src, path, 'exec'), module.__dict__)
    return {k: v for k, v in module.__dict__.items()
            if not k.startswith('__') and not callable(v)
            and not isinstance(v, types.ModuleType)}


def _deep_merge(base: Dict, override: Dict) -> Dict:
    out = copy.deepcopy(base)
    for k, v in override.items():
        if isinstance(v, dict) and isinstance(out.get(k), dict):
            out[k] = _deep_merge(out[k], v)
        else:
            out[k] = copy.deepcopy(v)
    return out


def load_config(path: str) -> Dict[str, Any]:
    cfg = _exec_config_file(path)
    bases = cfg.pop('_base_', [])
    if isinstance(bases, str):
        bases = [bases]
    merged: Dict[str, Any] = {}
    for b in bases:
        bpath = os.path.normpath(os.path.join(os.path.dirname(path), b))
        merged = _deep_merge(merged, load_config(bpath))
    return _deep_merge(merged, cfg)


def _literal(value: str) -> Any:
    try:
        return ast.literal_eval(value)
    except (ValueError, SyntaxError):
        return value


def apply_overrides(cfg: Dict[str, Any],
                    options: Optional[Sequence[str]]) -> Dict[str, Any]:
    """Apply ``key.sub=value`` overrides (the --cfg-options contract)."""
    cfg = copy.deepcopy(cfg)
    for opt in options or []:
        key, _, value = opt.partition('=')
        node = cfg
        parts = key.split('.')
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = _literal(value)
    return cfg


def dump_config(cfg: Dict[str, Any]) -> str:
    """Pretty printable config (the print_config tool contract)."""
    import pprint
    return pprint.pformat(cfg, width=100, sort_dicts=False)
